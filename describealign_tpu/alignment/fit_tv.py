"""L1 piecewise-linear fit via cascaded exact fused-lassos (native solver).

The reference LP (fit.py) has a specific structure: per-interval slope
observations r_i = dy_i/dx_i decompose into a global median slope plus
slope deviations with a huge fused-lasso penalty (RATE_CHANGE_COST*|du|, so
rate changes are few), plus offset jumps (cost ~10, discounted where
continuity is already broken) and L1 node errors. Rather than a generic LP,
we solve the two 1-D fused-lassos the problem factors into:

  stage 1 (slopes): theta = argmin sum c_i|r_i - theta_i|
                                 + RATE_CHANGE_COST * sum|theta_{i+1}-theta_i|
    with data weight c_i = min(2, jc_i) * dx_i (the LP's marginal cost of
    absorbing a unit slope error through node errors or jumps).

  stage 2 (offsets): with theta snapped piecewise-constant,
    b_i = y_i - theta_seg(i)*x_i is piecewise constant with sparse jumps:
    beta = argmin sum|b_i - beta_i| + sum jc_i|beta_{i+1} - beta_i|
    (jump penalty dropped across slope-segment boundaries).

Each L1-data fused-lasso runs IRLS around an EXACT weighted-L2 TV prox -
the Johnson-style clipped-derivative DP in native/dp.cpp (a sequential
O(N)-ish algorithm; the fit operates on the compressed node path, a few
thousand points, and completes in well under a millisecond). This removes
the scipy/HiGHS dependency from the default path; backend='highs' remains
as the exact-LP cross-check.

Outputs mirror fit._solve_linprog: fit_err, per-interval slopes (exactly
constant within segments), median slope (dx-weighted median - the LP's
optimality condition for its free median variable), smooth_y.
"""
import ctypes

import numpy as np

from .fit import (RATE_CHANGE_COST, compute_jump_costs,
                  l1_refine_segment_slopes)
from .native import native_lib

IRLS_ITERS = 12
SLOPE_IRLS_DELTA = 2e-4     # slope units
OFFSET_IRLS_DELTA = 0.05    # frames
SLOPE_SNAP_TOL = 1e-6


def tv_weighted_l2(r, w, kappa):
    """Exact min .5*sum w_i(t-r_i)^2 + sum kappa_k|Dt| (native DP)."""
    lib = native_lib()
    r = np.ascontiguousarray(r, np.float64)
    w = np.ascontiguousarray(w, np.float64)
    kappa = np.ascontiguousarray(kappa, np.float64)
    out = np.empty_like(r)
    rc = lib.tv1d_weighted(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        kappa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_longlong(len(r)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError("tv1d_weighted failed")
    return out


def tv_weighted_l2_py(r, w, kappa):
    """Pure-python fallback (same DP; used when no compiler is available)."""
    n = len(r)
    if n == 1:
        return np.array([r[0]], float)
    xs = [float(r[0])]
    vs = [0.0]
    sl = sr = float(w[0])
    clip_lo = np.empty(n - 1)
    clip_hi = np.empty(n - 1)
    for k in range(n - 1):
        kap = float(kappa[k])
        m = len(xs)
        if vs[0] >= -kap:
            x_lo = xs[0] - (vs[0] + kap) / sl if sl > 0 else xs[0]
            first = 0
        else:
            j = 0
            while j + 1 < m and vs[j + 1] < -kap:
                j += 1
            if j + 1 < m:
                slope = (vs[j + 1] - vs[j]) / (xs[j + 1] - xs[j])
                x_lo = xs[j] + (-kap - vs[j]) / slope if slope > 0 else xs[j + 1]
                first = j + 1
            else:
                x_lo = xs[m - 1] + (-kap - vs[m - 1]) / sr if sr > 0 else xs[m - 1]
                first = m
        if vs[m - 1] <= kap:
            x_hi = xs[m - 1] + (kap - vs[m - 1]) / sr if sr > 0 else xs[m - 1]
            last = m
        else:
            j = m - 1
            while j - 1 >= 0 and vs[j - 1] > kap:
                j -= 1
            if j - 1 >= 0:
                slope = (vs[j] - vs[j - 1]) / (xs[j] - xs[j - 1])
                x_hi = xs[j - 1] + (kap - vs[j - 1]) / slope if slope > 0 else xs[j - 1]
                last = j
            else:
                x_hi = xs[0] - (vs[0] - kap) / sl if sl > 0 else xs[0]
                last = 0
        x_hi = max(x_hi, x_lo)
        clip_lo[k] = x_lo
        clip_hi[k] = x_hi
        wn, rn = float(w[k + 1]), float(r[k + 1])
        nxs = [x_lo]
        nvs = [-kap + wn * (x_lo - rn)]
        for j in range(first, last):
            if x_lo < xs[j] < x_hi:
                nxs.append(xs[j])
                nvs.append(vs[j] + wn * (xs[j] - rn))
        if x_hi > x_lo:
            nxs.append(x_hi)
            nvs.append(kap + wn * (x_hi - rn))
        xs, vs = nxs, nvs
        sl = sr = wn
    m = len(xs)
    if vs[0] >= 0:
        th = xs[0] - vs[0] / sl if sl > 0 else xs[0]
    elif vs[m - 1] <= 0:
        th = xs[m - 1] - vs[m - 1] / sr if sr > 0 else xs[m - 1]
    else:
        j = 0
        while j + 1 < m and vs[j + 1] < 0:
            j += 1
        slope = (vs[j + 1] - vs[j]) / (xs[j + 1] - xs[j])
        th = xs[j] - vs[j] / slope if slope > 0 else xs[j + 1]
    theta = np.empty(n)
    theta[n - 1] = th
    for k in range(n - 2, -1, -1):
        th = min(max(th, clip_lo[k]), clip_hi[k])
        theta[k] = th
    return theta


def _tv(r, w, kappa):
    if native_lib() is not None:
        return tv_weighted_l2(r, w, kappa)
    return tv_weighted_l2_py(r, w, kappa)


def fused_lasso_l1(b, data_cost, kappa, delta):
    """argmin sum data_cost_i|b_i - t_i| + sum kappa_k|Dt| via IRLS around
    the exact weighted-L2 TV prox (delta-smoothed L1)."""
    b = np.asarray(b, np.float64)
    theta = _tv(b, np.asarray(data_cost, float) / delta, kappa)
    for _ in range(IRLS_ITERS):
        w = data_cost / np.maximum(np.abs(b - theta), delta)
        prev = theta
        theta = _tv(b, w, kappa)
        # exact fixed point: w (hence every later iterate) would repeat
        # bit-for-bit, so stopping here returns the identical vector the
        # full IRLS_ITERS loop would
        if np.array_equal(theta, prev):
            break
    return theta


def solve_l1_fit_tv(x, y):
    """Drop-in replacement for fit._solve_linprog (same return dict)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = len(x)
    xd = np.diff(x)
    dy = np.diff(y)
    r = dy / xd
    jc = compute_jump_costs(x, y)

    # ---- stage 1: piecewise-constant slopes -------------------------------
    slope_cost = np.minimum(2.0, jc) * xd
    kappa1 = np.full(max(n - 2, 1), float(RATE_CHANGE_COST))
    theta = fused_lasso_l1(r, slope_cost, kappa1, SLOPE_IRLS_DELTA)

    # snap to exact runs (LP vertex solutions are exactly sparse in du)
    breaks = np.flatnonzero(np.abs(np.diff(theta)) > SLOPE_SNAP_TOL) + 1
    seg_id = np.zeros(n - 1, int)
    seg_id[breaks] = 1
    seg_id = np.cumsum(seg_id)
    slopes = theta.copy()
    for k in range(seg_id.max() + 1):
        sel = seg_id == k
        slopes[sel] = np.average(theta[sel], weights=xd[sel])
    # de-bias long segments: the lasso's per-interval cost underprices
    # slope error vs the LP's accumulated node error (see fit.py helper)
    slopes = l1_refine_segment_slopes(x, y, seg_id, slopes)

    # ---- stage 2: piecewise-constant offsets with sparse jumps ------------
    node_slope = np.concatenate([slopes, slopes[-1:]])
    b = y - node_slope * x
    kappa2 = jc.copy()
    kappa2[np.flatnonzero(np.diff(slopes) != 0)] = 0.0  # free across segments
    beta = fused_lasso_l1(b, np.ones(n), kappa2, OFFSET_IRLS_DELTA)

    smooth_y = node_slope * x + beta
    fit_err = y - smooth_y

    # median slope: dx-weighted median (LP optimality for the free median)
    order = np.argsort(slopes)
    csum = np.cumsum(xd[order])
    median_slope = float(slopes[order][np.searchsorted(csum, csum[-1] / 2.0)])

    return dict(fit_err=fit_err, slopes=slopes, median_slope=median_slope,
                smooth_y=smooth_y)
