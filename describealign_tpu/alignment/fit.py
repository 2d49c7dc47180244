"""L1-minimization piecewise-linear alignment fit.

The model (reference describealign.py:769-858): between consecutive match
nodes (x_i, y_i), the observed slope r_i = dy_i/dx_i decomposes as

    r_i = m + (de_i + j_i + ds_i + u_i*dx_i) / dx_i

where m is the global median slope, e_i are per-node fit errors (L1 cost 1),
j_i are instantaneous jumps (L1 cost ~10, discounted where the path is
discontinuous anyway), s_i is a +/-2-bounded "shot noise" state (L1 cost
.01, its increments cost 3), and u_i is the per-segment slope deviation
(L1 cost .001*dx_i, with a very strong fused-lasso penalty 40000 on
|u_{i+1} - u_i| that makes rate changes sparse).

Two backends:
- 'native' (default): exact cascaded fused-lasso solve through the native
  clipped-derivative DP (fit_tv.py + native/dp.cpp) - no scipy/HiGHS
  dependency on the hot path.
- 'highs': the reference's exact LP via scipy.optimize.linprog (dual
  simplex with interior-point fallback) - the cross-check oracle.

Outputs: fit_err (N), slopes (N-1), median_slope, smooth_path y - fit_err.
"""
import numpy as np

from .continuity import get_continuity_err

JUMP_COST_BASE = 10.0
RATE_CHANGE_JUMP_COST = 0.001
RATE_CHANGE_COST = JUMP_COST_BASE * 4000
SHOT_NOISE_COST = 0.01
SHOT_NOISE_JUMP_COST = 3.0
SHOT_NOISE_BOUND = 2.0


def compute_jump_costs(x, y):
    """Jump costs discounted where local continuity is already broken
    (reference 776-779)."""
    n = len(x)
    jump_costs = np.full(n - 1, JUMP_COST_BASE)
    if n <= 2 * 29 + 1:     # too short for the continuity window (can't
        return jump_costs   # happen via align(): its path floor is 5*210
                            # frames -> >= 15 compressed nodes, but the fit
                            # is a public API)
    cerr = get_continuity_err(x, y, deriv=True)
    return jump_costs / np.maximum(1, np.sqrt(cerr / 3.0))


JUMP_DETECT_FRAMES = 10.0   # interval position residual that marks a jump


def l1_refine_segment_slopes(x, y, seg_id, slopes, iters=25):
    """Re-estimate each fused slope-segment by POSITION-anchored L1 fit
    (dispatches to the native twin; see _l1_refine_segment_slopes_py for
    the algorithm and dp.cpp::refine_segment_slopes for the numerics
    note - medians are numpy-exact, weighted sums sequential-f64)."""
    from .native import native_lib
    lib = native_lib()
    if lib is not None and hasattr(lib, 'refine_segment_slopes'):
        import ctypes
        x = np.ascontiguousarray(x, np.float64)
        y = np.ascontiguousarray(y, np.float64)
        seg = np.ascontiguousarray(seg_id, np.int64)
        out = np.ascontiguousarray(slopes, np.float64).copy()
        rc = lib.refine_segment_slopes(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_longlong(len(x)),
            seg.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_longlong(iters), ctypes.c_double(JUMP_DETECT_FRAMES))
        if rc == 0:
            return out
    return _l1_refine_segment_slopes_py(x, y, seg_id, slopes, iters)


def _l1_refine_segment_slopes_py(x, y, seg_id, slopes, iters=25):
    """Re-estimate each fused slope-segment by POSITION-anchored L1 fit.

    The fused-lasso stage models slope error with a per-interval linear
    cost (min(2,jc)*dx), which loses the LP's span leverage: in the LP a
    slope bias accumulates NODE error over the whole segment, so its
    optimum pins the slope with ~1/span precision while the 1-D lasso's
    TV shrinkage biases plateaus by O(noise). Fix: within each slope
    segment, split the nodes into runs at jump-like intervals (single
    intervals whose position residual exceeds JUMP_DETECT_FRAMES - offset
    jumps live inside slope segments by construction), then IRLS-fit a
    COMMON slope with free per-run L1 intercepts. Matches HiGHS slopes to
    ~1e-4 on long segments (tests/test_fit_stress.py).

    seg_id: per-interval segment index (n-1,); slopes: per-interval
    initial values (a refined copy is returned).
    """
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    out = np.asarray(slopes, float).copy()
    xd = np.diff(x)
    r_obs = np.diff(y) / xd
    for k in range(int(seg_id.max()) + 1):
        iv = np.flatnonzero(seg_id == k)
        n_nodes = len(iv) + 1
        if n_nodes < 8:
            continue
        s = out[iv[0]]
        # split nodes into runs at jump-like intervals
        jumpish = np.abs(r_obs[iv] - s) * xd[iv] > JUMP_DETECT_FRAMES
        run_id = np.concatenate([[0], np.cumsum(jumpish.astype(int))])
        nodes = np.arange(iv[0], iv[-1] + 2)
        xs, ys = x[nodes], y[nodes]
        runs = [np.flatnonzero(run_id == rr) for rr in range(run_id[-1] + 1)]
        runs = [rr for rr in runs if len(rr) >= 2]
        if not runs or max(len(rr) for rr in runs) < 4:
            continue
        a = np.array([np.median(ys[rr] - s * xs[rr]) for rr in runs])
        s_prev = s
        for _ in range(iters):
            num = den = 0.0
            for j, rr in enumerate(runs):
                res = ys[rr] - a[j] - s * xs[rr]
                w = 1.0 / np.maximum(np.abs(res), 1e-3)
                sw = np.sum(w)
                xw = np.sum(w * xs[rr]) / sw
                yw = np.sum(w * ys[rr]) / sw
                # within-run centering absorbs the intercepts
                num += np.sum(w * (xs[rr] - xw) * (ys[rr] - yw))
                den += np.sum(w * (xs[rr] - xw) ** 2)
            if den <= 0:
                break
            s = num / den
            for j, rr in enumerate(runs):
                a[j] = np.median(ys[rr] - s * xs[rr])
            if abs(s - s_prev) < 1e-8:      # converged (typ. 5-8 iters)
                break
            s_prev = s
        out[iv] = s
    return out


def solve_l1_fit(x, y, backend='highs'):
    """Fit the piecewise-linear model; see module docstring.

    x, y: compressed, deduped match nodes (float64, len >= 3).
    Returns dict(fit_err, slopes, median_slope, smooth_y).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if backend == 'highs':
        return _solve_linprog(x, y)
    elif backend in ('native', 'tv'):
        from .fit_tv import solve_l1_fit_tv
        return solve_l1_fit_tv(x, y)
    elif backend == 'device':
        # ADMM is iterative: guard the result and fall back to the exact
        # host cascade on non-convergence (mirrors the reference LP's
        # dual-simplex -> interior-point fallback, describealign.py:841-844)
        from .fit_device import solve_l1_fit_device
        result = solve_l1_fit_device(x, y)
        ok = (np.isfinite(result['smooth_y']).all()
              and np.isfinite(result['slopes']).all()
              and np.median(np.abs(result['fit_err'])) < 50.0)
        if ok:
            return result
        print("  WARNING: device fit did not converge, using native...")
        from .fit_tv import solve_l1_fit_tv
        return solve_l1_fit_tv(x, y)
    raise ValueError(f"unknown fit backend: {backend}")


def _solve_linprog(x, y):
    import scipy.optimize
    import scipy.sparse as sp

    n = len(x)
    xd = np.diff(x)
    yd = np.diff(y)
    jump_costs = compute_jump_costs(x, y)

    c = np.hstack([
        np.ones(2 * n),                        # fit errors +/-
        jump_costs, jump_costs,                # jumps +/-
        np.full(2 * n, SHOT_NOISE_COST),       # shot noise +/-
        np.full(2 * (n - 1), SHOT_NOISE_JUMP_COST),
        np.full(2 * (n - 1), RATE_CHANGE_JUMP_COST),  # slope jumps +/-
        np.full(2 * (n - 2), RATE_CHANGE_COST),       # rate changes +/-
        [0.0],                                 # median slope (free)
    ])

    fit_err_coeffs = sp.diags([-1. / xd, 1. / xd], offsets=[0, 1],
                              shape=(n - 1, n)).tocsc()
    jump_coeffs = sp.diags([1. / xd], offsets=[0],
                           shape=(n - 1, n - 1)).tocsc()
    zeros = lambda r, cols: sp.csc_matrix((r, cols))

    a_eq1 = sp.hstack([fit_err_coeffs, -fit_err_coeffs,
                       jump_coeffs, -jump_coeffs,
                       zeros(n - 1, 2 * n),
                       jump_coeffs, -jump_coeffs,
                       jump_coeffs, -jump_coeffs,
                       zeros(n - 1, 2 * n - 4),
                       np.ones((n - 1, 1))])
    a_eq2 = sp.hstack([zeros(n - 1, 4 * n - 2),
                       sp.diags([-1., 1.], offsets=[0, 1], shape=(n - 1, n)).tocsc(),
                       sp.diags([1., -1.], offsets=[0, 1], shape=(n - 1, n)).tocsc(),
                       -sp.eye(n - 1), sp.eye(n - 1),
                       zeros(n - 1, 4 * n - 6), zeros(n - 1, 1)])
    slope_change = sp.diags([-1. / xd[:-1], 1. / xd[1:]], offsets=[0, 1],
                            shape=(n - 2, n - 1)).tocsc()
    a_eq3 = sp.hstack([zeros(n - 2, 8 * n - 4),
                       slope_change, -slope_change,
                       -sp.eye(n - 2), sp.eye(n - 2),
                       zeros(n - 2, 1)])
    a_eq = sp.vstack([a_eq1, a_eq2, a_eq3])
    b_eq = np.hstack([yd / xd, np.zeros(2 * n - 3)])
    bounds = ([[0, None]] * (4 * n - 2)
              + [[0, SHOT_NOISE_BOUND]] * (2 * n)
              + [[0, None]] * (6 * n - 8)
              + [[None, None]])

    fit = scipy.optimize.linprog(c, A_eq=a_eq, b_eq=b_eq, bounds=bounds,
                                 method='highs-ds')
    if not fit.success and fit.status == 4:
        # dual simplex hit numerical trouble; retry with interior point
        fit = scipy.optimize.linprog(c, A_eq=a_eq, b_eq=b_eq, bounds=bounds,
                                     method='highs-ipm')
    if not fit.success:
        print(fit)
        raise RuntimeError("Smooth Alignment L1-Min Optimization Failed!")

    fit_err = fit.x[:n] - fit.x[n:2 * n]
    slope_jumps = fit.x[8 * n - 4:9 * n - 5] - fit.x[9 * n - 5:10 * n - 6]
    median_slope = fit.x[-1]
    slopes = median_slope + slope_jumps / xd
    return dict(fit_err=fit_err, slopes=slopes, median_slope=median_slope,
                smooth_y=y - fit_err)
