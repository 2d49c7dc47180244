#!/usr/bin/env python
"""Experiment: would 5-feature coarse descriptors fix the narrowband
wrong-map draws (seed 20260824 draws 02/05) without hurting the clean ones?

The coarse stage scores candidate bands with descriptors built from
features [:3] (energy, ZCR, band0 - matching.py::_coarse_tracks). The
reference's candidate gate consults ALL 5 feature hash dicts (2-of-first-3
AND 1-of-last-2, describealign.py:650-652), so content that distorts the
first three features (phone-band audio) still yields candidates from the
upper bands. This numpy twin recomputes the coarse block-score map and DP
with feature subsets [:3] and [:5] and scores the winning track against
ground truth for the requested draws.

Usage: python scripts/diag_coarse_feats.py [seed=20260824]
         [profile=narrowband] 2 5
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.parity_campaign import (draw_scenario, load_reference,
                                     truth_map, _content_seed_base)

BLOCK = 210
COARSE_STRIDE = 21
COARSE_PER_BLOCK = BLOCK // COARSE_STRIDE      # 10
WINDOW = 41
SUB_LANE_SHIFTS = (0, 3, 6, 9, 12, 15, 18)
DP_SLOPE_COST = 0.5
DP_JUMP_COST = 1.0


def preprocess(feats):
    from scipy.signal.windows import hann
    w = hann(2 * 21 + 1)[1:-1]
    w = w / w.sum()
    ms = np.stack([f - np.convolve(w, f, mode='same')[:len(f)]
                   for f in feats])
    norms = np.stack([
        np.clip(np.pad(np.convolve(np.ones(41), f ** 2, mode='valid'),
                       (0, 40), constant_values=1e-6) ** .5, .001, None)
        for f in ms])
    return ms.astype(np.float32), norms.astype(np.float32)


def descriptors(ms, norms, mask, n_feats, phase=0):
    n = ms.shape[1]
    k = (n - WINDOW - max(SUB_LANE_SHIFTS)) // COARSE_STRIDE + 1
    starts = np.arange(k) * COARSE_STRIDE + phase
    idx = starts[:, None] + np.arange(WINDOW)[None, :]
    win = ms[:n_feats, idx]
    nrm = norms[:n_feats, starts]
    desc = win / nrm[:, :, None]
    desc = desc * mask[starts][None, :, None]
    return np.moveaxis(desc, 0, 1).reshape(k, n_feats * WINDOW)


def score_map(ms_a, norms_a, mask_a, ms_v, norms_v, mask_v, n_feats):
    desc_a = descriptors(ms_a, norms_a, mask_a, n_feats)
    ka = desc_a.shape[0]
    nb = ka // COARSE_PER_BLOCK
    out = None
    for phase in SUB_LANE_SHIFTS:
        desc_v = descriptors(ms_v, norms_v, mask_v, n_feats, phase)
        kv = desc_v.shape[0]
        s = desc_a[:nb * COARSE_PER_BLOCK] @ desc_v.T
        s = s.reshape(nb, COARSE_PER_BLOCK, kv)
        s = np.pad(s, ((0, 0), (0, 0), (0, COARSE_PER_BLOCK)))
        aligned = np.max(np.stack(
            [s[:, p, p:p + kv] for p in range(COARSE_PER_BLOCK)], axis=1),
            axis=1)
        out = aligned if out is None else np.maximum(out, aligned)
    return out


def coarse_dp(p_map):
    nb, d = p_map.shape
    lanes = np.arange(d, dtype=np.float32)
    cost = np.empty_like(p_map)
    prev = np.zeros(d, np.float32)
    for b in range(nb):
        prev10 = np.concatenate([np.full(COARSE_PER_BLOCK, -1e30,
                                         np.float32),
                                 prev[:-COARSE_PER_BLOCK]])
        fwd = np.maximum.accumulate(prev10 + DP_SLOPE_COST * lanes) \
            - DP_SLOPE_COST * lanes
        bwd = np.maximum.accumulate((prev10 - DP_SLOPE_COST * lanes)[::-1]
                                    )[::-1] + DP_SLOPE_COST * lanes
        relax = np.maximum(np.maximum(fwd, bwd), prev.max() - DP_JUMP_COST)
        cost[b] = relax + p_map[b]
        prev = cost[b]
    # backtrace
    path = np.empty(nb, np.int32)
    path[-1] = int(np.argmax(cost[-1]))
    for b in range(nb - 2, -1, -1):
        o_next = path[b + 1]
        moved = cost[b] - DP_SLOPE_COST * np.abs(
            lanes - (o_next - COARSE_PER_BLOCK))
        jumped = cost[b].max() - DP_JUMP_COST
        path[b] = (int(np.argmax(moved)) if moved.max() >= jumped
                   else int(np.argmax(cost[b])))
    return path


def main():
    rest = sys.argv[1:]
    camp_seed, profile = 20260824, "narrowband"
    if rest and rest[0].startswith('seed='):
        camp_seed = int(rest[0][5:]); rest = rest[1:]
    if rest and rest[0].startswith('profile='):
        profile = rest[0][8:]; rest = rest[1:]
    want = sorted({int(v) for v in rest}) or [2, 5]

    ref = load_reference()
    rng = np.random.default_rng(camp_seed)
    base = _content_seed_base(camp_seed)
    for i in range(max(want) + 1):
        video, audio, meta = draw_scenario(rng, base + i, profile)
        if i not in want:
            continue
        vf = [np.asarray(f, np.float32) for f in
              (ref.get_energy(video), ref.get_zero_crossings(video))] \
            + [np.asarray(f, np.float32) for f in ref.get_freq_bands(video)]
        af = [np.asarray(f, np.float32) for f in
              (ref.get_energy(audio), ref.get_zero_crossings(audio))] \
            + [np.asarray(f, np.float32) for f in ref.get_freq_bands(audio)]
        nmin_a = min(len(f) for f in af)
        nmin_v = min(len(f) for f in vf)
        fa = np.stack([f[:nmin_a] for f in af])
        fv = np.stack([f[:nmin_v] for f in vf])
        ms_a, norms_a = preprocess(fa)
        ms_v, norms_v = preprocess(fv)
        mask_a = (fa[0] > .5)
        mask_a[max(0, nmin_a - WINDOW):] = False
        base_v = (fv[0] > .5)
        base_v[max(0, nmin_v - WINDOW):] = False
        rank = np.cumsum(base_v) - 1
        mask_v = base_v & (rank % 4 == 0)

        tm = truth_map(meta)
        print(f"--- draw {i:02d} {meta['bed']} lead={meta['lead']:.1f} "
              f"rate={meta['rate']:.4f}")
        for n_feats in (3, 5):
            p_map = score_map(ms_a, norms_a, mask_a, ms_v, norms_v,
                              mask_v, n_feats)
            path = coarse_dp(p_map)
            nb = p_map.shape[0]
            centers = path * COARSE_STRIDE - np.arange(nb) * BLOCK
            a_times = np.arange(nb) + 0.5
            want_v = tm(a_times) * 210.0
            sel = np.isfinite(want_v)
            err = (np.arange(nb) * BLOCK + centers)[sel] - want_v[sel]
            near = float(np.mean(np.abs(err) < 280))
            print(f"  feats[:{n_feats}]: track within fine band for "
                  f"{near:6.1%} of blocks; median err "
                  f"{np.median(err):8.1f} frames")


if __name__ == "__main__":
    main()
