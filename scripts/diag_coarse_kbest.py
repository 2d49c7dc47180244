#!/usr/bin/env python
"""Experiment: at which k does the TRUE track appear in the k-best coarse
DP (suppress-and-rerun, SUPPRESS_LANES=25) on the narrowband wrong-map
draws (seed 20260824, draws 02/05: confidently-wrong maps; 03/09: our
raises)? Decides whether raising N_TRACKS can rescue the regime or the
truth signal is absent from the coarse score map entirely.

Usage: python scripts/diag_coarse_kbest.py [seed=...] [profile=...] 2 5
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.parity_campaign import (draw_scenario, load_reference,
                                     truth_map, _content_seed_base)
from scripts.diag_coarse_feats import (preprocess, descriptors, score_map,
                                       coarse_dp, BLOCK, COARSE_STRIDE,
                                       WINDOW)

SUPPRESS_LANES = 25
N_TRACKS_SWEEP = 5


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
              f"rate={meta['rate']:.4f}", flush=True)
        p_map = score_map(ms_a, norms_a, mask_a, ms_v, norms_v, mask_v, 3)
        nb, kv = p_map.shape
        lanes = np.arange(kv)
        a_times = np.arange(nb) + 0.5
        want_v = tm(a_times) * 210.0
        sel = np.isfinite(want_v)
        suppressed = p_map.copy()
        for k in range(N_TRACKS_SWEEP):
            path = coarse_dp(suppressed)
            centers = path * COARSE_STRIDE - np.arange(nb) * BLOCK
            err = (np.arange(nb) * BLOCK + centers)[sel] - want_v[sel]
            near = float(np.mean(np.abs(err) < 280))
            print(f"  track {k + 1}: within fine band for {near:6.1%} "
                  f"of blocks; median err {np.median(err):8.1f} frames",
                  flush=True)
            suppressed[np.abs(lanes[None, :] - path[:, None])
                       <= SUPPRESS_LANES] = -1e30


if __name__ == "__main__":
    main()
