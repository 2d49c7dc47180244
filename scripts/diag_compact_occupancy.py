#!/usr/bin/env python
"""Per-pair live-slot occupancy of the batch bench vs the compact-transport
budgets (COMPACT_BUDGET1/2). A pair whose occupancy exceeds a budget takes
the dense-fallback path (correct, but pays compact dispatch + a full dense
pull), so the budgets should cover the bench population with headroom.
Runs fine on the CPU backend (the fine pass twin is path-equivalent).

Usage: [JAX_PLATFORMS=cpu] python scripts/diag_compact_occupancy.py
"""
import os
import sys

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # sitecustomize pre-imports jax with JAX_PLATFORMS=axon; override
        jax.config.update('jax_platforms', 'cpu')

    from bench import build_batch_pairs
    from describealign_tpu.alignment import api, matching

    pairs, lens, planted, kinds = build_batch_pairs()
    k1 = matching.TOP_K
    print(f"budgets: band1 {matching.COMPACT_BUDGET1} rescue "
          f"{matching.COMPACT_BUDGET2} of dense slots", flush=True)
    worst1 = worst2 = 0.0
    for i, ((v, a), (sv, sa), kind) in enumerate(zip(pairs, lens, kinds)):
        npad = max(api._bucket_pad(sv // 210), api._bucket_pad(sa // 210))
        fv, nv = api.host_features_padded(v, sv, npad)
        fa, na = api.host_features_padded(a, sa, npad)
        fav = np.empty((2, 5, npad), np.float16)
        fav[0] = fa
        fav[1] = fv
        dev_av = jax.device_put(fav)
        chunks, starts_dev, _ = matching.match_stream_pair(dev_av, na, nv)
        packed = np.ascontiguousarray(
            np.concatenate([np.asarray(c) for c in chunks], axis=0))
        nb = packed.shape[0]
        k2 = (starts_dev.shape[0] - 1) * (k1 // 2)
        row1 = matching._packed_row_words_py(k1)
        row2 = matching._packed_row_words_py(k2)
        by = packed.view(np.uint8).reshape(nb, -1)
        band1 = by[:, :210 * row1 * 2].reshape(nb * 210, row1 * 2)
        rescue = by[:, 210 * row1 * 2:210 * row1 * 2 + 105 * row2 * 2]
        rescue = rescue.reshape(nb * 105, row2 * 2)
        live1 = int(np.count_nonzero(band1[:, :k1]))
        live2 = int(np.count_nonzero(rescue[:, :k2]))
        occ1 = live1 / (nb * 210 * k1)
        occ2 = live2 / (nb * 105 * k2)
        b1, b2 = matching._compact_budgets(nb)
        over = (live1 > b1) or (live2 > b2)
        worst1 = max(worst1, occ1)
        worst2 = max(worst2, occ2)
        print(f"pair {i} ({kind:7s}): band1 occ {occ1:6.1%}  rescue occ "
              f"{occ2:6.1%}  live ({live1}, {live2}) vs budgets "
              f"({b1}, {b2}){'  << OVERFLOW' if over else ''}", flush=True)
    print(f"worst: band1 {worst1:.1%}  rescue {worst2:.1%}")


if __name__ == "__main__":
    main()
