#!/usr/bin/env python
"""Dev A/B: coarse DP scan-unroll sweep on the real device.

Times matching._coarse_dp (the materialized bench-path DP) and the
streamed formulation at several unroll factors on the Ask-Dad-scale
bench pair. The unroll transform is exact, so only timing differs.

    python scripts/ab_dp_unroll.py [factors...]    # default 1 4 8 16
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.profile_e2e import load_pair  # noqa: E402


def timed(fn, *args, n=5):
    ts = []
    for i in range(n + 1):
        t = time.time()
        out = fn(*args)
        np.asarray(jax_tree_first(out))
        dt = time.time() - t
        if i:
            ts.append(dt)
    return min(ts), ts


def jax_tree_first(o):
    while isinstance(o, (tuple, list)):
        o = o[0]
    return np.asarray(o).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp
    from describealign_tpu.alignment import matching
    from describealign_tpu.alignment.preprocess import (
        preprocess_features, valid_audio_mask, valid_video_mask)

    factors = [int(v) for v in sys.argv[1:]] or [1, 4, 8, 16]

    video, audio, sv, sa = load_pair()
    na, nv = sa // 210, sv // 210
    dev_a = jax.device_put(audio)
    dev_v = jax.device_put(video)

    @jax.jit
    def prep(pcm_a, pcm_v, la, lv):
        from describealign_tpu.ops import features as F

        def feats_of(pcm_i16):
            pcm = pcm_i16.astype(jnp.float16).astype(jnp.float32)
            fs = (F.energy_feature(pcm), F.zero_crossing_feature(pcm)) \
                + tuple(F.freq_band_features(pcm))
            n = pcm.shape[1] // 210
            return jnp.stack([f[:n] for f in fs], axis=0)
        fa, fv = feats_of(pcm_a), feats_of(pcm_v)
        ia = jnp.arange(fa.shape[1])[None, :]
        iv = jnp.arange(fv.shape[1])[None, :]
        fa = jnp.where(ia < la, fa, 0.)
        fv = jnp.where(iv < lv, fv, 0.)
        ms_a, norms_a = preprocess_features(fa)
        ms_v, norms_v = preprocess_features(fv)
        am = valid_audio_mask(fa[0], la)
        vm = valid_video_mask(fv[0], lv)
        da = matching._coarse_descriptors(ms_a[:3], norms_a[:3], am)
        dv = matching._coarse_descriptors(ms_v[:3], norms_v[:3], vm)
        return matching._block_scores_local(da, dv)

    p_map = prep(dev_a, dev_v, na, nv)
    np.asarray(p_map.ravel()[:1])
    print(f"p_map {p_map.shape}", flush=True)

    for v in factors:
        matching.DP_SCAN_UNROLL = v
        dp = jax.jit(matching._coarse_dp)
        t_compile = time.time()
        np.asarray(dp(p_map)).ravel()[:1]
        t_compile = time.time() - t_compile
        best, ts = timed(dp, p_map)
        print(f"unroll={v:3d}: coarse_dp min {best*1000:7.2f} ms  "
              f"(compile {t_compile:.1f}s, all={[round(t*1000,1) for t in ts]})",
              flush=True)


if __name__ == "__main__":
    main()
