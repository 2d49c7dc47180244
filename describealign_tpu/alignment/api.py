"""align(): the top-level alignment algorithm.

Same contract as the reference's align (describealign.py:595-1027):

    align(video_features, audio_desc_features, video_energy, audio_energy)
      -> (audio_times_s, video_times_s, similarity_percent, path, median_slope)

Internally the pipeline is TPU-first:
  device (one jitted call): mean-sub/norms -> coarse offset DP -> fine banded
      correlation -> per-frame top-K match candidates
  host: exact weighted-LIS chain -> continuity filter -> compression ->
      L1 piecewise-linear fit (device ADMM or host LP) -> pass-2 cluster
      refinement -> similarity/nodes
"""
import os

import numpy as np
import jax.numpy as jnp

from . import continuity, fit, lis, matching, outputs, preprocess, refine

BUCKET_FRAMES = 210 * 64          # shape bucket quantum (64 s)
PAD_MARGIN = 210 + preprocess.WINDOW


def _bucket_pad(n):
    return -(-(n + PAD_MARGIN) // BUCKET_FRAMES) * BUCKET_FRAMES


def _stack_padded(features, nmin, npad):
    out = np.zeros((5, npad), np.float32)
    for j, f in enumerate(features):
        out[j, :nmin] = np.asarray(f[:nmin], np.float32)
    return jnp.asarray(out)


def _fail_if_short(path_len, num_video, num_audio):
    if path_len < max(min(num_video, num_audio) / 500., 5 * 210):
        raise RuntimeError("Alignment failed, are the input files mismatched?")


def align(video_features, audio_desc_features, video_energy, audio_desc_energy,
          fit_backend=None, video_frames=None, audio_frames=None):
    """video_frames/audio_frames: true 210fps frame counts when the feature
    arrays carry zero-padding (bucketed extraction); default = array length."""
    fit_backend = fit_backend or os.environ.get(
        'DESCRIBEALIGN_FIT_BACKEND', 'native')

    na = min(len(f) for f in audio_desc_features)
    nv = min(len(f) for f in video_features)
    if audio_frames is not None:
        na = min(na, int(audio_frames))
    if video_frames is not None:
        nv = min(nv, int(video_frames))
    na_pad = _bucket_pad(na)
    nv_pad = _bucket_pad(nv)

    print("  memorizing video...        \r", end='')
    feats_a = _stack_padded(audio_desc_features, na, na_pad)
    feats_v = _stack_padded(video_features, nv, nv_pad)
    ms_a, norms_a = preprocess.preprocess_features(feats_a)
    ms_v, norms_v = preprocess.preprocess_features(feats_v)

    print("  matching audio...  \r", end='')
    quals, vids, _ = matching.match_pair(
        ms_a, norms_a, feats_a[0], na,
        ms_v, norms_v, feats_v[0], nv)
    cand_a, cand_v, cand_q = lis.candidates_from_match_output(quals, vids)
    y, x = lis.weighted_lis(cand_a, cand_v, cand_q)  # y=video, x=audio
    _fail_if_short(len(x), nv, na)

    print("  refining match: pass 1 of 2...\r", end='')
    x, y = continuity.continuity_filter(
        np.asarray(x, np.float64), np.asarray(y, np.float64))

    # least-squares gain match of video features to the audio's scale
    # (reference 733-741); the (N,1) lstsq reduces to a ratio of dots
    audio_scaled_list, video_scaled_list = [], []
    yi = y.astype(np.int64)
    xi = x.astype(np.int64)
    for vf, af in zip(video_features, audio_desc_features):
        vf = np.asarray(vf[:nv], np.float64)
        af = np.asarray(af[:na], np.float64)
        af_std = np.std(af)
        vy = vf[yi]
        scale = np.dot(vy, af[xi]) / np.maximum(np.dot(vy, vy), 1e-30)
        audio_scaled_list.append(af / af_std)
        video_scaled_list.append(vf * (scale / af_std))
    audio_scaled = np.stack(audio_scaled_list[:3], axis=1)
    video_scaled = np.stack(video_scaled_list[:3], axis=1)

    cx, cy = continuity.compress_path(x, y)
    fit_result = fit.solve_l1_fit(cx, cy, backend=fit_backend)
    smooth_path = list(zip(cx, fit_result['smooth_y']))

    print("  refining match: pass 2 of 2...\r", end='')
    clusters = refine.build_line_clusters(smooth_path, fit_result['slopes'])
    pj, pc, pq, offsets = refine.build_points_flat(clusters, audio_scaled,
                                                   video_scaled)
    from .refine_native import refine_dp_flat
    path = refine_dp_flat(pj, pc, pq, offsets, len(clusters),
                          len(video_scaled))
    _fail_if_short(len(path), nv, na)

    audio_times, video_times, similarity_percent, path_s = \
        outputs.similarity_and_nodes(path, len(audio_scaled), len(video_scaled),
                                     na, nv)
    return (audio_times, video_times, similarity_percent, path_s,
            fit_result['median_slope'])
