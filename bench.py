#!/usr/bin/env python
"""Driver benchmark: align a synthetic Ask-Dad-scale pair on one chip.

Mirrors the reference's headline benchmark (README.md:71: full 22-min video
+ 27-min description aligned in ~30 s on a desktop CPU; the real test media
is not in this checkout, so an equivalent-scale synthetic pair with a
planted 202 s start offset and 8 narration insertions stands in).

Measured: warm end-to-end align time - PCM in RAM -> features -> matching ->
LIS -> fit -> pass 2 -> nodes (decode excluded on both sides, per
BASELINE.md "decode aside"). Also reports batch-mode throughput over 8
pairs in audio-minutes/sec/chip.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


BENCH_PAIR_CACHE = "/tmp/describealign_bench_pair_v1.npz"


def build_scale_pair():
    """The Ask-Dad-scale synthetic pair, cached on disk (generation is
    transcendental-heavy, ~1 min on a loaded host; the pair is a pure
    function of these constants so the cache never goes stale)."""
    if os.path.exists(BENCH_PAIR_CACHE):
        try:
            z = np.load(BENCH_PAIR_CACHE)
            return z["video"], z["audio"], None
        except Exception:
            pass
    from describealign_tpu.utils.synthmedia import build_pair
    narr = tuple((120.0 + 150.0 * k, 12.0) for k in range(8))
    video, audio, segments = build_pair(content_seconds=1320.0,
                                        narration=narr, lead_in=202.0,
                                        seed=42)
    try:
        np.savez(BENCH_PAIR_CACHE, video=video, audio=audio)
    except Exception:
        pass
    return video, audio, segments


def run_once(video_i16, audio_i16, sv, sa):
    from describealign_tpu.alignment.api import align_from_pcm
    return align_from_pcm(video_i16, audio_i16,
                          video_samples=sv, audio_samples=sa)


def main():
    import io
    from contextlib import redirect_stdout
    import jax

    t0 = time.time()
    video, audio, segments = build_scale_pair()
    video = np.clip(video, -32768, 32767).astype(np.int16)
    audio = np.clip(audio, -32768, 32767).astype(np.int16)
    sv, sa = video.shape[1], audio.shape[1]
    # bucket-pad once, like the pipeline's decode-ahead thread does
    from describealign_tpu.alignment.api import _pad_pcm_i16
    video = _pad_pcm_i16(video)
    audio = _pad_pcm_i16(audio)
    gen_seconds = time.time() - t0
    audio_minutes = sa / 44100.0 / 60.0

    quiet = io.StringIO()
    # warmup (compiles; cached persistently across runs)
    with redirect_stdout(quiet):
        x, y, sim, path, m = run_once(video, audio, sv, sa)
    start_offset = float(x[0] - y[0])

    # timed warm runs (min of 5: the tunneled link's throughput varies run
    # to run by +/-60%, so the minimum is the stable estimate)
    times = []
    for _ in range(5):
        t = time.time()
        with redirect_stdout(quiet):
            run_once(video, audio, sv, sa)
        times.append(time.time() - t)
    e2e = min(times)

    # batch mode: 8 DISTINCT pairs (per-pair gain + lead-in trim -> distinct
    # samples, lengths, and planted offsets) through the pipelined device
    # dispatch + threaded host stages
    from describealign_tpu.alignment.api import align_batch_from_pcm
    n_batch = 8
    pairs, lens, planted = [], [], []
    for k in range(n_batch):
        gain = 0.6 + 0.05 * k
        trim = 44100 * 5 * k              # drop 5k seconds of audio lead-in
        vk = (video.astype(np.float32) * gain).astype(np.int16)
        ak = (audio[:, trim:].astype(np.float32) * gain).astype(np.int16)
        ak = _pad_pcm_i16(ak)
        pairs.append((vk, ak))
        lens.append((sv, sa - trim))
        planted.append(202.0 - 5.0 * k)
    # warm both possible bucket shapes (the largest trim may cross a
    # 64-s bucket boundary) so no compile lands in the timed section
    with redirect_stdout(quiet):
        align_batch_from_pcm([pairs[0], pairs[-1]],
                             true_samples=[lens[0], lens[-1]])
    t = time.time()
    with redirect_stdout(quiet):
        results = align_batch_from_pcm(pairs, true_samples=lens)
    batch_wall = time.time() - t
    batch_minutes = sum(s_a / 44100.0 / 60.0 for (_, s_a) in lens)
    batch_tput = batch_minutes / batch_wall
    batch_offsets_ok = all(
        abs(float(r[0][0] - r[1][0]) - p) < 1.0
        for r, p in zip(results, planted))

    result = {
        "metric": "e2e_align_22min_pair_seconds",
        "value": round(e2e, 3),
        "unit": "seconds",
        "vs_baseline": round(30.0 / e2e, 2),
        "batch8_audio_minutes_per_second_per_chip": round(batch_tput, 2),
        "batch8_distinct_offsets_recovered": batch_offsets_ok,
        "similarity_percent": round(float(sim), 2),
        "recovered_start_offset_s": round(start_offset, 2),
        "planted_start_offset_s": 202.0,
        "median_slope": round(float(m), 6),
        "synth_gen_seconds": round(gen_seconds, 1),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
