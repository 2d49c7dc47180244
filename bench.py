#!/usr/bin/env python
"""Driver benchmark: align a synthetic Ask-Dad-scale pair on one chip.

Mirrors the reference's headline benchmark (README.md:71: full 22-min video
+ 27-min description aligned in ~30 s on a desktop CPU; the real test media
is not in this checkout, so an equivalent-scale synthetic pair with a
planted 202 s start offset and 8 narration insertions stands in).

Measured: warm end-to-end align time - PCM in RAM -> features -> matching ->
LIS -> fit -> pass 2 -> nodes (decode excluded on both sides, per
BASELINE.md "decode aside"). Also reports batch-mode throughput over 8
pairs with DISTINCT content (incl. a ~50%-similarity member and a 3%
rate-changed member; see build_batch_pairs) in audio-minutes/sec/chip.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


BENCH_PAIR_CACHE = "/tmp/describealign_bench_pair_v1.npz"
BENCH_BATCH_CACHE = "/tmp/describealign_bench_batch_v4.npz"


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


def _narr(first, spacing, dur, count):
    return tuple((first + spacing * k, dur) for k in range(count))


def build_batch_pairs():
    """8 feature-length pairs with DISTINCT content (different seeds ->
    different self-similarity structure), all sharing one audio shape
    bucket (~27 min):

    - pairs 0-4, 7: ordinary AD-style pairs (22-min content, varying
      lead-ins and narration layouts);
    - pair 5: ~50% similarity - only the middle half of the video is
      described, so BOTH coverage fractions (similarity is their max,
      outputs.py:23-26) sit near 50%: the regime the reference README's
      Ask Dad pair lives in (50.70%) and where its >90%-undescribed
      warning gate does NOT fire;
    - pair 6: a 3% rate-changed description (PAL-style), exercising the
      coarse DP's drift tracking + fused-lasso slope at batch scale.

    Returns (pairs int16, true_samples, planted_offsets, kinds).
    """
    if os.path.exists(BENCH_BATCH_CACHE):
        try:
            z = np.load(BENCH_BATCH_CACHE)
            pairs = [(z[f"v{k}"], z[f"a{k}"]) for k in range(8)]
            return (pairs, [tuple(t) for t in z["lens"]],
                    list(z["planted"]), list(z["kinds"]))
        except Exception:
            pass
    from scipy.signal import resample_poly
    from describealign_tpu.utils.synthmedia import build_pair, speech_like

    def to_i16(x):
        return np.clip(x, -32768, 32767).astype(np.int16)

    specs = [
        (42, 1320.0, _narr(120.0, 150.0, 12.0, 8), 202.0),
        (101, 1320.0, _narr(100.0, 200.0, 20.0, 6), 180.0),
        (202, 1320.0, _narr(90.0, 125.0, 10.0, 10), 250.0),
        (303, 1320.0, _narr(200.0, 300.0, 25.0, 4), 120.0),
        (404, 1320.0, _narr(80.0, 160.0, 15.0, 8), 90.0),
        "lowsim",
        "rate",
        (707, 1320.0, _narr(150.0, 250.0, 24.0, 5), 60.0),
    ]
    sr = 44100
    pairs, lens, planted, kinds = [], [], [], []
    for i, spec in enumerate(specs):
        if spec == "rate":
            content = speech_like(1320.0, seed=606)
            slowed = resample_poly(content, 103, 100)
            lead = speech_like(180.0, seed=1606, amp=5000.0)
            tail = speech_like(80.0, seed=2606, amp=5000.0)
            v = to_i16(np.round(content))[None, :]
            a = to_i16(np.round(np.concatenate([lead, slowed, tail])))[None, :]
            pairs.append((v, a))
            planted.append(180.0)
            kinds.append("rate")
        elif spec == "lowsim":
            content = speech_like(1320.0, seed=505)
            # audio describes only video 330..990 s (six 110-s chunks with
            # narration between/around); audio length matches the video, so
            # both coverage fractions land at ~50%
            pieces = [speech_like(150.0, seed=1505, amp=5000.0)]
            for k in range(6):
                a0, a1 = 330.0 + k * 110.0, 330.0 + (k + 1) * 110.0
                pieces.append(content[int(a0 * sr):int(a1 * sr)])
                if k < 5:
                    pieces.append(speech_like(90.0, seed=2505 + k,
                                              amp=5000.0))
            pieces.append(speech_like(60.0, seed=3505, amp=5000.0))
            v = to_i16(np.round(content))[None, :]
            a = to_i16(np.round(np.concatenate(pieces)))[None, :]
            pairs.append((v, a))
            planted.append(150.0 - 330.0)     # first described chunk
            kinds.append("lowsim")
        else:
            seed, content_s, narr, lead = spec
            v, a, _ = build_pair(content_seconds=content_s, narration=narr,
                                 lead_in=lead, seed=seed)
            pairs.append((to_i16(v), to_i16(a)))
            planted.append(lead)
            kinds.append("lowsim" if i == 5 else "plain")
        lens.append((pairs[-1][0].shape[1], pairs[-1][1].shape[1]))
    try:
        np.savez(BENCH_BATCH_CACHE,
                 **{f"v{k}": p[0] for k, p in enumerate(pairs)},
                 **{f"a{k}": p[1] for k, p in enumerate(pairs)},
                 lens=np.asarray(lens), planted=np.asarray(planted),
                 kinds=np.asarray(kinds))
    except Exception:
        pass
    return pairs, lens, planted, kinds


def run_once(video_i16, audio_i16, sv, sa):
    from describealign_tpu.alignment.api import align_from_pcm
    return align_from_pcm(video_i16, audio_i16,
                          video_samples=sv, audio_samples=sa)


def _require_device(timeout_s=None):
    """Fail fast (one diagnostic JSON line, exit 3) if the device backend
    does not answer. The tunneled TPU link is known to hang for hours at a
    time; without this guard a bench run during an outage blocks forever
    at the first backend call instead of reporting anything."""
    import threading
    if timeout_s is None:
        timeout_s = int(os.environ.get(
            "DESCRIBEALIGN_BENCH_PROBE_TIMEOUT", "300"))
    ok = threading.Event()

    def probe():
        try:
            import jax
            if jax.devices():
                ok.set()
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(json.dumps({
            "metric": "e2e_align_22min_pair_seconds", "value": None,
            "unit": "seconds", "vs_baseline": None,
            "error": (f"device backend unresponsive after {timeout_s}s "
                      "(tunnel outage?) - no timing was possible"),
        }))
        sys.stdout.flush()
        os._exit(3)


def main():
    import io
    from contextlib import redirect_stdout

    _require_device()
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
        x, y, sim, path, m = run_once(video, audio, sv, sa)[:5]
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

    # batch mode: 8 pairs with DISTINCT content seeds (incl. a ~50%-
    # similarity member and a 3% rate-changed member) through the
    # pipelined device dispatch + threaded host stages
    from describealign_tpu.alignment.api import align_batch_from_pcm
    t0 = time.time()
    pairs, lens, planted, kinds = build_batch_pairs()
    batch_gen_seconds = time.time() - t0
    # warm EVERY bucket the batch hits (lead-in/narration layouts spread
    # the 8 pairs over several 64-s shape buckets) so no compile lands in
    # the timed section
    with redirect_stdout(quiet):
        align_batch_from_pcm(pairs, true_samples=lens)
    batch_wall = float('inf')
    for _ in range(5):        # best of 5: link bandwidth drifts run to run
        t = time.time()
        with redirect_stdout(quiet):
            results = align_batch_from_pcm(pairs, true_samples=lens)
        batch_wall = min(batch_wall, time.time() - t)
    batch_minutes = sum(s_a / 44100.0 / 60.0 for (_, s_a) in lens)
    batch_tput = batch_minutes / batch_wall
    batch_offsets_ok = all(
        abs(float(r[0][0] - r[1][0]) - p) < 1.0
        for r, p in zip(results, planted))
    lowsim_pct = float(results[kinds.index("lowsim")][2])
    rate_slope = float(results[kinds.index("rate")][4])

    result = {
        "metric": "e2e_align_22min_pair_seconds",
        "value": round(e2e, 3),
        "unit": "seconds",
        "vs_baseline": round(30.0 / e2e, 2),
        "batch8_audio_minutes_per_second_per_chip": round(batch_tput, 2),
        "batch8_distinct_offsets_recovered": batch_offsets_ok,
        "batch8_lowsim_similarity_percent": round(lowsim_pct, 2),
        "batch8_rate_pair_median_slope": round(rate_slope, 6),
        "batch8_gen_seconds": round(batch_gen_seconds, 1),
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
