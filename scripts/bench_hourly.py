#!/usr/bin/env python
"""Dev tool: one timestamped batch-throughput measurement, appended as a
JSON line to a log. Used by a background loop to build the multi-hour
link-variance table in PERF.md (round-5 VERDICT item 7): the tunneled
host<->device link and the shared host core both drift hour to hour, so
single-run numbers are uninterpretable without this context.

Usage: python scripts/bench_hourly.py [logfile]
Run under flock so manual TPU experiments and the loop never overlap:
    flock /tmp/tpu.lock python scripts/bench_hourly.py /tmp/bench_hours.jsonl
"""
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_hours.jsonl"
    t_gen = time.time()
    from bench import build_batch_pairs, build_scale_pair
    import numpy as np
    pairs, lens, planted, kinds = build_batch_pairs()
    batch_minutes = sum(s_a / 44100.0 / 60.0 for (_, s_a) in lens)

    from describealign_tpu.alignment.api import (align_batch_from_pcm,
                                                 align_from_pcm,
                                                 _pad_pcm_i16)
    video, audio, _ = build_scale_pair()
    video = _pad_pcm_i16(np.clip(video, -32768, 32767).astype(np.int16))
    audio = _pad_pcm_i16(np.clip(audio, -32768, 32767).astype(np.int16))
    gen_s = time.time() - t_gen

    quiet = io.StringIO()
    with redirect_stdout(quiet):
        align_from_pcm(video, audio)           # warm (persistent cache)
        align_batch_from_pcm(pairs, true_samples=lens)

    e2e = float('inf')
    for _ in range(3):
        t = time.time()
        with redirect_stdout(quiet):
            align_from_pcm(video, audio)
        e2e = min(e2e, time.time() - t)

    walls = []
    cpu0 = time.process_time()
    for _ in range(3):
        t = time.time()
        with redirect_stdout(quiet):
            align_batch_from_pcm(pairs, true_samples=lens)
    # separate loop timing to keep min-of-3 semantics simple
        walls.append(time.time() - t)
    cpu = (time.process_time() - cpu0) / 3
    row = {
        "ts": time.strftime("%Y-%m-%d %H:%M"),
        "e2e_s": round(e2e, 3),
        "batch_wall_s": round(min(walls), 2),
        "batch_walls": [round(w, 2) for w in walls],
        "batch_cpu_per_pair_s": round(cpu / len(pairs), 3),
        "tput_audio_min_per_s": round(batch_minutes / min(walls), 2),
        "gen_s": round(gen_s, 1),
    }
    with open(log, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
