#!/usr/bin/env python
"""Dev tool: randomized full-align parity campaign vs the executed reference.

Draws random scenarios (NON-INTEGER lead-ins and skip positions, random
rates and skip counts) and compares the reference's align() against ours
on the same feature arrays. Run with JAX_PLATFORMS=cpu.

    python scripts/parity_campaign.py [n_draws]
"""
import os
import sys
import time
import types

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from describealign_tpu.utils.synthmedia import speech_like  # noqa: E402

SR = 44100


def load_reference():
    for name, attrs in (("natsort", {"os_sorted": sorted}),
                        ("static_ffmpeg", {"add_paths": lambda: None}),
                        ("ffmpeg", {})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference")
    import describealign as ref
    sys.path.remove("/root/reference")
    return ref


def draw_scenario(rng, seed):
    content_s = float(rng.uniform(60, 150))
    lead = float(rng.uniform(3.0, 25.0))
    n_skips = int(rng.integers(0, 5))
    cuts = np.sort(rng.uniform(10.0, content_s - 10.0, n_skips))
    cuts = cuts[np.diff(np.concatenate([[0.0], cuts])) > 8.0]
    durs = rng.uniform(2.0, 8.0, len(cuts))
    rate = 1.0
    if rng.uniform() < 0.4:
        rate = 1.0 + float(rng.choice([-1, 1])) * float(rng.uniform(0.005, 0.03))

    content = speech_like(content_s, seed=seed)
    if rate != 1.0:
        from scipy.signal import resample_poly
        num = int(round(1000 * rate))
        video_sig = resample_poly(content, 1000, num)
    else:
        video_sig = content
    pieces = [speech_like(lead, seed=seed + 9001, amp=5000.0)]
    cursor = 0.0
    for k, (cut, dur) in enumerate(zip(cuts, durs)):
        pieces.append(content[int(cursor * SR):int(cut * SR)])
        pieces.append(speech_like(float(dur), seed=seed + 9100 + k,
                                  amp=5000.0))
        cursor = float(cut)
    pieces.append(content[int(cursor * SR):])
    audio_sig = np.concatenate(pieces)

    def q(sig):
        return np.clip(np.round(sig), -32768, 32767).astype(
            np.int16)[None].astype(np.float16)

    meta = dict(content_s=content_s, lead=lead, cuts=list(np.round(cuts, 2)),
                durs=list(np.round(durs, 2)), rate=rate)
    return q(video_sig), q(audio_sig), meta


def run_one(ref, da, video, audio):
    import io
    from contextlib import redirect_stdout
    vf = [np.asarray(f) for f in
          (ref.get_energy(video), ref.get_zero_crossings(video))] \
        + [np.asarray(f) for f in ref.get_freq_bands(video)]
    af = [np.asarray(f) for f in
          (ref.get_energy(audio), ref.get_zero_crossings(audio))] \
        + [np.asarray(f) for f in ref.get_freq_bands(audio)]
    quiet = io.StringIO()
    with redirect_stdout(quiet):
        r = ref.align(vf, af, vf[0], af[0])
        o = da.align([np.asarray(f, np.float32) for f in vf],
                     [np.asarray(f, np.float32) for f in af],
                     np.asarray(vf[0], np.float32),
                     np.asarray(af[0], np.float32))
    return r, o


def compare(r, o):
    r_x, r_y = np.asarray(r[0], float), np.asarray(r[1], float)
    o_x, o_y = np.asarray(o[0], float), np.asarray(o[1], float)
    lo = max(r_x[0], o_x[0]) + 0.5
    hi = min(r_x[-1], o_x[-1]) - 0.5
    probes = np.linspace(lo, hi, 50)
    err = np.abs(np.interp(probes, r_x, r_y) - np.interp(probes, o_x, o_y))
    return float(err.max()), float(abs(float(r[2]) - float(o[2])))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ref = load_reference()
    import describealign_tpu as da
    rng = np.random.default_rng(20260816)
    worst = []
    for i in range(n):
        video, audio, meta = draw_scenario(rng, 500 + i)
        t = time.time()
        try:
            r, o = run_one(ref, da, video, audio)
            map_err, sim_err = compare(r, o)
            status = "OK " if map_err < 0.35 and sim_err < 10 else "FAIL"
        except RuntimeError as e:
            map_err, sim_err, status = float('nan'), float('nan'), f"RAISE({e})"
        print(f"[{i:02d}] {status} map_err={map_err:6.3f} "
              f"sim_err={sim_err:5.2f} ({time.time()-t:5.1f}s) {meta}",
              flush=True)
        worst.append((map_err, i, meta))
    finite = [w for w in worst if np.isfinite(w[0])]
    if finite:
        print("worst:", max(finite))


if __name__ == "__main__":
    main()
