"""Test-only ffmpeg/ffprobe stand-ins.

Run as `python fakebin.py ffmpeg ...` / `python fakebin.py ffprobe ...`
(the fixture wraps them in executable shims). They emulate exactly the
invocations the media layer makes - decode to s16le on stdout, stdin-PCM
mux, setts retime mux, keyframe and disposition probes - treating any
input "container" as a 16-bit WAV regardless of extension. Every ffmpeg
invocation also records its full argv to <output>.ffargs.json so tests
can assert the argument contract of commands that really executed.

Standalone on purpose: subprocesses must not import jax.
"""
import json
import os
import sys
import wave

import numpy as np


def read_wav(path):
    with wave.open(path, 'rb') as w:
        ch, rate = w.getnchannels(), w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return data.reshape(-1, ch).T, rate


def write_wav(path, arr, rate):
    with wave.open(path, 'wb') as w:
        w.setnchannels(arr.shape[0])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.T.astype(np.int16).tobytes())


def adapt_channels(arr, n):
    if arr.shape[0] > n:
        mixed = np.mean(arr.astype(np.float32), axis=0, keepdims=True)
        arr = np.clip(np.round(mixed), -32768, 32767).astype(np.int16)
        arr = np.repeat(arr, n, axis=0)
    elif arr.shape[0] < n:
        arr = np.repeat(arr, n // arr.shape[0] + 1, axis=0)[:n]
    return arr


def opt(args, flag, default=None):
    vals = [args[i + 1] for i, a in enumerate(args[:-1]) if a == flag]
    return vals[-1] if vals else default


def opt_all(args, flag):
    return [args[i + 1] for i, a in enumerate(args[:-1]) if a == flag]


def fake_ffmpeg(args):
    inputs = opt_all(args, '-i')
    if args and args[-1] == '-':                       # decode to stdout
        arr, rate = read_wav(inputs[0])
        if rate != 44100:
            raise SystemExit("fake ffmpeg: expected 44.1 kHz test media")
        arr = adapt_channels(arr, int(opt(args, '-ac', '2')))
        sys.stdout.buffer.write(arr.T.tobytes())
        return 0

    output = args[-1]
    with open(output + ".ffargs.json", 'w') as f:
        json.dump(args, f)

    if 'pipe:' in inputs:                              # stretch-mode mux
        pcm = sys.stdin.buffer.read()
        arr = np.frombuffer(pcm, np.int16).reshape(-1, 2).T
        write_wav(output, arr, 44100)
        return 0

    # default-mode setts mux: "copy" the (cut, retimed) video stream; the
    # fake applies the -ss cut to the WAV samples so tests can check it
    video = inputs[-1]
    arr, rate = read_wav(video)
    ss = float(opt(args, '-ss', '0'))
    arr = arr[:, int(ss * rate):]
    bsf = opt(args, '-bsf:v', '')
    if not bsf.startswith("setts=pts='TS"):
        raise SystemExit(f"fake ffmpeg: missing/malformed setts bsf: {bsf}")
    write_wav(output, arr, rate)
    return 0


def fake_ffprobe(args):
    target = args[-1]
    if '-skip_frame' in args:                          # keyframe probe
        arr, rate = read_wav(target)
        duration = arr.shape[1] / rate
        entry = opt(args, '-show_entries', 'frame=pts_time')
        key = entry.split('=', 1)[1]
        frames = [{key: f"{t:.6f}"} for t in
                  np.arange(0.0, duration, 2.0)]      # keyframe every 2 s
        json.dump({"frames": frames}, sys.stdout)
        return 0
    if '-show_streams' in args:                        # disposition probe
        json.dump({"streams": [{"disposition": {"descriptions": 0,
                                                "visual_impaired": 0}}]},
                  sys.stdout)
        return 0
    raise SystemExit(f"fake ffprobe: unrecognized invocation: {args}")


if __name__ == "__main__":
    tool, rest = sys.argv[1], sys.argv[2:]
    sys.exit(fake_ffmpeg(rest) if tool == "ffmpeg" else fake_ffprobe(rest))
