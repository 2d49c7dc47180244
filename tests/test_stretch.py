"""Stretch-mode kernels: resampler and phase vocoder."""
import numpy as np

from describealign_tpu.stretch.resample import resample_segment
from describealign_tpu.stretch.phase_vocoder import pv_stretch

SR = 44100


def tone(freq, seconds, amp=8000.0):
    t = np.arange(int(seconds * SR)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :]


def dominant_freq(x):
    spec = np.abs(np.fft.rfft(x[0] * np.hanning(len(x[0]))))
    return np.argmax(spec) * SR / len(x[0])


def test_resample_identity():
    sig = tone(440, 2.0)
    out = resample_segment(sig, 0, sig.shape[1], sig.shape[1])
    assert out.shape == sig.shape
    # interior must match closely (f16 write-back quantization)
    err = np.abs(out[:, 100:-100] - sig[:, 100:-100])
    assert np.max(err) < 40.0  # ~0.5% of amplitude (f16 grid at 8000)


def test_resample_shifts_pitch():
    sig = tone(440, 2.0)
    n_out = int(sig.shape[1] * 1.05)  # slower -> lower pitch
    out = resample_segment(sig, 0, sig.shape[1], n_out)
    assert out.shape[1] == n_out
    f = dominant_freq(out)
    assert abs(f - 440 / 1.05) < 2.0


def test_pv_preserves_pitch():
    sig = tone(440, 3.0)
    n_out = int(sig.shape[1] * 1.08)
    out = pv_stretch(sig, n_out)
    assert out.shape == (1, n_out)
    f = dominant_freq(out[:, SR // 2: -SR // 2])
    assert abs(f - 440) < 3.0  # pitch unchanged despite 8% stretch
    # energy preserved (no dropouts): compare RMS
    rms_in = np.sqrt(np.mean(sig ** 2))
    rms_out = np.sqrt(np.mean(out[:, SR // 2: -SR // 2] ** 2))
    assert 0.7 * rms_in < rms_out < 1.3 * rms_in


def test_pv_multichannel_and_chunk_joins():
    rng = np.random.default_rng(0)
    n = int(SR * 9.5)  # spans multiple 4 s chunks
    sig = np.stack([rng.standard_normal(n), rng.standard_normal(n)]).astype(
        np.float32) * 3000
    n_out = int(n * 0.93)
    out = pv_stretch(sig, n_out)
    assert out.shape == (2, n_out)
    # no silent holes at chunk boundaries
    chunk = SR * 4
    for boundary in range(chunk, n_out - SR, chunk):
        seg = out[:, boundary - 2048:boundary + 2048]
        assert np.sqrt(np.mean(seg ** 2)) > 500
