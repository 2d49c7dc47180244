"""Optional mel-filterbank frontend (DESCRIBEALIGN_FRONTEND=mel).

The default frontend is the reference's 3-band downsample cascade
(ops/features.py - required for segment-boundary parity with the
reference, describealign.py:568-593). This module provides the alternative
named by the build plan (SURVEY.md §7 step 2): streams 2-4 become three
wide mel-spaced STFT band energies at the same 210 fps grid and the same
log compression, so every downstream stage (preprocess, matcher, fit)
works unchanged. Energy and zero-crossing streams stay as in the
reference. Not parity-preserving by construction; off by default.
"""
import os
from functools import partial

import numpy as np

SR = 44100
HOP = 210                 # one frame per 210 samples = 210 fps
N_FFT = 512
N_BANDS = 3
FMIN, FMAX = 100.0, 8000.0


def frontend_name():
    return os.environ.get('DESCRIBEALIGN_FRONTEND', 'cascade')


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)


def mel_filterbank(n_bands=N_BANDS, n_fft=N_FFT, sr=SR, fmin=FMIN,
                   fmax=FMAX):
    """(n_bands, n_fft//2+1) triangular filters on the mel scale."""
    edges_mel = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_bands + 2)
    edges_hz = _mel_to_hz(edges_mel)
    bins_hz = np.arange(n_fft // 2 + 1) * sr / n_fft
    fb = np.zeros((n_bands, n_fft // 2 + 1), np.float32)
    for b in range(n_bands):
        lo, mid, hi = edges_hz[b], edges_hz[b + 1], edges_hz[b + 2]
        up = (bins_hz - lo) / max(mid - lo, 1e-9)
        down = (hi - bins_hz) / max(hi - mid, 1e-9)
        fb[b] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def _frame_positions(n_samples):
    n_frames = n_samples // HOP
    return n_frames


def mel_band_features_host(pcm_f16):
    """Three mel band log energies at 210 fps (numpy host version).

    pcm_f16: (C, S). Returns a list of 3 float32 arrays of length S//210.
    """
    import scipy.fft
    arr = (np.mean(pcm_f16, axis=0) if pcm_f16.shape[0] > 1
           else pcm_f16[0]).astype(np.float32)
    n = len(arr) - len(arr) % HOP
    n_frames = n // HOP
    window = np.hanning(N_FFT).astype(np.float32)
    pad = np.zeros(n + N_FFT, np.float32)
    pad[:n] = arr[:n]
    idx = (np.arange(n_frames) * HOP)[:, None] + np.arange(N_FFT)[None, :]
    spec = scipy.fft.rfft(pad[idx] * window, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2) / N_FFT
    bands = power @ mel_filterbank().T                  # (F, 3)
    bands = np.log10(1.0 + bands / 32768.0) / 2.0       # int16-scale comp.
    return [bands[:, b].astype(np.float32) for b in range(N_BANDS)]


def mel_band_features(pcm):
    """JAX device version (same math as mel_band_features_host)."""
    import jax.numpy as jnp
    arr = jnp.mean(pcm, axis=0) if pcm.shape[0] > 1 else pcm[0]
    arr = arr.astype(jnp.float32)
    n = arr.shape[0] - arr.shape[0] % HOP
    n_frames = n // HOP
    window = jnp.asarray(np.hanning(N_FFT).astype(np.float32))
    pad = jnp.concatenate([arr[:n], jnp.zeros(N_FFT, jnp.float32)])
    idx = (jnp.arange(n_frames) * HOP)[:, None] + jnp.arange(N_FFT)[None, :]
    spec = jnp.fft.rfft(pad[idx] * window, axis=1)
    power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) / N_FFT
    bands = power @ jnp.asarray(mel_filterbank().T)
    bands = jnp.log10(1.0 + bands / 32768.0) / 2.0
    return [bands[:, b] for b in range(N_BANDS)]
