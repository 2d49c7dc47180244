"""Pitch-shifting resampler (JAX).

Replaces the reference's chunked scipy quadratic-spline interpolator
(describealign.py:233-244): evaluates the description waveform at uniformly
spaced fractional sample positions, changing pitch with rate. Used when the
pitch shift is imperceptible (<=0.5%), the offset is tiny (<30 samples), or
--no_pitch_correction is set.

TPU design: output is produced in fixed-size chunks (one compiled shape) via
gathers + local quadratic Lagrange weights. The reference's global quadratic
spline and local Lagrange interpolation differ by sub-quantization amounts on
band-limited audio; stretch-mode parity is perceptual (see SURVEY.md section
7 step 6).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AUDIO_SAMPLE_RATE

CHUNK_OUT = AUDIO_SAMPLE_RATE * 4          # output samples per compiled call
CHUNK_IN = int(CHUNK_OUT * 1.25) + 8       # covers rates up to 1.2


@partial(jax.jit, static_argnames=())
def _resample_chunk(seg_in, start_frac, step):
    """Evaluate seg_in at positions start_frac + step*arange(CHUNK_OUT).

    seg_in: (C, CHUNK_IN). Positions are relative to seg_in[:, 0].
    Local 3-point quadratic Lagrange interpolation, f32.
    """
    pos = start_frac + step * jnp.arange(CHUNK_OUT, dtype=jnp.float32)
    base = jnp.clip(jnp.round(pos).astype(jnp.int32), 1, CHUNK_IN - 2)
    t = pos - base.astype(jnp.float32)          # in [-.5, .5]
    w_m1 = 0.5 * t * (t - 1.0)
    w_0 = (1.0 - t) * (1.0 + t)
    w_p1 = 0.5 * t * (t + 1.0)
    gm1 = seg_in[:, base - 1]
    g0 = seg_in[:, base]
    gp1 = seg_in[:, base + 1]
    return w_m1 * gm1 + w_0 * g0 + w_p1 * gp1


def resample_segment(audio_arr, x_start, x_end, num_out):
    """Stretch audio_arr[:, x_start:x_end] to num_out samples.

    Mirrors the reference's sample_points = linspace(x_start, x_end,
    num_out, endpoint=False) evaluation (describealign.py:412-414).
    Returns (C, num_out) float32 (f16-quantized like the reference's f16
    write-back).
    """
    audio_arr = np.asarray(audio_arr)
    c = audio_arr.shape[0]
    step = (x_end - x_start) / num_out
    out = np.empty((c, num_out), np.float32)
    for chunk_start in range(0, num_out, CHUNK_OUT):
        n = min(CHUNK_OUT, num_out - chunk_start)
        pos0 = x_start + step * chunk_start
        in0 = int(np.floor(pos0)) - 4
        seg = np.zeros((c, CHUNK_IN), np.float32)
        lo = max(in0, 0)
        hi = min(in0 + CHUNK_IN, audio_arr.shape[1])
        if hi > lo:
            seg[:, lo - in0:hi - in0] = audio_arr[:, lo:hi]
        chunk = _resample_chunk(jnp.asarray(seg),
                                jnp.float32(pos0 - in0), jnp.float32(step))
        out[:, chunk_start:chunk_start + n] = np.asarray(chunk)[:, :n]
    return out.astype(np.float16).astype(np.float32)
