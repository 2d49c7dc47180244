"""Pallas TPU kernel: fused fine-band correlation + match quality + top-K.

The fine matching pass evaluates, for each 210-frame audio block, windowed
Pearson correlations of 5 features against a +/-FINE_HALF_BAND video band
and reduces them to top-K match candidates (see alignment/matching.py).
The XLA version materializes per-chunk (5, 210, 768) correlation tensors in
HBM; this kernel keeps correlation, quality, and top-K selection entirely
in VMEM - the only HBM traffic is the windowed input tiles in and a 210x8
result out per block.

Mosaic-friendly staging: window matrices are built (and norm-divided) in
XLA-land - sliding windows as shifted copies - then gathered into
per-block tiles (the band start offsets come from the coarse DP, so they
are data-dependent; a gather puts them on tile boundaries for the
pipeline). The kernel itself is five (48,256)x(48,768) MXU contractions,
the Naive-Bayes quality (reference describealign.py:662-673), and an
iterative keepdims top-K; pallas double-buffers the tile streaming
automatically.

Status (v5e, 22-min pair, round 2): the full device matcher runs 0.217 s
via the XLA lax.map path vs 0.221 s via this kernel, with bit-identical
outputs - a dead heat (round 1's gather-staging deficit disappeared once
the host-feature path shrank the working set). XLA stays the default;
this kernel remains opt-in (DESCRIBEALIGN_PALLAS=1) as the fused-VMEM
variant, re-benchmark when the band geometry changes.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alignment import matching as M
from ..alignment.preprocess import WINDOW

BLOCK = M.BLOCK                 # 210
W = WINDOW                      # 41
HALF = M.FINE_HALF_BAND         # 279
FINE_W = M.FINE_W               # 768
TOP_K = M.TOP_K                 # 8
W_PAD = 48       # W=41 padded to the f32 sublane tile (8); zero rows exact
BLOCK_PAD = 256  # 210 padded to the lane tile (128); tail rows masked out


def _windowed_normalized(ms, norms):
    """(5, W_PAD, Npad + BLOCK_PAD): entry [f, t, i] = ms[f, i+t]/norms[f, i]
    for t < W, zeros beyond (they contribute nothing to the contraction)."""
    shifted = jnp.stack(
        [jnp.pad(ms[:, t:], ((0, 0), (0, t))) for t in range(W)], axis=1)
    shifted = jnp.pad(shifted, ((0, 0), (0, W_PAD - W), (0, 0)))
    out = shifted / norms[:, None, :]
    return jnp.pad(out, ((0, 0), (0, 0), (0, BLOCK_PAD)))


def _gather_tiles(w, starts, width):
    """(nb, 5, W_PAD, width) tiles of w at per-block column offsets."""
    idx = starts[:, None] + jnp.arange(width)[None, :]      # (nb, width)
    return jnp.moveaxis(w[:, :, idx], 2, 0)


def _kernel(starts_ref, wa_blk, wv_blk, mv_blk, quals_out, vids_out):
    b = pl.program_id(0)
    start = starts_ref[b]

    mv = mv_blk[0]                            # (1, FINE_W)
    e_row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_PAD, FINE_W), 1)
    l_col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_PAD, FINE_W), 0)

    def corr_f(f):
        return jax.lax.dot_general(
            wa_blk[0, f], wv_blk[0, f],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (BLOCK_PAD, FINE_W)

    prob = jnp.maximum(1e-8, 1.0 - corr_f(0))
    prob = prob * jnp.maximum(1e-8, 1.0 - corr_f(1))
    prob = prob * jnp.maximum(1e-8, 1.0 - corr_f(2))
    prob = prob ** M.NB_EXPONENT
    band_ok = jnp.maximum(corr_f(3), corr_f(4)) >= M.BAND_GATE

    qual = jnp.minimum(M.QUAL_MAX, (prob / M.QUAL_SCALE) ** (-1.0 / 3))
    in_band = (e_row >= l_col) & (e_row <= l_col + 2 * HALF)
    valid = (in_band & (mv > 0) & (prob <= M.QUAL_PROB_CUTOFF) & band_ok
             & (l_col < BLOCK))
    qual = jnp.where(valid, qual, 0.0)

    # iterative top-K (K=8): keepdims max + mask-out, all in VMEM
    for k in range(TOP_K):
        best = jnp.max(qual, axis=1, keepdims=True)       # (BLOCK_PAD, 1)
        arg = jnp.argmax(qual, axis=1).astype(jnp.int32)  # (BLOCK_PAD,)
        quals_out[0, :, k] = best[:, 0]
        vids_out[0, :, k] = start + arg
        if k + 1 < TOP_K:
            hit = (e_row == jnp.argmax(qual, axis=1,
                                       keepdims=True).astype(jnp.int32))
            qual = jnp.where(hit, 0.0, qual)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fine_match_pallas(ms_a, norms_a, mask_a, ms_v, norms_v, mask_v, starts,
                      interpret=False):
    """Run the fused fine-match kernel over all blocks.

    ms_*: (5, Npad) f32; norms_*: (5, Npad); mask_*: (Npad,) f32 (0/1);
    starts: (nb,) i32 clipped band starts. Returns (quals, vids) shaped
    (nb, 210, TOP_K); audio-frame validity is applied after the kernel.
    """
    nb = starts.shape[0]
    wa = _windowed_normalized(ms_a, norms_a)
    wv = _windowed_normalized(ms_v, norms_v)
    a_starts = jnp.arange(nb, dtype=jnp.int32) * BLOCK
    wa_blk = _gather_tiles(wa, a_starts, BLOCK_PAD)
    wv_blk = _gather_tiles(wv, starts, FINE_W)
    mv_blk = jnp.pad(mask_v, (0, BLOCK_PAD))[
        starts[:, None] + jnp.arange(FINE_W)[None, :]][:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 5, W_PAD, BLOCK_PAD), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, W_PAD, FINE_W), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, FINE_W), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_PAD, TOP_K), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_PAD, TOP_K), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    quals, vids = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, BLOCK_PAD, TOP_K), jnp.float32),
            jax.ShapeDtypeStruct((nb, BLOCK_PAD, TOP_K), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(starts, wa_blk, wv_blk, mv_blk)
    quals = quals[:, :BLOCK]
    vids = vids[:, :BLOCK]
    # audio-frame validity: a column broadcast, applied outside the kernel
    frame_mask = mask_a[:nb * BLOCK].reshape(nb, BLOCK, 1) > 0
    quals = jnp.where(frame_mask, quals, 0.0)
    return quals, vids
