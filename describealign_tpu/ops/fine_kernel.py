"""Fused Pallas TPU kernel for the fine matching pass.

The fine pass evaluates, per 210-frame audio block, windowed Pearson
correlations of 5 features against a 768-position video band and reduces
them to TOP_K quality/offset candidates (reference Naive-Bayes form,
describealign.py:662-673; see alignment/matching.py for the full design).

The XLA lax.map path materializes im2col window tensors and (5, 210, 768)
correlation maps in HBM per block - measured ~70 ms per 256-block chunk on
v5e against ~2 ms of actual MXU math. This kernel keeps EVERYTHING in
VMEM:

- per block, four DMAs bring in 8-row bundles of the raw feature and
  norm/mask slices (~100 KB; the only HBM traffic besides the 8-candidate
  output rows). Mosaic requires DMA slices tile-aligned on BOTH dims
  (sublane multiple of 8, lane offset/shape multiple of 128), so inputs
  are bundled to 8 sublanes outside the kernel and the copies grab
  128-aligned lane windows; a dynamic lane roll inside the kernel
  removes the residual [0, 216] offset,
- the 41-tap sliding windows are then static shifted row slices of the
  rolled buffers (VMEM lane rotations, no HBM im2col),
- the five (256,48)x(48,768) correlations run back to back on the MXU,
- quality, gating, and the iterative top-K run on the VPU in place.

Unlike the round-2 kernel (ops/pallas_fine.py, deleted) this one takes
per-block AUDIO starts as a scalar-prefetch operand too, so it serves the
streamed chunk path (traced b0) as well as the single-shot full pass -
it is the production fine pass on TPU (DESCRIBEALIGN_PALLAS=0 opts out).

Numerics: the correlation contraction order differs from the XLA path's
einsum, so qualities agree to ~1e-5 relative rather than bitwise; both
paths pass the same oracle/parity gates, and streamed == single-shot
equality is preserved because both use this kernel on TPU.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alignment import matching as M
from ..alignment.preprocess import WINDOW

BLOCK = M.BLOCK                 # 210
W = WINDOW                      # 41
FINE_W = M.FINE_W               # 768
TOP_K = M.TOP_K                 # 8
BLOCK_PAD = 256                 # 210 -> lane tile; tail rows masked
W_PAD = 48                      # 41 -> f32 sublane tile; zero rows inert
SEG_A = BLOCK_PAD + W - 1       # audio frames a block's windows read (296)
SEG_V = FINE_W + W - 1          # video frames a block's windows read (808;
                                # equals the band clip margin in
                                # _coarse_tracks, so v_start + SEG_V never
                                # overruns Npad)
SEG_A_AL = 512                  # 128-aligned DMA window; the [0, 216]
SEG_V_AL = 1024                 # residual offset + SEG fits exactly


def _kernel(v_al_ref, v_dl_ref, a_al_ref, a_dl_ref,
            ms_a, aux_a_in, ms_v, aux_v_in,
            quals_out, offs_out, seg_a, seg_v, aux_a, aux_v,
            sa_win, sv_win, sem):
    b = pl.program_id(0)
    a_al = pl.multiple_of(a_al_ref[b], 128)
    v_al = pl.multiple_of(v_al_ref[b], 128)

    cps = (
        pltpu.make_async_copy(ms_a.at[:, pl.ds(a_al, SEG_A_AL)], seg_a,
                              sem.at[0]),
        pltpu.make_async_copy(ms_v.at[:, pl.ds(v_al, SEG_V_AL)], seg_v,
                              sem.at[1]),
        pltpu.make_async_copy(aux_a_in.at[:, pl.ds(a_al, SEG_A_AL)], aux_a,
                              sem.at[2]),
        pltpu.make_async_copy(aux_v_in.at[:, pl.ds(v_al, SEG_V_AL)], aux_v,
                              sem.at[3]),
    )
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # undo the alignment residue: rolled[:, i] = raw[:, i + delta]
    da = a_dl_ref[b]
    dv = v_dl_ref[b]
    sa = pltpu.roll(seg_a[:, :], SEG_A_AL - da, axis=1)
    sv = pltpu.roll(seg_v[:, :], SEG_V_AL - dv, axis=1)
    na = pltpu.roll(aux_a[:, :], SEG_A_AL - da, axis=1)
    nv = pltpu.roll(aux_v[:, :], SEG_V_AL - dv, axis=1)

    # windows as shifted rows, STORED into scratch (Mosaic cannot
    # concatenate value slices with mismatched sublane offsets, but row
    # stores insert the relayout); W..W_PAD-1 rows are zero so the
    # 48-deep contraction is exact - scratch persists across grid steps,
    # so the zero rows are written once
    @pl.when(b == 0)
    def _zero_pad_rows():
        zero_a = jnp.zeros((BLOCK_PAD,), jnp.float32)
        zero_v = jnp.zeros((FINE_W,), jnp.float32)
        for f in range(5):
            for t in range(W, W_PAD):
                sa_win[f, t, :] = zero_a
                sv_win[f, t, :] = zero_v

    for f in range(5):
        for t in range(W):
            sa_win[f, t, :] = sa[f, t:t + BLOCK_PAD]
            sv_win[f, t, :] = sv[f, t:t + FINE_W]

    # hoist the norm divisions to per-row/col reciprocals (256 + 768
    # divides instead of 5 x 196K)
    rna = 1.0 / na[:, :BLOCK_PAD]                        # (8, 256)
    rnv = 1.0 / nv[:, :FINE_W]                           # (8, 768)

    def corr(f):
        dots = jax.lax.dot_general(
            sa_win[f], sv_win[f],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (256, 768)
        return dots * (rna[f][:, None] * rnv[f][None, :])

    p3 = jnp.maximum(1e-8, 1.0 - corr(0))
    p3 = p3 * jnp.maximum(1e-8, 1.0 - corr(1))
    p3 = p3 * jnp.maximum(1e-8, 1.0 - corr(2))
    band_ok = jnp.maximum(corr(3), corr(4)) >= M.BAND_GATE

    # prob = p3^2.9; gate prob <= cutoff and qual = min(50,
    # (prob/1e-12)^(-1/3)) = min(50, 1e-4 * p3^(-2.9/3)) via ONE log and
    # ONE exp instead of two pow rectangles (pow lowers to exp+log each;
    # transcendentals dominate the VPU time here)
    lp = jnp.log(p3)
    prob_gate = lp <= math.log(M.QUAL_PROB_CUTOFF) / M.NB_EXPONENT
    qual = jnp.minimum(M.QUAL_MAX,
                       1e-4 * jnp.exp((-M.NB_EXPONENT / 3.0) * lp))
    l_col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_PAD, FINE_W), 0)
    e_row = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_PAD, FINE_W), 1)
    in_band = (e_row >= l_col) & (e_row <= l_col + 2 * M.FINE_HALF_BAND)
    valid = (in_band
             & (na[5, :BLOCK_PAD][:, None] > 0)
             & (nv[5, :FINE_W][None, :] > 0)
             & prob_gate & band_ok & (l_col < BLOCK))
    qual = jnp.where(valid, qual, 0.0)

    # iterative top-K, all in VMEM
    for k in range(TOP_K):
        best = jnp.max(qual, axis=1)                     # (256,)
        arg = jnp.argmax(qual, axis=1).astype(jnp.int32)
        quals_out[0, k, :] = best
        offs_out[0, k, :] = arg
        if k + 1 < TOP_K:
            qual = jnp.where(e_row == arg[:, None], 0.0, qual)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fine_match_fused(ms_a, norms_a, a_mask, ms_v, norms_v, v_mask,
                     v_starts, a_starts, interpret=False):
    """Fused fine pass over one track's blocks.

    ms_*: (5, Npad) f32 mean-subtracted features; norms_*: (5, Npad) f32;
    *_mask: (Npad,) f32 0/1; v_starts: (C,) i32 clipped band starts;
    a_starts: (C,) i32 first audio frame per block (b * 210 - traced, so
    the streamed chunk path works). Npad is a BUCKET_FRAMES multiple, so
    it is 128-aligned and the clamped DMA windows stay in bounds.

    Returns (quals (C, 210, TOP_K) f32, offs (C, 210, TOP_K) i32 in-band
    offsets; video frame = v_starts[c] + off).
    """
    c = v_starts.shape[0]
    npad = ms_a.shape[1]
    # streamed chunks pad past the last real block; their audio starts are
    # clamped so the DMA never overruns (contents are masked out later)
    a_starts = jnp.clip(a_starts, 0, npad - SEG_A)
    v_starts = v_starts.astype(jnp.int32)
    a_al = jnp.minimum((a_starts // 128) * 128, npad - SEG_A_AL)
    a_dl = (a_starts - a_al).astype(jnp.int32)           # in [0, 216]
    v_al = jnp.minimum((v_starts // 128) * 128, npad - SEG_V_AL)
    v_dl = (v_starts - v_al).astype(jnp.int32)           # in [0, 216]
    # 8-sublane input bundles (Mosaic DMA slice-shape alignment): features
    # padded with 3 zero rows; norms and the mask share one bundle
    pad3 = ((0, 3), (0, 0))
    ms_a8 = jnp.pad(ms_a.astype(jnp.float32), pad3)
    ms_v8 = jnp.pad(ms_v.astype(jnp.float32), pad3)
    aux_a8 = jnp.pad(jnp.concatenate(
        [norms_a.astype(jnp.float32), a_mask[None]], axis=0),
        ((0, 2), (0, 0)))
    aux_v8 = jnp.pad(jnp.concatenate(
        [norms_v.astype(jnp.float32), v_mask[None]], axis=0),
        ((0, 2), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(c,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(
            pl.BlockSpec((1, TOP_K, BLOCK_PAD),
                         lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TOP_K, BLOCK_PAD),
                         lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, SEG_A_AL), jnp.float32),    # seg_a raw
            pltpu.VMEM((8, SEG_V_AL), jnp.float32),    # seg_v raw
            pltpu.VMEM((8, SEG_A_AL), jnp.float32),    # norms_a + amask raw
            pltpu.VMEM((8, SEG_V_AL), jnp.float32),    # norms_v + vmask raw
            pltpu.VMEM((5, W_PAD, BLOCK_PAD), jnp.float32),  # audio windows
            pltpu.VMEM((5, W_PAD, FINE_W), jnp.float32),     # video windows
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    quals, offs = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((c, TOP_K, BLOCK_PAD), jnp.float32),
            jax.ShapeDtypeStruct((c, TOP_K, BLOCK_PAD), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(v_al, v_dl, a_al, a_dl, ms_a8, aux_a8, ms_v8, aux_v8)
    quals = jnp.moveaxis(quals, 1, 2)[:, :BLOCK]     # (C, 210, K)
    offs = jnp.moveaxis(offs, 1, 2)[:, :BLOCK]
    return quals, offs
