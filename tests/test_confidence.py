"""Low-confidence guard: the coarse k-best margin and its WARNING plumbing.

The guard (matching._coarse_tracks -> api.warn_low_confidence) is our
equivalent of the reference's hash-bin gate starving into the path-length
raise (describealign.py:698-699): when the winning coarse track's
per-anchor-block score advantage over the best disjoint alternative is
below the campaign-calibrated floor, the map is likely a self-similarity
ridge and a WARNING line is emitted (calibration: scripts/diag_confidence.py;
adjudication: ROUND4.md narrowband draws 02/05).
"""
import numpy as np

import jax.numpy as jnp

from describealign_tpu.alignment import matching
from describealign_tpu.alignment.api import align_from_pcm, warn_low_confidence
from describealign_tpu.utils import aligncache

from .synth import build_pair


def _i16(pcm):
    return np.clip(pcm, -32768, 32767).astype(np.int16)


def test_margin_u8_codec_roundtrip():
    for m in [0.0, 0.001, 0.0399, 0.04, 0.1, 0.25, 0.5]:
        code = int(matching._margin_code_u8(jnp.float32(m)))
        assert 1 <= code <= 254
        got = matching.margin_from_code(code)
        # quantization grid is 1/500 - far finer than the floor comparison
        assert abs(got - m) <= (0.5 / 500.0) + 1e-9
    for m in [0.6, 3.0]:
        # codes saturate at 255 = inf: anything that far above the floor
        # only needs to stay on the quiet side of the guard
        assert matching.margin_from_code(
            int(matching._margin_code_u8(jnp.float32(m)))) == float('inf')
    assert matching.margin_from_code(
        int(matching._margin_code_u8(jnp.float32(np.inf)))) == float('inf')
    # code 0 = absent (legacy transport); decodes to None, never emitted
    assert matching.margin_from_code(0) is None


def test_margin_i16_codec_roundtrip():
    for m in [0.0, 0.037, 0.5, 12.0, float('inf')]:
        words = matching._margin_words_i16(jnp.float32(m), rows=3)
        assert words.shape == (3, 2)
        got = matching.margin_from_i16(np.asarray(words)[0, 0])
        if np.isinf(m):
            assert np.isinf(got)
        else:
            # f16 transport: ~3 decimal digits
            assert abs(got - m) <= max(1e-3, m * 1e-3)
        # every row carries the same word (rows may be consumed from any
        # chunk boundary)
        assert len(set(np.asarray(words)[:, 0].tolist())) == 1


def test_warn_low_confidence_line_protocol(capsys):
    warn_low_confidence(matching.COARSE_MARGIN_FLOOR / 2)
    out = capsys.readouterr().out
    assert out.startswith("  WARNING: low alignment confidence")
    # the GUI transcript classifier keys on the two-space WARNING prefix
    from describealign_tpu.gui import core
    assert core.classify_line(out.rstrip("\n")) == "warning"

    for quiet in (matching.COARSE_MARGIN_FLOOR * 2, float('inf'), None):
        warn_low_confidence(quiet)
        assert capsys.readouterr().out == ""


def test_aligned_pair_margin_clears_floor():
    """Clean aligned media must not trip the guard (no false positives on
    the regimes every other test exercises)."""
    video, audio, _ = build_pair(content_seconds=40.0,
                                 narration=((8.0, 3.0),),
                                 lead_in=2.0, seed=77)
    out = align_from_pcm(_i16(video), _i16(audio))
    assert len(out) == 6
    margin = out[5]
    assert margin is not None and np.isfinite(margin)
    assert margin > matching.COARSE_MARGIN_FLOOR, (
        f"clean-pair margin {margin:.4f} at/below floor "
        f"{matching.COARSE_MARGIN_FLOOR}")


def test_aligncache_margin_roundtrip(tmp_path):
    v, a = str(tmp_path / "v.mp4"), str(tmp_path / "a.mp3")
    for p in (v, a):
        with open(p, 'wb') as f:
            f.write(b"x" * 64)
    base = (np.array([0.0, 10.0]), np.array([2.0, 12.0]), 55.5,
            np.array([[0.0, 2.0], [10.0, 12.0]]), 1.0)
    d = str(tmp_path)
    aligncache.save(d, v, a, base + (0.0625,))
    got = aligncache.load(d, v, a)
    assert got is not None and len(got) == 6
    assert abs(got[5] - 0.0625) < 1e-12
    # legacy 5-tuple saves (pre-guard caches) load with margin None and
    # must stay warning-silent rather than firing spuriously
    aligncache.save(d, v, a, base)
    got = aligncache.load(d, v, a)
    assert got is not None and len(got) == 6
    assert got[5] is None
