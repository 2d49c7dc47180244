"""Host-side media/utility contract tests (no ffmpeg needed)."""
import numpy as np
import pytest

from describealign_tpu.media.mux import encode_fit_as_ffmpeg_expr
from describealign_tpu.utils.files import get_sorted_filenames
from describealign_tpu.utils.sorting import os_sorted


def test_setts_expression_format():
    """Exact reference formatting (describealign.py:419-435): one clip()
    term per segment, 4-decimal times, 9-decimal slope deltas."""
    audio_times = np.array([0.0, 10.0, 25.0])
    video_times = np.array([5.0, 15.0, 30.123456])
    expr = encode_fit_as_ffmpeg_expr(audio_times, video_times, video_offset=5.0)
    assert expr.startswith('TS+(0')
    assert expr.endswith(')')
    # segment 1: y0=5, offset 5 -> clip from 0.0000, height dy=10
    assert '+clip(TS-0.0000/TB,0,10.0000/TB)*' in expr
    # slope of segment 1: dx/dy = 10/10 = 1 -> slope-1 = 0.000000000
    assert '*0.000000000' in expr
    # segment 2: y1=15 -> starts at 10.0000, dy=15.123456 -> 15.1235
    assert '+clip(TS-10.0000/TB,0,15.1235/TB)*' in expr
    seg2_slope = (25.0 - 10.0) / (30.123456 - 15.0) - 1
    assert f'*{seg2_slope:.9f}' in expr


def test_setts_expression_negative_dy_clamped():
    expr = encode_fit_as_ffmpeg_expr(np.array([0., 1., 2.]),
                                     np.array([0., -1., 2.]), 0.0)
    assert ',0,0.0000/TB)' in expr  # max(0, dy) like the reference


def test_natural_sort_order():
    files = ['ep10.mp4', 'ep2.mp4', 'Ep1.mp4', 'ep2b.mp4']
    assert os_sorted(files) == ['Ep1.mp4', 'ep2.mp4', 'ep2b.mp4', 'ep10.mp4']


def test_get_sorted_filenames_pairs_and_alt_flags(tmp_path):
    for name in ['b2.mp4', 'b10.mp4', 'b1.mp3', 'notes.txt']:
        (tmp_path / name).write_bytes(b'x')
    files, alt = get_sorted_filenames(str(tmp_path), {'mp4'}, {'mp3'})
    names = [f.split('/')[-1] for f in files]
    assert names == ['b1.mp3', 'b2.mp4', 'b10.mp4']
    assert alt == [1, 0, 0]


def test_get_sorted_filenames_errors(tmp_path):
    with pytest.raises(RuntimeError, match="No file or directory"):
        get_sorted_filenames(str(tmp_path / "nope.mp4"), {'mp4'})
    (tmp_path / "a.txt").write_bytes(b'x')
    with pytest.raises(RuntimeError, match="valid extensions"):
        get_sorted_filenames(str(tmp_path), {'mp4'})
