"""End-to-end combine() on WAV files (ffmpeg-free path) + CLI surface."""
import os

import numpy as np
import pytest

from describealign_tpu.media.decode import parse_audio_from_file, write_wav
from tests.synth import build_pair


@pytest.fixture(scope="module")
def wav_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("media")
    video, audio, segments = build_pair(content_seconds=40.0, narration=(),
                                        lead_in=6.0, seed=3, channels=2)
    video_wav = tmp / "episode_1.wav"
    audio_wav = tmp / "described_1.wav"
    write_wav(video_wav, video)
    write_wav(audio_wav, audio)
    return str(video_wav), str(audio_wav), segments


def test_combine_stretch_wav_end_to_end(wav_pair, tmp_path):
    import describealign_tpu as da
    video_wav, audio_wav, segments = wav_pair
    out_dir = str(tmp_path / "out")
    plot_dir = str(tmp_path / "plots")
    da.combine([video_wav], [audio_wav], stretch_audio=True, yes=True,
               output_dir=out_dir, alignment_dir=plot_dir)
    out_file = os.path.join(out_dir, "ad_episode_1.wav")
    assert os.path.exists(out_file)
    out_pcm = parse_audio_from_file(out_file, 2)
    video_pcm = parse_audio_from_file(video_wav, 2)
    assert out_pcm.shape == video_pcm.shape
    # the 6s lead-in region of the video should now carry replaced audio
    # that correlates with the (shifted) description, i.e. differs from the
    # original video track
    assert not np.allclose(out_pcm[:, :44100], video_pcm[:, :44100])
    # report artifacts
    assert os.path.exists(os.path.join(plot_dir, "episode_1.png"))
    report = open(os.path.join(plot_dir, "episode_1.txt")).read()
    assert "Input file similarity" in report
    assert "Start Offset:" in report
    assert "Median Rate Change:" in report


def test_combine_resume_skips_existing(wav_pair, tmp_path, capsys):
    import describealign_tpu as da
    video_wav, audio_wav, _ = wav_pair
    out_dir = str(tmp_path / "out2")
    os.makedirs(out_dir)
    out_file = os.path.join(out_dir, "ad_episode_1.wav")
    with open(out_file, 'wb') as f:
        f.write(b'\0' * 200000)  # > 1e5 bytes: treated as done
    da.combine([video_wav], [audio_wav], stretch_audio=True, yes=True,
               output_dir=out_dir, alignment_dir=str(tmp_path / "p2"))
    assert "output file already exists, skipping..." in capsys.readouterr().out
    assert os.path.getsize(out_file) == 200000  # untouched


def test_combine_requires_stretch_for_audio_pairs(wav_pair, tmp_path):
    import describealign_tpu as da
    video_wav, audio_wav, _ = wav_pair
    with pytest.raises(RuntimeError, match="ffmpeg|stretch_audio"):
        da.combine([video_wav], [audio_wav], stretch_audio=False, yes=True,
                   output_dir=str(tmp_path / "o"),
                   alignment_dir=str(tmp_path / "p"))


def test_cli_version(capsys):
    from describealign_tpu.cli import command_line_interface
    command_line_interface(['--version'])
    out = capsys.readouterr().out
    assert "version:" in out
    assert "content hash:" in out


def test_alignment_cache_reused(wav_pair, tmp_path, capsys, monkeypatch):
    """Second run with a fresh output dir must reuse the cached alignment."""
    import describealign_tpu as da
    video_wav, audio_wav, _ = wav_pair
    plot_dir = str(tmp_path / "plots")
    da.combine([video_wav], [audio_wav], stretch_audio=True, yes=True,
               output_dir=str(tmp_path / "o1"), alignment_dir=plot_dir)
    capsys.readouterr()
    import describealign_tpu.alignment.api as api_mod

    def boom(*a, **k):
        raise AssertionError("align() should not run on a cache hit")

    monkeypatch.setattr(api_mod, 'align', boom)
    da.combine([video_wav], [audio_wav], stretch_audio=True, yes=True,
               output_dir=str(tmp_path / "o2"), alignment_dir=plot_dir)
    assert os.path.exists(os.path.join(str(tmp_path / "o2"),
                                       "ad_episode_1.wav"))


def test_combine_no_pitch_correction(wav_pair, tmp_path):
    """BASELINE config 4: raw-resample stretch (--no_pitch_correction)."""
    import describealign_tpu as da
    video_wav, audio_wav, _ = wav_pair
    out_dir = str(tmp_path / "out_np")
    da.combine([video_wav], [audio_wav], stretch_audio=True, yes=True,
               no_pitch_correction=True, output_dir=out_dir,
               alignment_dir=str(tmp_path / "plots_np"))
    out_file = os.path.join(out_dir, "ad_episode_1.wav")
    assert os.path.exists(out_file)
    out_pcm = parse_audio_from_file(out_file, 2)
    assert np.sqrt(np.mean(out_pcm.astype(np.float64) ** 2)) > 100


def test_combine_directory_mode_two_pairs(tmp_path):
    """Directory inputs: natural-sort pairing, decode-ahead loop, two
    outputs (reference combine's batch behavior, describealign.py:1077)."""
    import describealign_tpu as da
    vids = tmp_path / "vids"
    auds = tmp_path / "auds"
    vids.mkdir()
    auds.mkdir()
    for idx, seed in ((1, 3), (2, 11)):
        video, audio, _ = build_pair(content_seconds=40.0, narration=(),
                                     lead_in=6.0, seed=seed, channels=2)
        write_wav(vids / f"show_ep{idx}.wav", video)
        write_wav(auds / f"show_ep{idx}_described.wav", audio)
    out_dir = str(tmp_path / "out")
    da.combine(str(vids), str(auds), stretch_audio=True, yes=True,
               output_dir=out_dir, alignment_dir=str(tmp_path / "plots"))
    assert os.path.exists(os.path.join(out_dir, "ad_show_ep1.wav"))
    assert os.path.exists(os.path.join(out_dir, "ad_show_ep2.wav"))
    assert os.path.exists(str(tmp_path / "plots" / "show_ep1.txt"))
    assert os.path.exists(str(tmp_path / "plots" / "show_ep2.txt"))
