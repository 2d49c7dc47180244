"""static_ffmpeg binary management: crumb parsing + pre-v6 eviction."""
import sys
import types

import pytest

from describealign_tpu.media import ffmpeg as ff


@pytest.fixture()
def fake_static_ffmpeg(tmp_path, monkeypatch):
    pkg = types.ModuleType("static_ffmpeg")
    run = types.ModuleType("static_ffmpeg.run")
    run.get_platform_dir = lambda: str(tmp_path)
    pkg.run = run
    monkeypatch.setitem(sys.modules, "static_ffmpeg", pkg)
    monkeypatch.setitem(sys.modules, "static_ffmpeg.run", run)
    return tmp_path


def _crumb(tmp_path, version):
    (tmp_path / "installed.crumb").write_text(
        f"installed from https://github.com/zackees/ffmpeg_bins/raw/main/"
        f"v{version}/manylinux_2_17_x86_64.zip on 2024-01-01 01:09:01\n")


def test_no_crumb_means_not_installed(fake_static_ffmpeg):
    assert ff.evict_stale_static_binaries() is False


def test_v6_crumb_is_kept(fake_static_ffmpeg):
    _crumb(fake_static_ffmpeg, "6.0")
    assert ff.evict_stale_static_binaries() is True
    assert (fake_static_ffmpeg / "installed.crumb").exists()


def test_old_crumb_is_evicted(fake_static_ffmpeg, capsys):
    _crumb(fake_static_ffmpeg, "5.0")
    assert ff.evict_stale_static_binaries() is False
    assert not (fake_static_ffmpeg / "installed.crumb").exists()
    assert "Old ffmpeg version detected" in capsys.readouterr().out


def test_malformed_crumb_is_not_trusted(fake_static_ffmpeg):
    (fake_static_ffmpeg / "installed.crumb").write_text("garbage\n")
    assert ff.evict_stale_static_binaries() is False
