"""ffmpeg / ffprobe binary discovery and subprocess runners.

The reference reaches ffmpeg through the ffmpeg-python + static_ffmpeg
packages (describealign.py:124-157, 437-543). Neither is guaranteed here, so
this module locates binaries itself (PATH, env override, static_ffmpeg if
importable) and runs commands through subprocess directly with the same
error-surfacing contract: on failure print "  ERROR: ffmpeg failed to <msg>"
followed by ffmpeg's stderr, then raise.
"""
import os
import shutil
import subprocess

_FFMPEG_PATH = None
_FFPROBE_PATH = None


class FFmpegNotFoundError(RuntimeError):
    pass


def _discover(name, env_var):
    path = os.environ.get(env_var)
    if path and os.path.isfile(path):
        return path
    path = shutil.which(name)
    if path:
        return path
    try:  # optional: the reference's static_ffmpeg distribution mechanism
        import static_ffmpeg.run as sfr
        ffmpeg_bin, ffprobe_bin = \
            sfr._get_or_fetch_platform_executables_else_raise_no_lock()
        return ffmpeg_bin if name == 'ffmpeg' else ffprobe_bin
    except Exception:
        pass
    return None


def get_ffmpeg():
    global _FFMPEG_PATH
    if _FFMPEG_PATH is None:
        _FFMPEG_PATH = _discover('ffmpeg', 'DESCRIBEALIGN_FFMPEG')
    if _FFMPEG_PATH is None:
        raise FFmpegNotFoundError(
            "ffmpeg binary not found. Install ffmpeg or set "
            "DESCRIBEALIGN_FFMPEG to its path.")
    return _FFMPEG_PATH


def get_ffprobe():
    global _FFPROBE_PATH
    if _FFPROBE_PATH is None:
        _FFPROBE_PATH = _discover('ffprobe', 'DESCRIBEALIGN_FFPROBE')
    if _FFPROBE_PATH is None:
        raise FFmpegNotFoundError(
            "ffprobe binary not found. Install ffmpeg or set "
            "DESCRIBEALIGN_FFPROBE to its path.")
    return _FFPROBE_PATH


def is_ffmpeg_installed():
    try:
        get_ffmpeg()
        get_ffprobe()
        return True
    except FFmpegNotFoundError:
        return False


def run_ffmpeg_command(args, err_msg, stdin_bytes=None):
    """Run [ffmpeg, *args]; return (stdout, stderr) bytes. Raises on failure."""
    cmd = [get_ffmpeg()] + list(args)
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE if stdin_bytes is not None else None,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    out, err = proc.communicate(stdin_bytes)
    if proc.returncode != 0:
        print("  ERROR: ffmpeg failed to " + err_msg)
        print("FFmpeg error:")
        print(err.decode('utf-8', errors='replace'))
        raise ChildProcessError('FFmpeg error.')
    return out, err


def run_ffprobe_json(args, err_msg):
    import json
    cmd = [get_ffprobe(), '-v', 'error', '-print_format', 'json'] + list(args)
    proc = subprocess.run(cmd, capture_output=True)
    if proc.returncode != 0:
        print("  ERROR: ffprobe failed to " + err_msg)
        print(proc.stderr.decode('utf-8', errors='replace'))
        raise ChildProcessError('FFprobe error.')
    return json.loads(proc.stdout.decode('utf-8', errors='replace') or '{}')


def compile_command_line(args):
    """Render an ffmpeg arg list as a loggable command line (report contract:
    reference describealign.py:511-517 logs the exact command, '/'-slashed)."""
    cmd = [get_ffmpeg()] + list(args)
    return subprocess.list2cmdline(cmd).replace('\\', '/')
