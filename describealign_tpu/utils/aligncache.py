"""Alignment result cache: makes mux-only reruns free.

The reference's only resume mechanism is output-file existence
(describealign.py:1087-1089). We additionally cache the alignment solution
(fit nodes, similarity, path, median slope) keyed by the input files'
identity (path, size, mtime) and the algorithm version hash, so re-running
with different mux settings (or after a failed mux) skips the entire
alignment compute.
"""
import hashlib
import os

import numpy as np

from .hashing import get_version_hash


def _pair_key(video_file, audio_file):
    h = hashlib.sha1()
    for f in (video_file, audio_file):
        st = os.stat(f)
        h.update(f"{os.path.abspath(f)}|{st.st_size}|{st.st_mtime_ns}".encode())
    h.update(get_version_hash().encode())
    return h.hexdigest()[:16]


def cache_path(alignment_dir, video_file):
    stem = os.path.splitext(os.path.split(video_file)[1])[0]
    return os.path.join(alignment_dir, f"{stem}.aligncache.npz")


def load(alignment_dir, video_file, audio_file):
    """Return the cached align() outputs or None."""
    path = cache_path(alignment_dir, video_file)
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path, allow_pickle=False)
        if str(data['key']) != _pair_key(video_file, audio_file):
            return None
        return (data['audio_times'], data['video_times'],
                float(data['similarity']), data['path'],
                float(data['median_slope']))
    except Exception:
        return None


def save(alignment_dir, video_file, audio_file, outputs):
    audio_times, video_times, similarity, path, median_slope = outputs
    try:
        np.savez_compressed(
            cache_path(alignment_dir, video_file),
            key=_pair_key(video_file, audio_file),
            audio_times=audio_times, video_times=video_times,
            similarity=similarity, path=path, median_slope=median_slope)
    except Exception:
        pass  # cache is best-effort
