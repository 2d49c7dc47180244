"""ctypes bridge for the native pass-2 refinement DP (native/dp.cpp)."""
import ctypes

import numpy as np

from .native import native_lib


def refine_dp_native_available():
    lib = native_lib()
    return lib is not None and hasattr(lib, 'refine_dp')


def refine_dp_flat(pj, pc, pq, offsets, num_clusters, num_video):
    """Run the pass-2 DP on flat per-frame point arrays.

    pj (video pos f64), pc (cluster i64), pq (qual f64) sorted by
    (frame, video, cluster, qual); offsets (num_audio+1,) frame index
    boundaries. Returns the (M, 5) path like refine_dp_py.
    """
    if not refine_dp_native_available():
        points = points_lists_from_flat(pj, pc, pq, offsets)
        from .refine import refine_dp_py
        return refine_dp_py(points, num_clusters, num_video)
    lib = native_lib()
    pj = np.ascontiguousarray(pj, np.float64)
    pc = np.ascontiguousarray(pc, np.int64)
    pq = np.ascontiguousarray(pq, np.float64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    total = len(pj)
    out_path = np.empty((total + 1, 5), np.float64)
    out_len = ctypes.c_longlong(0)
    rc = lib.refine_dp(
        pj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pc.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        pq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ctypes.c_longlong(len(offsets) - 1),
        ctypes.c_longlong(num_clusters),
        ctypes.c_longlong(num_video),
        out_path.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError("native refine_dp failed")
    return out_path[:out_len.value].copy()


def flat_from_points_lists(points):
    """Convert ragged per-frame point lists to the flat representation."""
    counts = np.array([len(p) for p in points], np.int64)
    total = int(counts.sum())
    pj = np.empty(total, np.float64)
    pc = np.empty(total, np.int64)
    pq = np.empty(total, np.float64)
    k = 0
    for plist in points:
        for j, c, q in plist:
            pj[k] = j
            pc[k] = c
            pq[k] = q
            k += 1
    offsets = np.zeros(len(points) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pj, pc, pq, offsets


def points_lists_from_flat(pj, pc, pq, offsets):
    return [[(pj[t], int(pc[t]), pq[t])
             for t in range(offsets[i], offsets[i + 1])]
            for i in range(len(offsets) - 1)]


def refine_dp_native(points, num_clusters, num_video):
    """List-based entry (test/back-compat); flattens then runs native."""
    pj, pc, pq, offsets = flat_from_points_lists(points)
    return refine_dp_flat(pj, pc, pq, offsets, num_clusters, num_video)
