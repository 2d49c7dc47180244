"""ctypes bridge for the native pass-2 refinement DP (native/dp.cpp)."""
import ctypes

import numpy as np

from .native import native_lib


def refine_dp_native_available():
    lib = native_lib()
    return lib is not None and hasattr(lib, 'refine_dp')


def refine_dp_native(points, num_clusters, num_video):
    """Flatten ragged per-frame point lists and run the C++ DP.

    Same contract as refine.refine_dp_py.
    """
    lib = native_lib()
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

    out_path = np.empty((total + 1, 5), np.float64)
    out_len = ctypes.c_longlong(0)
    rc = lib.refine_dp(
        pj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pc.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        pq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ctypes.c_longlong(len(points)),
        ctypes.c_longlong(num_clusters),
        ctypes.c_longlong(num_video),
        out_path.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError("native refine_dp failed")
    return out_path[:out_len.value].copy()
