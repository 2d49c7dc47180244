"""Window/taps helpers shared by the feature and alignment kernels."""
import numpy as np


def hann_window(n):
    """scipy.signal.windows.hann(n) without the scipy dependency inside jit.

    Symmetric hann, endpoints zero (matches scipy's default sym=True).
    """
    if n == 1:
        return np.ones(1)
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos(2 * np.pi * k / (n - 1))


def hann_taps(n_plus_2, dtype=np.float32):
    """The reference's canonical smoothing taps: hann(n+2) with the zero
    endpoints dropped, normalized to unit sum (describealign.py:551-552)."""
    w = hann_window(n_plus_2)[1:-1].astype(dtype)
    return w / np.sum(w)
