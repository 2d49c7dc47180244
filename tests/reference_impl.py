"""Golden-model oracle: numpy re-implementation of the reference DSP.

Re-expresses the math of julbean/describealign's feature extractor
(describealign.py:545-593) in plain numpy so the JAX kernels can be tested
against it. Written independently from the reference source (same math,
different code); reference lines are cited per function.
"""
import numpy as np
import scipy.signal


def hann_taps(n_plus_2):
    """Reference windows are scipy hann(n+2) with the zero endpoints dropped,
    then normalized to sum 1 (e.g. describealign.py:551-552)."""
    w = scipy.signal.windows.hann(n_plus_2)[1:-1].astype(np.float32)
    return w / np.sum(w)


def oracle_energy(pcm_f16):
    """Log-energy at 210 fps (reference describealign.py:545-555).

    pcm_f16: (channels, samples) float16 PCM.
    Square-sum over 105-sample blocks (f32 accumulation), 13-tap hann smooth,
    log10(1+x)/2, decimate by 2.
    """
    c, s = pcm_f16.shape
    n = s - s % 105
    blocks = pcm_f16[:, :n].reshape(c, -1, 105).astype(np.float32)
    energy = np.einsum('ijk,ijk->j', blocks, blocks) / (105 * c)
    smooth = np.convolve(energy, hann_taps(15), mode='same')
    return (np.log10(1 + smooth) / 2.)[::2]


def oracle_zero_crossings(pcm_f16):
    """Zero-crossing counts per 210-sample block at 210 fps, hann-smoothed
    (reference describealign.py:557-566). Mono counts are doubled."""
    sign = np.signbit(pcm_f16)
    xings = np.diff(sign, prepend=False, axis=-1)
    n = xings.shape[1] - xings.shape[1] % 210
    per_block = np.abs(xings[:, :n]).reshape(xings.shape[0], -1, 210)
    counts = np.sum(per_block, axis=(0, 2)).astype(np.float32)
    if pcm_f16.shape[0] == 1:
        counts *= 2
    return np.convolve(counts, hann_taps(15), mode='same')


def oracle_downsample_blur(arr, downsample, blur):
    """Polyphase hann lowpass + decimate (reference describealign.py:568-573)."""
    taps = hann_taps(downsample * blur + 2)
    arr = arr[:len(arr) - (len(arr) % downsample)]
    out = None
    for i in range(downsample):
        part = np.convolve(arr[i::downsample], taps[i::downsample], mode='same')
        out = part if out is None else out + part
    return out


def oracle_freq_bands(pcm_f16):
    """Three cascaded frequency-band log energies at 210 fps
    (reference describealign.py:575-593). Stages decimate by 5, 7, 6."""
    if pcm_f16.shape[0] > 1:
        arr = np.mean(pcm_f16, axis=0)
    else:
        arr = pcm_f16[0]
    arr = arr[:len(arr) - (len(arr) % 210)]
    downsamples = [5, 7, 6]
    decimation = 1
    bands = []
    for ds in downsamples:
        if ds == downsamples[-1]:
            bottom = np.array(0).reshape(1)
        else:
            bottom = oracle_downsample_blur(arr, ds, 3)
        decimation *= ds
        arr2d = arr.reshape(-1, ds)
        band_energy = None
        for i in range(ds):
            term = (arr2d[:, i] - bottom) ** 2
            band_energy = term if band_energy is None else band_energy + term
        band = oracle_downsample_blur(band_energy, 210 // decimation, 15) / 210
        bands.append(np.log10(1 + band) / 2.)
        arr = bottom
    return bands


def oracle_mean_sub(feature, samples_per_node=21):
    """Local-mean subtraction with a 41-tap hann (reference 596-606)."""
    w = scipy.signal.windows.hann(2 * samples_per_node + 1)[1:-1]
    w = w / np.sum(w)
    mean = np.convolve(w, feature, mode='same')[:len(feature)]
    return feature - mean


def oracle_uniform_norm(feature_ms, samples_per_node=21):
    """Windowed L2 norms, clipped at .001 (reference 600-602, 607-608)."""
    w = np.ones(2 * samples_per_node - 1)
    return np.clip(np.convolve(w, feature_ms ** 2, mode='valid') ** .5,
                   .001, None)
