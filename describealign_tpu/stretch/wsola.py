"""WSOLA-style pitch-preserving splicer (reference-parity mode).

The reference's pitch-corrected stretch (describealign.py:296-387) does not
resample: it repeats or skips ~512-sample spans of the original waveform at
maximally self-similar positions (chosen by a DP over Pearson
autocorrelations) and splices with Hann crossfades, preserving pitch and
timbre exactly. Our default stretcher is the phase vocoder
(phase_vocoder.py, the TPU-idiomatic redesign); this module provides the
reference's algorithm for users who want its exact splicing character
(DESCRIBEALIGN_STRETCH=wsola).

Host implementation: the windowed autocorrelations are vectorized numpy
(the cumulative-sum trick of describealign.py:272-291, computed in bounded
chunks), and the window-by-window DP runs as a Python loop over numpy rows
like the reference's.
"""
import numpy as np

from ..constants import MIN_STRETCH_OFFSET
from ..ops.windows import hann_window

WINDOW_SIZE = 512
MAX_DRIFT = 512 * 3


def _pearson_corrs(signal, negative, jumps, window_size=WINDOW_SIZE,
                   chunk_windows=50):
    """Yield per-window (window_size, len(jumps)) Pearson correlation rows.

    Streaming equivalent of the reference's recursive generator
    (describealign.py:251-294): correlation of each window with the window
    `jump` samples before (negative=True) or after it, via cumulative sums
    of lagged products; memory bounded by `chunk_windows`.
    """
    n = signal.shape[1]
    num_windows = n // window_size
    jumps = np.asarray(list(jumps))
    start_w = 0
    while start_w < num_windows:
        end_w = min(start_w + chunk_windows, num_windows)
        # samples needed: the windows plus max(jump) lookback/ahead + window
        lo = max(0, start_w * window_size - int(jumps.max()) - window_size)
        hi = min(n, end_w * window_size + int(jumps.max()) + window_size)
        seg = signal[:, lo:hi].astype(np.float32)
        m = seg.shape[1]
        self_corr = np.sum(seg * seg, axis=0)
        cs = np.cumsum(self_corr, dtype=np.float64)
        cs[window_size:] -= cs[:-window_size].copy()
        window_rms = cs[window_size - 1:]
        epsilon = 1e-4 * max(1, np.max(window_rms))
        window_rms = np.sqrt(window_rms + epsilon)
        corrs = np.full((len(jumps), m - window_size + 1), -np.inf)
        for ji, jump in enumerate(jumps):
            ac = np.sum(seg[:, jump:] * seg[:, :m - jump], axis=0)
            acs = np.cumsum(ac, dtype=np.float64)
            acs[window_size:] -= acs[:-window_size].copy()
            vals = acs[window_size - 1:] + epsilon
            if negative:
                corrs[ji, jump:] = vals / window_rms[:len(window_rms) - jump]
            else:
                corrs[ji, :corrs.shape[1] - jump] = vals / window_rms[jump:]
        corrs = (corrs / window_rms[None, :]).T
        for w in range(start_w, end_w):
            s = w * window_size - lo
            yield corrs[s:s + window_size]
        start_w = end_w


def wsola_stretch(input_seg, output, window_size=WINDOW_SIZE,
                  max_drift=MAX_DRIFT):
    """Fill `output` (C, n_out) with a pitch-preserving stretch of
    `input_seg` (C, n_in) by repeating/skipping self-similar spans.

    Reference semantics (describealign.py:296-387): a DP over windows and
    accumulated drift chooses where to jump; jumps are spliced with Hann
    crossfades. Output longer than input -> backward jumps (repeats);
    shorter -> forward jumps (skips).
    """
    n_in = input_seg.shape[1]
    n_out = output.shape[1]
    total_offset = n_out - n_in
    drift_width = max_drift * 2 + 1
    jumps = [506, 451, 284, 410, 480, 379, 308, 430, 265, 494]
    # widen the jump menu near Frobenius-coin-problem regimes (ref 301-308)
    if abs(total_offset) < 10000:
        if abs(total_offset) > 1000:
            jumps.extend(MIN_STRETCH_OFFSET + off
                         for off in (2 ** np.arange(8)) - 1)
        else:
            jumps = list(range(MIN_STRETCH_OFFSET, window_size))
    num_windows = n_in // window_size

    def offset_at(w):
        return (total_offset * min(num_windows - 1, max(0, w))) \
            // (num_windows - 1)

    def offset_diff(w):
        return abs(offset_at(w) - offset_at(w - 1))

    backptr = np.zeros((num_windows, drift_width), np.int16)
    best_jump_locations = np.zeros((num_windows, len(jumps)), np.int16)
    cum_loss = np.full((3, drift_width), np.inf)
    cum_loss[1:, max_drift] = 0
    last_diff = 0
    gen = _pearson_corrs(input_seg, total_offset > 0, jumps)
    for w in range(num_windows):
        corrs = next(gen)
        best_jump_locations[w] = np.argmax(corrs, axis=0)
        best_losses = 1 - corrs[best_jump_locations[w],
                                np.arange(corrs.shape[1])]
        diff = offset_diff(w)
        diff2 = diff + last_diff
        losses = np.full((len(jumps) + 1, drift_width), np.inf)
        # option 0: no jump; shift loss from the corresponding drift
        losses[0, :drift_width - diff] = cum_loss[(w - 1) % 3, diff:]
        for ji, jump in enumerate(jumps):
            trunc = diff2 - jump
            dst = slice(jump, drift_width - max(0, trunc))
            src = slice(diff2, drift_width + min(0, trunc))
            # jump from two windows back (skipping one avoids overlapping
            # crossfades, ref 340-343)
            losses[ji + 1, dst] = cum_loss[(w - 2) % 3, src] + best_losses[ji]
        best = np.argmin(losses, axis=0)
        backptr[w] = best
        cum_loss[w % 3] = losses[best, np.arange(drift_width)]
        last_diff = diff

    # traceback: recover jump positions
    drift = max_drift
    chosen = []
    skip = False
    for w in range(num_windows - 1, -1, -1):
        drift += offset_diff(w + 1)
        if skip:
            skip = False
            continue
        ji = backptr[w, drift] - 1
        if ji == -1:
            continue
        jump = jumps[ji]
        pos = w * window_size + int(best_jump_locations[w, ji])
        drift -= jump
        skip = True
        chosen.append((pos, jump))
    chosen.reverse()
    chosen = np.array(chosen, np.int64).reshape(-1, 2)
    if total_offset > 0:
        chosen[:, 1] *= -1

    # splice the copied spans with Hann crossfades (ref 374-387)
    starts_in = np.concatenate(([0], chosen[:, 0] + chosen[:, 1]))
    ends_in = np.concatenate((chosen[:, 0], [n_in]))
    lengths = ends_in - starts_in
    ends_out = np.cumsum(lengths)
    starts_out = np.concatenate(([0], ends_out[:-1]))
    bump = hann_window(2 * window_size + 1)
    head = bump[:window_size]
    tail = bump[window_size:-1]
    output[:, :window_size] = input_seg[:, :window_size]
    for si, ei, so, eo in zip(starts_in, ends_in, starts_out, ends_out):
        output[:, so:so + window_size] *= tail
        output[:, so:so + window_size] += input_seg[:, si:si + window_size] * head
        output[:, so + window_size:eo + window_size] = \
            input_seg[:, si + window_size:ei + window_size]
