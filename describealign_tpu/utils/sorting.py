"""Natural ("OS-style") sorting without third-party deps.

The reference relies on natsort.os_sorted (describealign.py:119) to define
video<->audio pairing order. natsort isn't available in this environment, so
we implement an equivalent: case-insensitive natural sort splitting digit runs
into integers, which matches natsort's default os_sorted behavior for typical
episode-style filenames (e.g. "ep2" < "ep10").
"""
import os
import re

_SPLIT_DIGITS = re.compile(r'(\d+)')


def natural_key(s: str):
    base = os.path.normcase(s)
    parts = _SPLIT_DIGITS.split(base)
    key = []
    for i, part in enumerate(parts):
        if i % 2:  # digit run
            key.append((1, int(part), ''))
        elif part:
            key.append((0, 0, part))
    return key


def os_sorted(items):
    """Sort paths the way a file manager would (natural sort per component)."""
    def path_key(p):
        p = str(p)
        head, tail = os.path.split(p)
        return (natural_key(head), natural_key(tail))
    return sorted(items, key=path_key)
