"""Import-surface stub for natsort (not in this image): natural-order sort.
Only ``natsorted`` is imported by the reference's classifier.py (and only
used in its ctor, which the trajectory oracle bypasses); implemented
faithfully anyway — numeric runs compare as integers."""
import re


def _key(s):
    return [int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", str(s))]


def natsorted(seq, key=None):
    if key is None:
        return sorted(seq, key=_key)
    return sorted(seq, key=lambda x: _key(key(x)))
