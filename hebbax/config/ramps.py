"""Consistency-weight ramp functions.

Same contract as the reference ramps library
(/root/reference/config/ramps/ramps.py:4-26).  Pure float functions so they
can be used both host-side (per-epoch weights) and inside jitted steps
(as static or traced scalars).
"""

import numpy as np


def sigmoid_rampup(current, rampup_length):
    """Exponential sigmoid ramp: exp(-5 (1 - t)^2), t clipped to [0, 1]."""
    if rampup_length == 0:
        return 1.0
    current = np.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current, rampup_length):
    assert current >= 0 and rampup_length >= 0
    if current >= rampup_length:
        return 1.0
    return current / rampup_length


def cosine_rampdown(current, rampdown_length):
    assert 0 <= current <= rampdown_length
    return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))
