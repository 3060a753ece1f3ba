"""Determinism discipline.

The reference seeds torch/cuda/random/numpy and forces deterministic cuDNN
(/root/reference/utils.py:18-26).  In JAX all on-device randomness is
explicit through PRNG keys, so determinism reduces to: seed Python/numpy
RNGs for the host-side pipeline and derive one root jax key per run.
"""

import os
import random

import jax
import numpy as np


def init_seeds(seed):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(0)
    return jax.random.PRNGKey(seed)
