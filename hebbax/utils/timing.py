"""Fetch-forced slope timing for TPU step benchmarks.

Through the axon TPU tunnel, ``jax.block_until_ready`` acknowledges
dispatch without waiting for device execution, so the classic
"loop N times then block" benchmark measures dispatch rate — chained
8192^3 matmuls "complete" in 0.037 ms (30 PFLOP/s, physically
impossible).  A device->host *fetch* of a value data-dependent on the
last step is the only reliable barrier.

A single fetch costs a tunnel round-trip (~25 ms), so per-step time is
recovered as the SLOPE between two fetch-terminated runs of different
lengths:

    t_step = (T(n2) - T(n1)) / (n2 - n1)

which cancels the fixed fetch/dispatch overhead.  All bench/profile
entry points in this repo use :func:`measure_step`.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(out):
    """Force completion: pull one scalar data-dependent on ``out``."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(leaf))


def measure_step(step, state, *args, n1=10, n2=30, fetch=_fetch,
                 warmup=3):
    """Seconds per call of ``state, out = step(state, *args)``.

    The step must thread ``state`` (donated or not) so calls chain and
    cannot be elided.  ``fetch(out)`` must synchronously pull data
    derived from the last call (default: sum of the first output leaf).
    """
    s = state
    for _ in range(warmup):
        s, out = step(s, *args)
    fetch(out)

    t0 = time.perf_counter()
    for _ in range(n1):
        s, out = step(s, *args)
    fetch(out)
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n2):
        s, out = step(s, *args)
    fetch(out)
    t2 = time.perf_counter() - t0

    return max((t2 - t1) / (n2 - n1), 1e-9)


def jitted_init(model, rngs, *args, **kwargs):
    """``model.init`` under ``jax.jit``.

    Through the axon tunnel every EAGER op pays a fresh remote compile
    (~20-120 s each); a cold model variant's eager ``init`` walks
    dozens of them (>25 min observed for unet3d_s2d).  One jitted
    program compiles once.  kwargs must be hashable statics
    (e.g. ``train=False``)."""
    import functools

    import jax

    return jax.jit(functools.partial(model.init, **kwargs))(rngs, *args)
