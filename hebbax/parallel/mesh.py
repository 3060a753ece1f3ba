"""Device mesh construction and sharding helpers.

The reference is single-GPU (torch.cuda.set_device,
/root/reference/train_sup_2d.py:66); hebbax is SPMD-first: one 'data' mesh
axis for batch parallelism (params replicated, batch sharded over ICI),
with room for a 'model' axis should channel sharding ever be needed.
XLA inserts the psum all-reduces during jit; there is no hand-written
collective layer (SURVEY.md section 2.6).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "data",
                     spatial_dim: int = 1) -> NamedSharding:
    """Shard a SPATIAL dimension across the mesh (sp parallelism).

    ``spatial_dim=1`` shards H for NHWC images / D for NDHWC volumes.
    XLA's SPMD partitioner inserts the halo exchanges every conv / pool /
    transpose-conv needs at the shard boundaries (collective-permutes over
    ICI), so an input too large for one chip's HBM runs with NO model
    changes — the whole-volume alternative to the patch slider when a
    multi-chip mesh is available.  The reference is single-GPU and has no
    counterpart (it tiles via the sliding window only,
    /root/reference/test_3d.py:119-168).  Equality vs the replicated
    forward is asserted in tests/test_data_parallel.py and the driver's
    multichip dryrun."""
    spec = [None] * spatial_dim + [axis]
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Device-put every array in a batch dict with the batch sharding."""
    return {k: (jax.device_put(v, sharding)
                if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0 else v)
            for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a train-state pytree across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def pad_batch_to(batch: dict, total: int, ignore_index: int = -1) -> dict:
    """Pad the batch dim to ``total``, keeping shapes static across the
    epoch so one compiled step serves every batch.

    Images (and sdf targets etc.) are padded by repeating the last sample
    — the closest-to-real statistics for BatchNorm.  Integer class masks
    (``mask`` keys) are padded with ``ignore_index`` so the padded samples
    contribute ZERO to every loss (CE masks per-pixel; dice/bcebound
    normalize by the effective valid count — ops/losses.py).  The
    remaining per-sample-mean losses are masked via the 0/1 ``weight``
    vector the dp prep attaches (engine/loop.py), so a padded dp batch
    reproduces the unpadded batch's loss and gradients exactly.  (The only
    residual deviation is BatchNorm batch statistics, which see the
    repeated image — inherent to static shapes.)"""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0:
            n = v.shape[0]
            if n < total:
                if (k.startswith("mask")
                        and np.issubdtype(v.dtype, np.integer)):
                    pad = np.full((total - n,) + v.shape[1:], ignore_index,
                                  v.dtype)
                else:
                    pad = np.repeat(v[-1:], total - n, axis=0)
                v = np.concatenate([v, pad], axis=0)
            out[k] = v
        else:
            out[k] = v
    return out
