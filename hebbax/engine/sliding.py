"""Sliding-window 3D inference — the throughput-critical eval path.

Parity target: tio GridSampler(patch_size, patch_overlap) +
GridAggregator(overlap_mode='average') (/root/reference/test_3d.py:
119-168).  TPU-native: the static patch grid is computed per volume
shape; patches run through one jitted forward in fixed-size batches
(last batch padded, masked out at aggregation); overlap-average =
scatter-add of logits + hit counts, then divide.
"""

import math
from typing import Callable, Sequence, Tuple

import numpy as np


def grid_locations(vol_shape: Sequence[int], patch_size: Sequence[int],
                   overlap: Sequence[int]):
    """tio GridSampler location grid: stride = patch - overlap, last
    location clipped so the final patch abuts the border."""
    locs_per_dim = []
    for size, patch, ov in zip(vol_shape, patch_size, overlap):
        stride = patch - ov
        if size <= patch:
            locs = [0]
        else:
            n = math.ceil((size - patch) / stride) + 1
            locs = [min(i * stride, size - patch) for i in range(n)]
            locs = sorted(set(locs))
        locs_per_dim.append(locs)
    grid = []
    for x in locs_per_dim[0]:
        for y in locs_per_dim[1]:
            for z in locs_per_dim[2]:
                grid.append((x, y, z))
    return grid


def make_device_slider(forward: Callable, vol_shape: Tuple[int, int, int],
                       patch_size: Tuple[int, int, int],
                       overlap: Tuple[int, int, int], n_cls: int,
                       batch_size: int = 8, mesh=None,
                       finalize: str = None):
    """Fully device-resident sliding window: the whole patch loop runs
    inside ONE jitted function (lax.scan over patch batches, dynamic-slice
    gather, read-modify-write scatter-add), so a volume costs a single
    dispatch + a single result fetch.  The static hit-count map is folded
    in as a constant.

    Returns run(vol: (X,Y,Z) f32, *fwd_args) -> (X,Y,Z,C)
    overlap-averaged logits; vol must already be padded to at least
    patch_size per dim.  ``forward(patches, *fwd_args)`` — thread model
    variables through fwd_args rather than closing over them (closure
    constants inline multi-hundred-MB params into the program, which
    breaks remote-compile size limits).

    mesh: optional jax.sharding.Mesh — shard each patch batch over the
    mesh's first axis (model replicated, patches data-parallel) while the
    scatter-add aggregation stays device-resident in the SAME jitted
    program; batch_size must be a multiple of the mesh size.  This is the
    sharded sliding-window evaluator (SURVEY.md section 5) replacing the
    reference's NCCL DDP tester.

    finalize: None -> (X,Y,Z,C) f32 overlap-averaged logits;
    'binary'     -> run(vol, threshold, *fwd_args) -> (X,Y,Z) uint8
                    (softmax class-1 prob > threshold), computed on device
                    so the host fetch is 1 byte/voxel instead of C*4;
    'argmax'     -> (X,Y,Z) uint8 argmax.  (save_test_3d semantics,
    /root/reference/utils.py:570-607.)
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    locs = grid_locations(vol_shape, patch_size, overlap)
    n = len(locs)
    pad = (-n) % batch_size
    loc_arr = np.array(locs + [(0, 0, 0)] * pad, np.int32)
    valid = np.concatenate([np.ones(n, np.float32),
                            np.zeros(pad, np.float32)])
    loc_batches = loc_arr.reshape(-1, batch_size, 3)
    valid_batches = valid.reshape(-1, batch_size)

    hits = np.zeros(vol_shape, np.float32)
    for x, y, z in locs:
        hits[x:x + patch_size[0], y:y + patch_size[1],
             z:z + patch_size[2]] += 1.0
    inv_hits = (1.0 / np.maximum(hits, 1.0)).astype(np.float32)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        if batch_size % mesh.devices.size:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{mesh.devices.size}")
        patch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        rep = NamedSharding(mesh, P())
    else:
        patch_sharding = rep = None

    # grid arrays are passed as ARGUMENTS, not closure constants —
    # embedded multi-MB constants blow remote-compile request limits
    @jax.jit
    def run_impl(vol, loc_b, valid_b, inv_h, thr, *fwd_args):
        vol = vol.astype(jnp.float32)

        def gather(loc):
            return lax.dynamic_slice(vol, loc, patch_size)

        def body(acc, inp):
            locs_b, vb = inp
            patches = jax.vmap(gather)(locs_b)
            if patch_sharding is not None:
                # batch-shard the model forward across the mesh; the
                # scatter below runs on the (replicated) gathered result
                patches = lax.with_sharding_constraint(
                    patches, patch_sharding)
            out = forward(patches[..., None], *fwd_args)
            if rep is not None:
                out = lax.with_sharding_constraint(out, rep)
            out = out * vb[:, None, None, None, None]

            def scatter_one(a, j):
                loc = locs_b[j]
                idx = jnp.concatenate([loc, jnp.zeros((1,), jnp.int32)])
                cur = lax.dynamic_slice(a, idx, patch_size + (n_cls,))
                return lax.dynamic_update_slice(a, cur + out[j], idx), None

            acc, _ = lax.scan(scatter_one, acc,
                              jnp.arange(locs_b.shape[0]))
            return acc, None

        acc = jnp.zeros(vol_shape + (n_cls,), jnp.float32)
        if rep is not None:
            acc = lax.with_sharding_constraint(acc, rep)
        acc, _ = lax.scan(body, acc, (loc_b, valid_b))
        agg = acc * inv_h[..., None]
        if finalize == "binary":
            probs = jax.nn.softmax(agg, axis=-1)[..., 1]
            return (probs > thr).astype(jnp.uint8)
        if finalize == "argmax":
            return jnp.argmax(agg, axis=-1).astype(jnp.uint8)
        return agg

    loc_b_dev = jnp.asarray(loc_batches)
    valid_b_dev = jnp.asarray(valid_batches)
    inv_h_dev = jnp.asarray(inv_hits)
    if rep is not None:
        import jax as _jax
        loc_b_dev = _jax.device_put(loc_b_dev, rep)
        valid_b_dev = _jax.device_put(valid_b_dev, rep)
        inv_h_dev = _jax.device_put(inv_h_dev, rep)

    def run(vol, *fwd_args):
        thr = jnp.float32(0.0)
        if finalize == "binary":
            thr, fwd_args = jnp.float32(fwd_args[0]), fwd_args[1:]
        if rep is not None:
            import jax as _jax
            vol = _jax.device_put(jnp.asarray(vol, jnp.float32), rep)
        return run_impl(vol, loc_b_dev, valid_b_dev, inv_h_dev, thr,
                        *fwd_args)

    return run


_SLIDER_CACHE = {}


def slide_window_inference_device(forward: Callable, volume: np.ndarray,
                                  patch_size, overlap, n_cls: int,
                                  batch_size: int = 8,
                                  fwd_args=(), mesh=None,
                                  finalize: str = None,
                                  threshold: float = None,
                                  fetch: bool = True) -> np.ndarray:
    """Device-resident variant of slide_window_inference (same result).
    Compiled sliders are cached per (forward, volume shape, grid config)
    so repeated volumes of one shape compile once.  Pass model variables
    via fwd_args (forward(patches, *fwd_args)) — see make_device_slider.

    mesh/finalize: see make_device_slider.  fetch=False returns the
    on-device array plus a crop closure — callers can overlap volume i's
    host fetch with volume i+1's dispatch (jax dispatch is async)."""
    if finalize == "binary" and threshold is None:
        raise ValueError(
            "finalize='binary' requires an explicit threshold (the "
            "stored per-run value from training, or 0.5)")
    vol = np.asarray(volume, np.float32)
    pad = [max(0, p - s) for s, p in zip(vol.shape, patch_size)]
    if any(pad):
        vol = np.pad(vol, [(0, p) for p in pad])
    key = (id(forward), vol.shape, tuple(patch_size), tuple(overlap),
           n_cls, batch_size, id(mesh), finalize)
    entry = _SLIDER_CACHE.get(key)
    if entry is None:
        run = make_device_slider(forward, vol.shape, tuple(patch_size),
                                 tuple(overlap), n_cls, batch_size,
                                 mesh=mesh, finalize=finalize)
        # pin the keyed objects: id(forward)/id(mesh) stay valid only
        # while the objects are alive, so the cache holds strong refs —
        # a GC'd forward can never alias a live entry's key
        entry = (run, forward, mesh)
        _SLIDER_CACHE[key] = entry
    run = entry[0]
    if finalize == "binary":
        fwd_args = (threshold,) + tuple(fwd_args)
    dev = run(vol, *fwd_args)
    shape = volume.shape

    def crop(arr):
        arr = np.asarray(arr)
        if any(pad):
            arr = arr[: shape[0], : shape[1], : shape[2]]
        return arr

    if not fetch:
        return dev, crop
    return crop(dev)


def slide_window_inference(forward: Callable, volume: np.ndarray,
                           patch_size: Tuple[int, int, int],
                           overlap: Tuple[int, int, int],
                           n_cls: int, batch_size: int = 8) -> np.ndarray:
    """Aggregate per-patch logits over a volume.

    forward(patches (B, *patch, 1) float32) -> logits (B, *patch, C),
    typically a jitted model apply.  Returns (X, Y, Z, C) float32
    overlap-averaged logits.
    """
    vol = np.asarray(volume, np.float32)
    pad = [max(0, p - s) for s, p in zip(vol.shape, patch_size)]
    if any(pad):
        vol = np.pad(vol, [(0, p) for p in pad])
    locs = grid_locations(vol.shape, patch_size, overlap)
    logits_sum = np.zeros(vol.shape + (n_cls,), np.float32)
    hits = np.zeros(vol.shape, np.float32)

    for start in range(0, len(locs), batch_size):
        chunk = locs[start:start + batch_size]
        patches = np.stack([
            vol[x:x + patch_size[0], y:y + patch_size[1],
                z:z + patch_size[2]] for x, y, z in chunk])
        n_valid = len(chunk)
        if n_valid < batch_size:  # pad to keep the jit shape static
            patches = np.concatenate(
                [patches, np.repeat(patches[-1:],
                                    batch_size - n_valid, axis=0)])
        out = np.asarray(forward(patches[..., None]))
        for j, (x, y, z) in enumerate(chunk):
            logits_sum[x:x + patch_size[0], y:y + patch_size[1],
                       z:z + patch_size[2]] += out[j]
            hits[x:x + patch_size[0], y:y + patch_size[1],
                 z:z + patch_size[2]] += 1.0
    agg = logits_sum / np.maximum(hits, 1.0)[..., None]
    if any(pad):
        agg = agg[: volume.shape[0], : volume.shape[1], : volume.shape[2]]
    return agg
