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


def slide_window_inference(forward: Callable, volume: np.ndarray,
                           patch_size: Tuple[int, int, int],
                           overlap: Tuple[int, int, int],
                           n_cls: int, batch_size: int = 4) -> np.ndarray:
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
