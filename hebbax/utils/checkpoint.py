"""Snapshot save/load.

Keeps the reference checkpoint contract (/root/reference/utils.py:29-55):
payload = {model variables, selected threshold, and for Hebbian runs the
hebb_params + excluded layer names}; filenames ``best_JI.ckpt`` /
``last.ckpt`` under ``checkpoints/``.  The phase hand-off (pretraining ->
fine-tuning) flows through these files exactly as in the reference.

Serialization: flax msgpack for the variable pytree (portable, no pickle of
code objects) + a JSON header, packed into one file.
"""

import json
import os
import struct

import jax
import numpy as np
from flax import serialization

MAGIC = b"HBAXCKP1"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_snapshot(variables, path, threshold=None, save_best=False,
                  hebb_params=None, layers_excluded=None, extra=None):
    """Write ``best_JI.ckpt`` (save_best) or ``last.ckpt`` into ``path``."""
    os.makedirs(path, exist_ok=True)
    name = "best_JI.ckpt" if save_best else "last.ckpt"
    meta = {
        "threshold": None if threshold is None else float(threshold),
        "hebb_params": hebb_params,
        "excluded_layers": layers_excluded,
    }
    if extra:
        meta.update(extra)
    blob = serialization.msgpack_serialize(_to_numpy(variables))
    header = json.dumps(meta, default=str).encode()
    out = os.path.join(path, name)
    with open(out, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)
    return out


def load_snapshot(path):
    """Return (variables, meta) from a snapshot file."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not a hebbax checkpoint")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode())
        variables = serialization.msgpack_restore(f.read())
    return variables, meta


def save_train_state(state, path, epoch, best_val=None):
    """Full mid-run resume checkpoint (params + batch stats + optimizer
    state + epoch) — an extension over the reference, whose snapshots
    carry no optimizer/epoch state (SURVEY.md section 5: 'mid-run resume
    does not exist')."""
    payload = serialization.to_state_dict(state)
    blob = serialization.msgpack_serialize(_to_numpy(payload))
    meta = {"epoch": int(epoch),
            "best_val": list(best_val) if best_val else None}
    header = json.dumps(meta).encode()
    out = os.path.join(path, "resume.ckpt")
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, out)
    return out


def load_train_state(state_template, path):
    """Restore a resume checkpoint into a state pytree of the same
    structure.  Returns (state, meta)."""
    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path} is not a hebbax checkpoint")
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode())
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload)
    return state, meta
