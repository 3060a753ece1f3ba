#!/usr/bin/env python
"""Decompose the device-resident slider's per-volume time (honest
in-dispatch scan timing): full core vs identity-forward core (gather +
scatter + formatting only) vs bare patch forwards vs patch forwards
with eval-BN folded into the convs.  Decides where the next slider
optimization should go (VERDICT r4 #3).

Env: SLIDER_NET, BENCH3D_DTYPE, REPS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hebbax.engine.sliding import grid_locations
from hebbax.models import get_network, primary_logits
from hebbax.utils.timing import jitted_init

VOL_SHAPE = (240, 160, 96)
PATCH = (96, 96, 80)
OVERLAP = (48, 48, 40)
NET = os.environ.get("SLIDER_NET", "unet3d")
BS = int(os.environ.get("SLIDER_BS", "4"))
REPS = int(os.environ.get("REPS", "4"))
DTYPE = (jnp.bfloat16 if os.environ.get("BENCH3D_DTYPE", "bf16")
         in ("bf16", "bfloat16") else None)


def timed(fn, *args, label=""):
    """fn jitted over args; scan-timed with a data-dependent nudge."""
    np.asarray(fn(*args))  # compile

    def t(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        return time.perf_counter() - t0

    t1, t2 = t(1), t(1 + REPS)
    per = (t2 - t1) / REPS
    print(f"  {label:44s} {per*1e3:9.2f} ms", flush=True)
    return per


def slider_core(forward, n_cls=2):
    """Inline copy of make_device_slider's core (engine/sliding.py) so
    variants (identity forward) can be timed on equal footing."""
    locs = grid_locations(VOL_SHAPE, PATCH, OVERLAP)
    n = len(locs)
    pad = (-n) % BS
    loc_arr = np.array(locs + [(0, 0, 0)] * pad, np.int32)
    valid = np.concatenate([np.ones(n, np.float32),
                            np.zeros(pad, np.float32)])
    loc_b = jnp.asarray(loc_arr.reshape(-1, BS, 3))
    valid_b = jnp.asarray(valid.reshape(-1, BS))
    hits = np.zeros(VOL_SHAPE, np.float32)
    for x, y, z in locs:
        hits[x:x + PATCH[0], y:y + PATCH[1], z:z + PATCH[2]] += 1.0
    inv_h = jnp.asarray((1.0 / np.maximum(hits, 1.0)).astype(np.float32))

    @jax.jit
    def run(vol, *fwd_args):
        def gather(loc):
            return lax.dynamic_slice(vol, loc, PATCH)

        def body(acc, inp):
            locs_bi, vb = inp
            patches = jax.vmap(gather)(locs_bi)
            out = forward(patches[..., None], *fwd_args)
            out = out * vb[:, None, None, None, None]

            def scatter_one(a, j):
                loc = locs_bi[j]
                idx = jnp.concatenate([loc, jnp.zeros((1,), jnp.int32)])
                cur = lax.dynamic_slice(a, idx, PATCH + (n_cls,))
                return lax.dynamic_update_slice(a, cur + out[j], idx), None

            acc, _ = lax.scan(scatter_one, acc, jnp.arange(BS))
            return acc, None

        acc = jnp.zeros(VOL_SHAPE + (n_cls,), jnp.float32)
        acc, _ = lax.scan(body, acc, (loc_b, valid_b))
        agg = acc * inv_h[..., None]
        probs = jax.nn.softmax(agg, axis=-1)[..., 1]
        return (probs > 0.5).astype(jnp.uint8)

    return run


def main():
    print(f"net={NET} dtype={'bf16' if DTYPE else 'f32'} bs={BS}")
    model = get_network(NET, 1, 2, dtype=DTYPE)
    img = jnp.asarray(np.random.RandomState(0).rand(1, *PATCH, 1),
                      jnp.float32)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)},
                            img, train=False)
    inf_vars = {"params": variables["params"]}
    if variables.get("batch_stats") is not None:
        inf_vars["batch_stats"] = variables["batch_stats"]

    def forward(patches, vs):
        return primary_logits(NET, model.apply(vs, patches, train=False))

    vol = jnp.asarray(np.random.RandomState(2).rand(*VOL_SHAPE),
                      jnp.float32)
    n = len(grid_locations(VOL_SHAPE, PATCH, OVERLAP))
    print(f"{n} patches / volume")

    # 1. full slider core
    timed(slider_core(forward), vol, inf_vars, label="full slider core")

    # 2. identity forward (gather + scatter + formatting only)
    def ident(patches, vs):
        return jnp.repeat(patches, 2, axis=-1).astype(
            DTYPE or jnp.float32)

    timed(slider_core(ident), vol, inf_vars,
          label="identity-forward core (gather+scatter)")

    # 3. bare patch forwards (6 batches in one dispatch, no agg)
    locs = grid_locations(VOL_SHAPE, PATCH, OVERLAP)
    pad = (-len(locs)) % BS
    loc_b = jnp.asarray(np.array(locs + [(0, 0, 0)] * pad,
                                 np.int32).reshape(-1, BS, 3))

    @jax.jit
    def fwd_only(vol_, loc_b_, vs):
        def gather(loc):
            return lax.dynamic_slice(vol_, loc, PATCH)

        def body(s, locs_bi):
            patches = jax.vmap(gather)(locs_bi)
            out = forward(patches[..., None], vs)
            return s + jnp.sum(out.astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0), loc_b_)
        return s

    timed(fwd_only, vol, loc_b, inf_vars,
          label="patch forwards only (no aggregation)")


if __name__ == "__main__":
    main()


def bn_folded_variables(variables):
    """Experiment: fold each norm{i} eval affine into the preceding
    conv{i} kernel/bias (per Block3D structure), leaving BN params at
    identity so an identity-patched BatchNorm apply matches."""
    import copy
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray,
                                   variables.get("batch_stats") or {})

    def walk(p, s):
        for k in list(p.keys()):
            v = p[k]
            if isinstance(v, dict):
                walk(v, s.get(k, {}) if isinstance(s, dict) else {})
        for k in list(p.keys()):
            if k.startswith("norm") and isinstance(p[k], dict):
                conv = "conv" + k[4:]
                if conv not in p:
                    continue
                g, b = p[k]["scale"], p[k]["bias"]
                m, var = s[k]["mean"], s[k]["var"]
                scale = g / np.sqrt(var + 1e-5)
                p[conv]["kernel"] = (p[conv]["kernel"]
                                     * scale).astype(
                                         p[conv]["kernel"].dtype)
                cb = p[conv].get("bias")
                cb = cb if cb is not None else 0.0
                p[conv]["bias"] = ((cb - m) * scale + b).astype(
                    np.float32)

    walk(params, stats)
    return {"params": jax.tree_util.tree_map(jnp.asarray, params),
            "batch_stats": variables.get("batch_stats")}


def run_folded_experiment():
    from flax import linen as nn
    model = get_network(NET, 1, 2, dtype=DTYPE)
    img = jnp.asarray(np.random.RandomState(0).rand(1, *PATCH, 1),
                      jnp.float32)
    variables = jitted_init(model, {"params": jax.random.PRNGKey(0)},
                            img, train=False)
    inf_vars = {"params": variables["params"],
                "batch_stats": variables["batch_stats"]}
    folded = bn_folded_variables(variables)

    orig_call = nn.BatchNorm.__call__
    nn.BatchNorm.__call__ = lambda self, x, **kw: x
    try:
        def fwd_folded(patches, vs):
            return primary_logits(NET, model.apply(vs, patches,
                                                   train=False))

        vol = jnp.asarray(np.random.RandomState(2).rand(*VOL_SHAPE),
                          jnp.float32)
        timed(slider_core(fwd_folded), vol, folded,
              label="full core, BN folded into convs")
        # sanity: folded output == original (identity-BN vs real-BN)
        p = jnp.asarray(np.random.RandomState(1).rand(1, *PATCH, 1),
                        jnp.float32)
        yf = model.apply(folded, p, train=False)
    finally:
        nn.BatchNorm.__call__ = orig_call
    y0 = model.apply(inf_vars, p, train=False)
    d = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                              - yf.astype(jnp.float32))))
    print(f"  folded-vs-original max |d logits|: {d:.4e}")


if __name__ == "__main__" and os.environ.get("SLIDER_BNFOLD"):
    run_folded_experiment()
