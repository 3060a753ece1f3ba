#!/usr/bin/env python
"""jax.profiler trace of the device-resident sliding-window program
(engine/sliding.py) — the BASELINE.md north-star is ~1.55 vol/s
REGARDLESS of model (unet3d vs unet3d_s2d) or patch batch size
(4/8/24), so the bound is NOT the patch forward; this prints where the
per-volume device time actually goes.

Env: SLIDER_NET (unet3d), SLIDER_BS (4), BENCH3D_DTYPE.
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from hebbax.engine.sliding import (grid_locations,
                                   slide_window_inference_device)
from hebbax.models import get_network, primary_logits
from hebbax.utils.timing import jitted_init

VOL_SHAPE = (240, 160, 96)
PATCH = (96, 96, 80)
OVERLAP = (48, 48, 40)
NET = os.environ.get("SLIDER_NET", "unet3d")
BS = int(os.environ.get("SLIDER_BS", "4"))
OUT = os.environ.get("TRACE_DIR", "/tmp/hebbax_trace_slider")


def main():
    import jax.numpy as jnp
    dtype = (jnp.bfloat16
             if os.environ.get("BENCH3D_DTYPE", "bf16") in ("bf16",
                                                            "bfloat16")
             else None)
    model = get_network(NET, 1, 2, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0)}
    img = jnp.asarray(np.random.RandomState(0).rand(1, *PATCH, 1),
                      jnp.float32)
    variables = jitted_init(model, rngs, img, train=False)
    inf_vars = {"params": variables["params"]}
    if variables.get("batch_stats") is not None:
        inf_vars["batch_stats"] = variables["batch_stats"]

    def forward(patches, vs):
        return primary_logits(NET, model.apply(vs, patches,
                                               train=False))

    vol = np.random.RandomState(2).rand(*VOL_SHAPE).astype(np.float32)
    n = len(grid_locations(VOL_SHAPE, PATCH, OVERLAP))
    kw = dict(batch_size=BS, fwd_args=(inf_vars,), finalize="binary",
              threshold=0.5)
    t0 = time.perf_counter()
    slide_window_inference_device(forward, vol, PATCH, OVERLAP, 2, **kw)
    print(f"# warm (compile) {time.perf_counter()-t0:.1f}s; "
          f"{n} patches bs={BS}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = slide_window_inference_device(forward, vol, PATCH,
                                            OVERLAP, 2, **kw)
    print(f"# per volume (incl fetch): "
          f"{(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)
    with jax.profiler.trace(OUT):
        for _ in range(2):
            out = slide_window_inference_device(forward, vol, PATCH,
                                                OVERLAP, 2, **kw)
        np.asarray(out).sum()

    tr_file = sorted(glob.glob(OUT + "/**/*.trace.json.gz",
                               recursive=True))[-1]
    with gzip.open(tr_file) as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and e.get("args")
          and e["args"].get("hlo_category")]
    bycat = collections.Counter()
    bysrc = collections.Counter()
    byop = collections.Counter()
    for e in ev:
        d = e.get("dur", 0)
        bycat[e["args"]["hlo_category"]] += d
        bysrc[e["args"].get("source", "?")] += d
        byop[e["args"].get("tf_op", e["name"])[:80]] += d
    tot = sum(bycat.values())
    print(f"-- device total {tot/1e3:.1f} ms (2 volumes)")
    for name, d in bycat.most_common(12):
        print(f"  {d/1e3:8.1f}  {name}")
    print("-- by source (top 12)")
    for name, d in bysrc.most_common(12):
        print(f"  {d/1e3:8.1f}  {name}")
    print("-- by tf_op (top 15)")
    for name, d in byop.most_common(15):
        print(f"  {d/1e3:8.1f}  {name}")


if __name__ == "__main__":
    main()
