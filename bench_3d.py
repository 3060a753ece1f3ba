#!/usr/bin/env python
"""3D benchmarks (the BASELINE.md north-star 'LA volumes/sec'):
unet3d train-step throughput at the reference config (96,96,80) bs=1 and
sliding-window inference volumes/sec on a synthetic LA-sized volume
((240,160,96), patch (96,96,80), overlap (48,48,40)).

Prints one JSON line per metric.
"""

import json
import os
import time

import numpy as np

VOL_SHAPE = tuple(int(x) for x in os.environ.get(
    "BENCH3D_VOL", "240,160,96").split(","))
PATCH = (96, 96, 80)
OVERLAP = (48, 48, 40)


def torch_control_volumes_per_sec(n_ctrl_patches=3):
    """The reference's sliding-window inference control
    (/root/reference/test_3d.py:119-168: tio GridSampler + GridAggregator
    'average' around the torch unet3d) reenacted on this host's torch
    backend.  torchio is unavailable here, but the patch grid and the
    overlap-average aggregation are semantically identical to
    grid_locations (tio-parity tested, tests/test_3d_pipeline.py); the
    model forward dominates.  Per-patch forward time is measured on
    n_ctrl_patches and extrapolated to the full grid; the host
    aggregation cost is measured over the full grid with dummy logits."""
    try:
        import importlib.util
        import sys

        import torch

        from hebbax.engine.sliding import grid_locations

        def load(path, name):
            spec = importlib.util.spec_from_file_location(name, path)
            m = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(m)
            return m

        u = load("/root/reference/models/networks_3d/unet3d.py",
                 "ref_unet3d")
        device = "cuda" if torch.cuda.is_available() else "cpu"
        model = u.unet3d(1, 2).to(device).eval()
        locs = grid_locations(VOL_SHAPE, PATCH, OVERLAP)
        rng = np.random.RandomState(3)
        x = torch.from_numpy(
            rng.rand(1, 1, *PATCH).astype(np.float32)).to(device)
        with torch.no_grad():
            model(x)  # warmup
            times = []
            for _ in range(n_ctrl_patches):
                t0 = time.perf_counter()
                out = model(x)
                if device == "cuda":
                    torch.cuda.synchronize()
                times.append(time.perf_counter() - t0)
            t_patch = sum(times) / len(times)
            spread = (max(times) - min(times)) / t_patch
            print(f"# torch 3d control: {len(times)} patches, "
                  f"mean {t_patch:.1f}s, spread {spread:.1%}", flush=True)
        # aggregator.add_batch + get_output_tensor: host scatter-average
        logits = np.asarray(out.cpu())[0].transpose(1, 2, 3, 0)
        acc = np.zeros(VOL_SHAPE + (2,), np.float32)
        hits = np.zeros(VOL_SHAPE, np.float32)
        t0 = time.perf_counter()
        for lx, ly, lz in locs:
            acc[lx:lx + PATCH[0], ly:ly + PATCH[1],
                lz:lz + PATCH[2]] += logits
            hits[lx:lx + PATCH[0], ly:ly + PATCH[1],
                 lz:lz + PATCH[2]] += 1.0
        acc /= np.maximum(hits, 1.0)[..., None]
        t_agg = time.perf_counter() - t0
        return 1.0 / (t_patch * len(locs) + t_agg)
    except Exception as e:  # torch missing / OOM: report unmeasured
        print(f"# torch 3d control failed: {e}", flush=True)
        return None


def torch_control_train_steps_per_sec(iters=1):
    """The reference's 3D supervised train step (train_sup_3d.py:191-239:
    unet3d(1,2), dice loss, SGD lr 0.1 momentum 0.9, bs=1) on this host's
    torch backend — the denominator for the train-throughput metric."""
    try:
        import importlib.util
        import sys

        import torch

        def load(path, name):
            spec = importlib.util.spec_from_file_location(name, path)
            m = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(m)
            return m

        ref = "/root/reference"
        u = load(os.path.join(ref, "models/networks_3d/unet3d.py"),
                 "ref_unet3d")
        sys.path.insert(0, ref)
        from loss.loss_function import segmentation_loss as ref_loss

        device = "cuda" if torch.cuda.is_available() else "cpu"
        model = u.unet3d(1, 2).to(device).train()
        criterion = ref_loss("dice", False)
        opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9)
        rng = np.random.RandomState(4)
        x = torch.from_numpy(
            rng.rand(1, 1, *PATCH).astype(np.float32)).to(device)
        y = torch.from_numpy(rng.randint(
            0, 2, (1, 1) + PATCH).astype(np.int64)).to(device)

        def one_step():
            opt.zero_grad()
            loss = criterion(model(x), y)
            loss.backward()
            opt.step()

        one_step()  # warmup
        if device == "cuda":
            torch.cuda.synchronize()
        t0 = time.perf_counter()
        for _ in range(iters):
            one_step()
        if device == "cuda":
            torch.cuda.synchronize()
        return iters / (time.perf_counter() - t0)
    except Exception as e:  # torch missing / OOM: report unmeasured
        print(f"# torch 3d train control failed: {e}", flush=True)
        return None


def _build(net, dtype_name, hebb=None):
    import jax
    import jax.numpy as jnp

    from hebbax.models import get_network

    dtype = (jnp.bfloat16 if dtype_name in ("bfloat16", "bf16")
             else None)
    model = get_network(net, 1, 2, dtype=dtype, hebb=hebb)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    img = jnp.asarray(np.random.RandomState(0).rand(1, *PATCH, 1),
                      jnp.float32)
    from hebbax.utils.timing import jitted_init
    variables = jitted_init(model, rngs, img, train=False)
    return model, img, variables


def run_train_metric(ctrl=None, net=None, dtype_name=None, ctrl_tag="",
                     pretrain=False):
    """unet3d supervised train-step throughput (train_sup_3d.py:191-239
    protocol).  ctrl: torch-cpu steps/s (None -> unmeasured).
    pretrain=True (or BENCH3D_MODE=pretrain standalone) instead times
    the 3D Hebbian swta_t pretrain step (pretrain_hebbian_unsup_3d.py
    defaults: alpha=1, exclude=conv head, adam, head-only backprop)."""
    import jax
    import jax.numpy as jnp
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.ops.losses import segmentation_loss
    from hebbax.utils.timing import measure_step

    # default: the space-to-depth folded fast path (exact param/output
    # parity with unet3d, checkpoints interchangeable — tests/
    # test_unet3d_s2d.py); measured 75.7 ms vs 104 ms bf16
    net = net or os.environ.get("BENCH3D_TRAIN_NET",
                                os.environ.get("BENCH3D_NET",
                                               "unet3d_s2d"))
    dtype_name = dtype_name or os.environ.get("BENCH3D_DTYPE", "bfloat16")
    spec = (HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                     exclude=("conv",)) if pretrain else None)
    model, img, variables = _build(net, dtype_name, hebb=spec)
    msk = jnp.asarray(np.random.RandomState(1).randint(
        0, 2, (1,) + PATCH), jnp.int32)
    tx = (optax.adam(1e-3) if pretrain
          else optax.sgd(0.1, momentum=0.9))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)
    kw = {}
    if pretrain:
        kw = dict(hebb_alpha=1.0,
                  trainable_mask=pretrain_trainable_mask(
                      variables["params"], spec.exclude),
                  backprop_only=spec.exclude)
    step = make_sup_train_step(model, net, criterion, tx, **kw)
    batch = {"image": img, "mask": msk}
    key = jax.random.PRNGKey(2)
    dt = measure_step(step, state, batch, key, n1=10, n2=30)
    unit = (f"patches/s (bs=1, 96x96x80, {net} {dtype_name}"
            + (", swta_t pretrain)" if pretrain else ")"))
    if ctrl:
        unit += f"; torch-cpu control {ctrl:.3f} steps/s{ctrl_tag}"
    print(json.dumps(
        {"metric": "atrial3d_unet3d_train_patches_per_sec",
         "value": round(1 / dt, 2),
         "unit": unit,
         "vs_baseline": round((1 / dt) / ctrl, 2) if ctrl else None}),
        flush=True)
    return 1 / dt


def run_infer_metric(ctrl=None, net=None, dtype_name=None, ctrl_tag=""):
    """Sliding-window inference volumes/s — the BASELINE.md north-star
    (test_3d.py:119-168 protocol).  ctrl: torch-cpu volumes/s."""
    import jax

    from hebbax.engine.sliding import (grid_locations,
                                       slide_window_inference_device)
    from hebbax.models import primary_logits

    net = net or os.environ.get("BENCH3D_NET", "unet3d")
    dtype_name = dtype_name or os.environ.get("BENCH3D_DTYPE", "bfloat16")
    model, img, variables = _build(net, dtype_name)
    bs = int(os.environ.get("BENCH3D_INFER_BS", "8"))
    inf_vars = {"params": variables["params"]}
    if variables.get("batch_stats") is not None:
        inf_vars["batch_stats"] = variables["batch_stats"]

    def forward(patches, vs):
        return primary_logits(
            net, model.apply(vs, patches, train=False))

    vol = np.random.RandomState(2).rand(*VOL_SHAPE).astype(np.float32)
    n_patches = len(grid_locations(VOL_SHAPE, PATCH, OVERLAP))
    # warm up the compile (device-resident slider: one dispatch/volume);
    # finalize='binary' thresholds ON DEVICE and fetches uint8 (8x less
    # tunnel traffic than f32 logits — the production test_3d.py path)
    kw = dict(batch_size=bs, fwd_args=(inf_vars,), finalize="binary",
              threshold=0.5)
    slide_window_inference_device(forward, vol, PATCH, OVERLAP, 2, **kw)
    reps = 6
    t0 = time.perf_counter()
    pending = None
    for _ in range(reps):  # overlap fetch i with dispatch i+1
        dev, crop = slide_window_inference_device(
            forward, vol, PATCH, OVERLAP, 2, fetch=False, **kw)
        if pending is not None:
            pending[1](pending[0])
        pending = (dev, crop)
    pending[1](pending[0])
    dt = (time.perf_counter() - t0) / reps
    vs = round((1 / dt) / ctrl, 2) if ctrl else None
    unit = (f"volumes/s ({VOL_SHAPE}, {n_patches} patches, bs={bs}, "
            f"{net} {dtype_name}, uint8 on-device threshold)")
    if ctrl:
        unit += f"; torch-cpu control {ctrl:.4f} vol/s{ctrl_tag}"
    print(json.dumps({"metric": "atrial3d_sliding_window_volumes_per_sec",
                      "value": round(1 / dt, 3),
                      "unit": unit,
                      "vs_baseline": vs}), flush=True)
    return 1 / dt


def main():
    """Standalone entry: controls measured inline (bench.py threads them
    instead).  Env: BENCH3D_SKIP_{TRAIN,INFER,CONTROL},
    BENCH3D_TRAIN_CONTROL=<steps/s>, BENCH3D_NET, BENCH3D_DTYPE."""
    if not os.environ.get("BENCH3D_SKIP_TRAIN"):
        env_ctrl = os.environ.get("BENCH3D_TRAIN_CONTROL")
        ctrl = (float(env_ctrl) if env_ctrl else
                None if os.environ.get("BENCH3D_SKIP_CONTROL")
                else torch_control_train_steps_per_sec())
        run_train_metric(
            ctrl, pretrain=os.environ.get("BENCH3D_MODE") == "pretrain")
    if not os.environ.get("BENCH3D_SKIP_INFER"):
        control = (None if os.environ.get("BENCH3D_SKIP_CONTROL")
                   else torch_control_volumes_per_sec())
        run_infer_metric(control)


if __name__ == "__main__":
    main()
