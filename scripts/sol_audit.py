#!/usr/bin/env python
"""Speed-of-light audit of the production train steps.

For each flagship step: XLA's compiled flop + bytes-accessed counts vs
the measured (slope-timed) step time, against the same-session measured
roofline (chained bf16 matmul for MXU peak, 256 MB triad for HBM).

Interpretation:
- flop floor = flops / measured-MXU-peak — a true lower bound.
- 'bytes accessed' is LOGICAL traffic (every operand read/write, incl.
  what fusion actually serves from VMEM/registers), so bytes/HBM-peak is
  NOT a floor: a step beating it proves fusion keeps that fraction of
  bytes on-chip.  Effective-logical-bandwidth >= HBM peak ==> the step
  is bandwidth-bound and further wins must come from reading less, not
  from scheduling.

Run with the TPU otherwise idle (slope timing is contention-sensitive,
CLAUDE.md).  SOL_SKIP_3D=1 skips the two 3D configs;
SOL_ROOFLINE_ONLY=1 prints just the roofline header.
"""

import os
import sys
import time

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("SOL_ITERS", "20"))
SKIP_3D = bool(os.environ.get("SOL_SKIP_3D"))
ROOFLINE_ONLY = bool(os.environ.get("SOL_ROOFLINE_ONLY"))


def slope_time(step1, y0, *args, n1=10, n2=30):
    def run(n):
        y = y0
        t0 = time.perf_counter()
        for _ in range(n):
            y = step1(y, *args)
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(y)[0]))
        return time.perf_counter() - t0

    run(3)
    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def measure_roofline():
    # Sub-ms ops need LONG chains: the fetch RTT is ~25-30 ms and noisy,
    # so n2-n1 must put >=100 calls between the two run lengths
    # (CLAUDE.md) or the slope collapses into the noise.
    n = 4096
    a = jnp.eye(n, dtype=jnp.bfloat16) * (1.0 + 1e-6)
    y0 = jnp.ones((n, n), jnp.bfloat16)
    dt = slope_time(jax.jit(lambda y_, a_: y_ @ a_), y0, a,
                    n1=60, n2=180)
    peak_tf = 2 * n**3 / dt / 1e12
    m = 64 * 1024 * 1024
    x = jnp.ones((m,), jnp.float32)
    y0 = jnp.zeros((m,), jnp.float32)
    dt = slope_time(
        jax.jit(lambda y_, x_: y_ * jnp.float32(1.0000001) + x_), y0, x,
        n1=40, n2=160)
    peak_gbs = 3 * 4 * m / dt / 1e9
    print(f"roofline (this session): matmul bf16 {peak_tf:.0f} TFLOP/s, "
          f"HBM triad {peak_gbs:.0f} GB/s", flush=True)
    assert 10 < peak_tf < 1000 and 100 < peak_gbs < 3000, (
        "roofline measurement landed outside any plausible range — "
        "tunnel too noisy, increase chain lengths")
    return peak_tf * 1e12, peak_gbs * 1e9


def build_step(net, dtype_name, hebb_mode, batch, size, nd):
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss
    from hebbax.utils.timing import jitted_init

    spec = (HebbSpec(mode=hebb_mode, k=50.0, w_nrm=True, alpha=1.0,
                     exclude=("out_conv",)) if hebb_mode else None)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    in_ch = 3 if nd == 2 else 1
    model = get_network(net, in_ch, 2, hebb=spec, dtype=dtype)
    rs = np.random.RandomState(0)
    shape = ((batch, size, size, in_ch) if nd == 2
             else (batch,) + size + (in_ch,))
    mshape = shape[:-1]
    images = jnp.asarray(rs.rand(*shape), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, mshape), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = jitted_init(model, rngs, images, train=False)
    tx = optax.adam(1e-3) if spec else optax.sgd(0.5, momentum=0.9)
    kw = {}
    if spec is not None:
        kw = dict(hebb_alpha=1.0,
                  trainable_mask=pretrain_trainable_mask(
                      variables["params"], spec.exclude),
                  backprop_only=spec.exclude)
    criterion = segmentation_loss("dice", False, num_classes=2)
    step = make_sup_train_step(model, net, criterion, tx, **kw)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    return step, state, {"image": images, "mask": masks}


def audit(tag, peak_flops, peak_bytes, **cfg):
    from hebbax.utils.timing import measure_step

    step, state, batch = build_step(**cfg)
    key = jax.random.PRNGKey(2)
    compiled = step.lower(state, batch, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl = float(ca.get("flops", float("nan")))
    by = float(ca.get("bytes accessed", float("nan")))
    dt = measure_step(compiled, state, batch, key,
                      n1=ITERS, n2=3 * ITERS)
    t_fl = fl / peak_flops
    eff_gbs = by / dt / 1e9
    onchip = max(0.0, 1.0 - peak_bytes * dt / by)
    print(f"{tag}: measured {dt*1e3:.2f} ms | {fl/1e9:.0f}G flops = "
          f"{fl/dt/1e12:.1f} TF/s ({fl/dt/peak_flops*100:.0f}% MXU, "
          f"flop floor {t_fl*1e3:.2f} ms) | {by/1e9:.1f}GB logical = "
          f"{eff_gbs:.0f} GB/s effective "
          f"({'>=' + format(onchip*100, '.0f') + '% of bytes on-chip'
              if onchip > 0 else 'below HBM peak'})", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    pf, pb = measure_roofline()
    if ROOFLINE_ONLY:
        return
    audit("sup2d unet_s2d bf16 bs32 128^2", pf, pb, net="unet_s2d",
          dtype_name="bf16", hebb_mode=None, batch=32, size=128, nd=2)
    audit("sup2d unet f32 bs32 128^2 (parity cfg)", pf, pb, net="unet",
          dtype_name="f32", hebb_mode=None, batch=32, size=128, nd=2)
    audit("pre2d unet swta_t f32 bs32 128^2", pf, pb, net="unet",
          dtype_name="f32", hebb_mode="swta_t", batch=32, size=128, nd=2)
    if not SKIP_3D:
        audit("sup3d vnet_s2d bf16 bs1 96x96x80", pf, pb, net="vnet_s2d",
              dtype_name="bf16", hebb_mode=None, batch=1,
              size=(96, 96, 80), nd=3)
        audit("sup3d unet3d_s2d bf16 bs1 96x96x80", pf, pb,
              net="unet3d_s2d", dtype_name="bf16", hebb_mode=None,
              batch=1, size=(96, 96, 80), nd=3)


if __name__ == "__main__":
    main()
