#!/usr/bin/env python
"""Empirical speed-of-light calibration for the attached TPU chip.

Times (AOT, donated, pipelined): a big bf16 matmul (MXU peak), an
elementwise triad (HBM bandwidth), and the production sup/pretrain train
steps with XLA's own flop counts, so throughput claims in README can be
stated as a fraction of the measured — not nominal — roofline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("CAL_ITERS", "20"))


def slope_time(step1, y0, *args, n1=10, n2=30):
    """Per-call seconds of the chained call y = step1(y, *args), using
    fetch-terminated runs of two lengths (see hebbax.utils.timing)."""
    import numpy as np

    def run(n):
        y = y0
        t0 = time.perf_counter()
        for _ in range(n):
            y = step1(y, *args)
        np.asarray(jnp.sum(jax.tree_util.tree_leaves(y)[0]))
        return time.perf_counter() - t0

    run(3)  # warm
    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # MXU peak via a CHAINED matmul (y <- y @ a): each call depends on
    # the previous result and the runs are fetch-terminated (through the
    # axon tunnel, block_until_ready acknowledges dispatch without
    # waiting — identical-args loops "measure" 50 PFLOP/s).
    n = 4096
    fl = 2 * n**3
    for dt_name, dty in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        a = jnp.eye(n, dtype=dty) * (1.0 + 1e-6)
        y0 = jnp.ones((n, n), dty)
        f = jax.jit(lambda y_, a_: y_ @ a_)
        dt = slope_time(f, y0, a)
        print(f"matmul {dt_name} {n}^3 chained: {dt*1e3:.3f} ms -> "
              f"{fl/dt/1e12:.1f} TFLOP/s")

    # HBM bandwidth: chained y <- y * c + x on 256 MB arrays (3x traffic)
    m = 64 * 1024 * 1024
    x = jnp.ones((m,), jnp.float32)
    y0 = jnp.zeros((m,), jnp.float32)
    f = jax.jit(lambda y_, x_: y_ * jnp.float32(1.0000001) + x_)
    dt = slope_time(f, y0, x)
    print(f"triad 256MB chained: {dt*1e3:.3f} ms -> "
          f"{3*4*m/dt/1e9:.0f} GB/s")

    # Production steps with XLA flop counts
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.hebb.spec import HebbSpec
    from hebbax.hebb.surgery import pretrain_trainable_mask
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    BATCH, SIZE = 32, 128
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (BATCH, SIZE, SIZE)), jnp.int32)
    key = jax.random.PRNGKey(2)
    criterion = segmentation_loss("dice", False, num_classes=2)

    for name in ("sup", "pretrain"):
        spec = (None if name == "sup" else
                HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                         exclude=("out_conv",)))
        model = get_network("unet", 3, 2, hebb=spec)
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}
        variables = model.init(rngs, images, train=False)
        tx = (optax.sgd(0.5, momentum=0.9) if name == "sup"
              else optax.adam(1e-3))
        kw = {}
        if spec is not None:
            kw = dict(hebb_alpha=1.0,
                      trainable_mask=pretrain_trainable_mask(
                          variables["params"], spec.exclude),
                      backprop_only=spec.exclude)
        step = make_sup_train_step(model, "unet", criterion, tx, **kw)
        state = TrainState(params=variables["params"],
                           batch_stats=variables.get("batch_stats"),
                           opt_state=tx.init(variables["params"]), step=0)
        batch = {"image": images, "mask": masks}
        lowered = step.lower(state, batch, key)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops", float("nan"))
        from hebbax.utils.timing import measure_step
        dt = measure_step(compiled, state, batch, key,
                          n1=ITERS, n2=3 * ITERS)
        print(f"{name} step bs={BATCH}: {dt*1e3:.3f} ms  "
              f"xla_flops={fl/1e9:.1f}G -> {fl/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
