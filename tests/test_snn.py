"""SNN VGG9: forward shape, spike surrogate gradients, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebbax.models import get_network
from hebbax.models.snn import spike


def test_spike_surrogates():
    x = jnp.array([-0.5, 0.1, 2.0])
    assert np.array_equal(np.asarray(spike(x, "Linear")), [0, 1, 1])
    # linear surrogate: 0.3 * relu(1 - |x|)
    g = jax.grad(lambda v: jnp.sum(spike(v, "Linear")))(x)
    np.testing.assert_allclose(np.asarray(g), 0.3 * np.maximum(
        1 - np.abs(np.asarray(x)), 0), atol=1e-6)
    g2 = jax.grad(lambda v: jnp.sum(spike(v, "FastSigm")))(x)
    np.testing.assert_allclose(
        np.asarray(g2), 1 / (100 * np.abs(np.asarray(x)) + 1) ** 2,
        atol=1e-6)


def test_snn_forward_and_train_step():
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.ops.losses import segmentation_loss

    model = get_network("snn_vgg", 3, 2, timesteps=2)
    rngs = {"params": jax.random.PRNGKey(0),
            "poisson": jax.random.PRNGKey(1)}
    x = jnp.ones((2, 16, 16, 3))
    variables = model.init(rngs, x, train=False)
    out = model.apply(variables, x, train=False, rngs=rngs)
    assert out.shape == (2, 16, 16, 2)

    tx = optax.adam(1e-3)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats"),
                       opt_state=tx.init(variables["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)
    step = make_sup_train_step(model, "snn_vgg", criterion, tx)
    batch = {"image": x,
             "mask": jnp.zeros((2, 16, 16), jnp.int32).at[:, 4:12,
                                                          4:12].set(1)}
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, out = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(out["loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.params, p0)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


@pytest.mark.slow  # structural refactor proof; compiles two VGG9 nets
def test_snn_scan_matches_unrolled_twin():
    """The scanned BNTT implementation (stacked (T, C) params indexed by
    the scan counter) must reproduce an explicitly unrolled timestep loop
    built from T separate flax BatchNorms — the pre-refactor module
    layout (reference snn_vgg.py:134-135,198-204)."""
    import functools

    from flax import linen as nn

    from hebbax.models.common import resize_linear_align_corners
    from hebbax.models.snn import (ATROUS_FROM, FEATURES, LEAK, POOL_AFTER,
                                   THRESHOLD, avg_pool_3s2p1,
                                   poisson_spikes, spike)

    T = 2

    class UnrolledTwin(nn.Module):
        n_cls: int = 2

        @nn.compact
        def __call__(self, x, train=False):
            conv = functools.partial(nn.Conv, use_bias=False)
            feats = [conv(c, (3, 3), padding=1, name=f"feat{i}")
                     if i < ATROUS_FROM else
                     conv(c, (3, 3), padding=2, kernel_dilation=2,
                          name=f"feat{i}")
                     for i, c in enumerate(FEATURES)]
            bns = [[nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-4, use_bias=False,
                                 name=f"feat_bn{i}_t{t}")
                    for t in range(T)] for i in range(len(FEATURES))]
            cls_atrous = conv(1024, (3, 3), padding=12, kernel_dilation=12,
                              name="cls_atrous")
            cls_bns = [nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-4,
                                    use_bias=False, name=f"cls_bn_t{t}")
                       for t in range(T)]
            out_conv = conv(self.n_cls, (1, 1), padding=0, name="output")
            h, w = x.shape[1], x.shape[2]
            key = self.make_rng("poisson")
            mems = [None] * (len(FEATURES) + 1)
            out_mem = 0.0
            for t in range(T):
                out = poisson_spikes(jax.random.fold_in(key, t), x)
                for s, f in enumerate(feats + [cls_atrous]):
                    pre = f(out)
                    pre = (bns[s][t] if s < len(FEATURES)
                           else cls_bns[t])(pre)
                    mem = (LEAK * mems[s] if mems[s] is not None
                           else 0.0) + pre
                    thr = mem / THRESHOLD - 1.0
                    out = spike(thr, "Linear")
                    mems[s] = mem - (thr > 0) * THRESHOLD
                    if s in POOL_AFTER:
                        out = avg_pool_3s2p1(out)
                out_mem = out_mem + out_conv(out)
            return resize_linear_align_corners(out_mem / T, (h, w))

    model = get_network("snn_vgg", 3, 2, timesteps=T)
    twin = UnrolledTwin()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "poisson": jax.random.PRNGKey(7)}
    v = model.init(rngs, x, train=False)
    tv = twin.init(rngs, x, train=False)

    # translate scan-layout params/stats into the twin's per-BN layout
    tp = jax.tree_util.tree_map(lambda a: a, tv["params"])  # copy struct
    ts = jax.tree_util.tree_map(lambda a: a, tv["batch_stats"])
    names = [f"feat_bn{i}" for i in range(len(FEATURES))] + ["cls_bn"]
    for i, c in enumerate(FEATURES):
        tp[f"feat{i}"]["kernel"] = v["params"][f"feat{i}"]
    tp["cls_atrous"]["kernel"] = v["params"]["cls_atrous"]
    tp["output"]["kernel"] = v["params"]["output"]
    for i, n in enumerate(names):
        base = n if n == "cls_bn" else f"feat_bn{i}"
        for t in range(T):
            key = (f"{base}_t{t}")
            tp[key]["scale"] = v["params"][f"{n}_scale"][t]
            ts[key]["mean"] = v["batch_stats"][f"{n}_mean"][t]
            ts[key]["var"] = v["batch_stats"][f"{n}_var"][t]
    tvars = {"params": tp, "batch_stats": ts}

    r = {"poisson": jax.random.PRNGKey(7)}
    out_eval = model.apply(v, x, train=False, rngs=r)
    twin_eval = twin.apply(tvars, x, train=False, rngs=r)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(twin_eval),
                               atol=1e-5)

    out_tr, mut = model.apply(v, x, train=True, rngs=r,
                              mutable=["batch_stats"])
    twin_tr, tmut = twin.apply(tvars, x, train=True, rngs=r,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_tr), np.asarray(twin_tr),
                               atol=1e-5)
    for i, n in enumerate(names):
        base = n if n == "cls_bn" else f"feat_bn{i}"
        for t in range(T):
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"][f"{n}_mean"][t]),
                np.asarray(tmut["batch_stats"][f"{base}_t{t}"]["mean"]),
                atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"][f"{n}_var"][t]),
                np.asarray(tmut["batch_stats"][f"{base}_t{t}"]["var"]),
                atol=1e-5)
