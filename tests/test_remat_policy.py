"""Conv-saving remat policy (models/common.remat_policy).

The CCT shared decoders are rematted (full-decoder recompute) to fit
the v5e HBM at the reference patch size.  The ``remat_policy="convs"``
variants (registry ``*_rc``) instead save every tagged conv output
(hebb.layers.CONV_SAVE_NAME) and recompute only the elementwise tail —
gradients must be bitwise-identical; only the memory/recompute split
changes.  Reference semantics under test: the CCT shared-decoder
protocol of /root/reference/models/networks_3d/unet3d_cct.py:125-174.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_remat_policy_validation():
    from hebbax.models.common import remat_policy
    assert remat_policy(None) is None
    assert remat_policy("convs") is not None
    with pytest.raises(ValueError):
        remat_policy("bogus")


def test_rc_registry_entries():
    from hebbax.models import available_networks, network_meta
    for name in ("unet3d_cct_s2d_rc", "unet3d_cct_s2d_batched_rc",
                 "vnet_cct_s2d_rc", "vnet_cct_s2d_batched_rc"):
        assert name in available_networks()
        assert network_meta(name)["outputs"] == "deep4"


@pytest.mark.slow  # 3D grads on CPU
def test_unet3d_cct_rc_grads_bitwise_identical():
    from hebbax.models.unet3d import UNet3DCCT

    jax.config.update("jax_enable_x64", True)
    try:
        rngs = {"params": jax.random.PRNGKey(0),
                "perturb": jax.random.PRNGKey(1)}
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)),
            jnp.float64)

        def grads(policy):
            m = UNet3DCCT(in_channels=1, n_cls=2, init_features=8,
                          remat_policy=policy)
            v = jax.jit(lambda: m.init(rngs, x, train=False))()

            def loss(p):
                out, _ = m.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True,
                    rngs={"perturb": jax.random.PRNGKey(5)},
                    mutable=["batch_stats"])
                return sum(jnp.mean(o.astype(jnp.float64) ** 2)
                           for o in out)

            return jax.jit(jax.grad(loss))(v["params"])

        g0 = jax.tree_util.tree_leaves(grads(None))
        g1 = jax.tree_util.tree_leaves(grads("convs"))
        for a, b in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("mode", ["convs", "full"])
def test_step_level_remat_same_update(mode, monkeypatch):
    """HEBBAX_REMAT_STEP wraps the whole sup-step loss closure in
    jax.checkpoint (engine/steps.py).  Post-update params must equal the
    unwrapped step's — only the save/recompute split may change.
    (Measured A/B on TPU: both variants LOSE end-to-end —
    scripts/microbench_remat2d.py, artifacts/r5/remat2d.log — the hook
    exists for future re-testing and stays default-off.)"""
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.engine.steps import make_sup_train_step
    from hebbax.models import get_network
    from hebbax.ops.losses import segmentation_loss

    model = get_network("unet", 3, 2)
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(2, 32, 32, 3), jnp.float32)
    masks = jnp.asarray(rs.randint(0, 2, (2, 32, 32)), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, images, train=False)
    tx = optax.sgd(0.5, momentum=0.9)
    criterion = segmentation_loss("dice", False, num_classes=2)
    batch = {"image": images, "mask": masks}
    key = jax.random.PRNGKey(2)

    def one_step():
        v = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                   variables)
        step = make_sup_train_step(model, "unet", criterion, tx)
        s = TrainState(params=v["params"],
                       batch_stats=v.get("batch_stats"),
                       opt_state=tx.init(v["params"]), step=0)
        s2, out = step(s, batch, key)
        return s2.params, float(out["loss"])

    monkeypatch.delenv("HEBBAX_REMAT_STEP", raising=False)
    p_ref, l_ref = one_step()
    monkeypatch.setenv("HEBBAX_REMAT_STEP", mode)
    p_rc, l_rc = one_step()
    assert l_ref == l_rc
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_rc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
