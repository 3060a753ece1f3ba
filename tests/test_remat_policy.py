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
