"""4N-batched shared-decoder CCT 3D variants (unet3d_cct_s2d_batched,
vnet_cct_s2d_batched): identical param trees, EVAL-exact vs their
unfolded bases, genuinely perturbed train aux outputs.

Reference semantics: unet3d_cct.py:125-205 / vnet_cct.py:195-232 (one
clean + three feature-perturbed decoder passes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebbax.models import get_network

pytestmark = pytest.mark.slow  # 3D model e2e on CPU


def _check(base_name, batched_name, serial_name, x, rngs):
    m = get_network(base_name, 1, 2)
    mb = get_network(batched_name, 1, 2)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vb = mb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(vb["params"]))

    # eval (no perturb rng): exactly the unfolded base model's output
    out = m.apply(v, x, train=False)
    outb = mb.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(out[0]),
                               atol=3e-5)

    # train with perturbations: 4 outputs, aux genuinely perturbed,
    # structurally agreeing with the serial folded protocol (the
    # documented deviation is 4N vs per-pass BN batch stats)
    ms = get_network(serial_name, 1, 2)
    outs_b, _ = mb.apply(v, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    outs_s, _ = ms.apply(v, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    assert len(outs_b) == 4
    for a in outs_b:
        assert a.shape == outs_s[0].shape
        assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(outs_b[0]), np.asarray(outs_b[1]))
    a = np.asarray(outs_b[0]).ravel()
    b = np.asarray(outs_s[0]).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.8


def test_unet3d_cct_s2d_batched():
    x = jnp.asarray(np.random.RandomState(3).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    rngs = {"perturb": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(8)}
    _check("unet3d_cct", "unet3d_cct_s2d_batched", "unet3d_cct_s2d",
           x, rngs)


def test_vnet_cct_s2d_batched():
    x = jnp.asarray(np.random.RandomState(4).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    rngs = {"perturb": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(8)}
    _check("vnet_cct", "vnet_cct_s2d_batched", "vnet_cct_s2d", x, rngs)


def test_unet3d_cct_s2d_batched_rc():
    # batched + conv-saving remat policy (TPU family best: 433.8 ms
    # vs 588.0 serial full-remat, artifacts/r5/tpu_queue3.log); remat
    # policy only changes the backward memory/recompute split, so the
    # eval/train output contracts are the batched ones
    x = jnp.asarray(np.random.RandomState(5).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    rngs = {"perturb": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(8)}
    _check("unet3d_cct", "unet3d_cct_s2d_batched_rc", "unet3d_cct_s2d",
           x, rngs)


def test_vnet_cct_s2d_batched_rc():
    x = jnp.asarray(np.random.RandomState(6).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    rngs = {"perturb": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(8)}
    _check("vnet_cct", "vnet_cct_s2d_batched_rc", "vnet_cct_s2d",
           x, rngs)
