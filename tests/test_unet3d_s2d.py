"""Exact-parity of the folded 3D UNet (models/unet3d_s2d.py) with the
plain unet3d: param tree, eval outputs, BN batch stats, backprop
gradients, and Hebbian deltas (mirrors tests/test_s2d.py for 2D)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # unet3d_s2d exact-parity group

import jax
import jax.numpy as jnp
from flax import linen as nn

from hebbax.hebb.spec import HebbSpec
from hebbax.models import get_network
from hebbax.models.unet3d import UNet3D
from hebbax.models.unet3d_s2d import UNet3DS2D


def _pair(hebb=None, feats=8):
    m = UNet3D(in_channels=1, n_cls=2, init_features=feats, hebb=hebb)
    mf = UNet3DS2D(in_channels=1, n_cls=2, init_features=feats,
                   hebb=hebb)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 16, 1),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m, mf, x, v


def test_param_tree_identical():
    m, mf, x, v = _pair()
    vf = mf.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(vf["params"]))
    sh = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    shf = jax.tree_util.tree_map(lambda a: a.shape, vf["params"])
    assert sh == shf


def test_registry_full_size_param_tree():
    m = get_network("unet3d", 1, 2)
    mf = get_network("unet3d_s2d", 1, 2)
    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    v = jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)},
                                      x, train=False))
    vf = jax.eval_shape(lambda: mf.init({"params": jax.random.PRNGKey(0)},
                                        x, train=False))
    sh = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    shf = jax.tree_util.tree_map(lambda a: a.shape, vf["params"])
    assert sh == shf


def test_eval_exact():
    m, mf, x, v = _pair()
    out = m.apply(v, x, train=False)
    outf = mf.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(outf), np.asarray(out),
                               atol=5e-5)


def test_train_stats_and_grads_exact():
    # In f32 the two formulations agree semantically but diverge to
    # ~1e-3 on deep-decoder grads: summation-order noise in the level-0
    # BN batch stats amplifies chaotically through 18 BN layers (f64
    # agreement to 2e-12 proves no semantic difference — verified while
    # landing FoldedBatchNorm3).  Assert equivalence in f64.
    jax.config.update("jax_enable_x64", True)
    try:
        _train_stats_and_grads_body()
    finally:
        jax.config.update("jax_enable_x64", False)


def _train_stats_and_grads_body():
    m, mf, x, v = _pair()
    x = x.astype(jnp.float64)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 2, (2, 16, 16,
                                                            16)))

    def loss_of(model):
        def f(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(out)
            onehot = jax.nn.one_hot(y, 2)
            return -jnp.mean(jnp.sum(onehot * logp, -1)), mut
        return f

    (l1, mut1), g1 = jax.value_and_grad(loss_of(m), has_aux=True)(
        v["params"])
    (l2, mut2), g2 = jax.value_and_grad(loss_of(mf), has_aux=True)(
        v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(mut1["batch_stats"]),
            jax.tree_util.tree_leaves_with_path(mut2["batch_stats"])):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4,
                                   err_msg=jax.tree_util.keystr(p1))
    for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                                jax.tree_util.tree_leaves_with_path(g2)):
        assert p1 == p2
        scale = max(1e-3, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=2e-4,
                                   err_msg=jax.tree_util.keystr(p1))


@pytest.mark.parametrize("mode", ["swta_t", "hpca_t"])
def test_hebbian_deltas_exact(mode, monkeypatch):
    monkeypatch.setattr(nn.Dropout, "__call__", lambda self, x, **kw: x)
    spec = HebbSpec(mode=mode, k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("conv",))
    m, mf, x, v = _pair(hebb=spec)
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats", "hebb"])
    _, mutf = mf.apply(v, x, train=True, mutable=["batch_stats", "hebb"])
    flatf = dict(jax.tree_util.tree_leaves_with_path(mutf["hebb"]))
    leaves = jax.tree_util.tree_leaves_with_path(mut["hebb"])
    assert len(leaves) > 0
    for path, val in leaves:
        ref = np.asarray(val)
        got = np.asarray(flatf[path])
        scale = max(1e-6, np.abs(ref).max())
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("pair", [("unet3d_cct_min", None),
                                  ("unet3d_dtc", "unet3d_dtc_s2d")])
def test_cct_dtc_s2d_param_tree_and_eval(pair):
    base, fold = pair
    if fold is None:
        # cct: compare at init_features=32 ('_min') for test speed by
        # constructing the folded class directly
        from hebbax.models.unet3d_s2d import UNet3DCCTS2D
        from hebbax.models.unet3d import UNet3DCCT
        m = UNet3DCCT(1, 2, init_features=32)
        mf = UNet3DCCTS2D(1, 2, init_features=32)
    else:
        from hebbax.models import get_network
        m = get_network(base, 1, 2)
        mf = get_network(fold, 1, 2)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vf = mf.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, vf["params"]))
    out = m.apply(v, x, train=False)
    outf = mf.apply(v, x, train=False)
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(out),
                                   jax.tree_util.tree_leaves(outf))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, err_msg=f"out {i}")


def test_cct3d_s2d_perturbed_aux_match(monkeypatch):
    """Shared 'perturb' rng: the folded CCT's aux outputs equal the
    unfolded model's (perturbations in the original layout)."""
    monkeypatch.setattr(nn.Dropout, "__call__", lambda self, x, **kw: x)
    from hebbax.models.unet3d import UNet3DCCT
    from hebbax.models.unet3d_s2d import UNet3DCCTS2D
    m = UNet3DCCT(1, 2, init_features=32)
    mf = UNet3DCCTS2D(1, 2, init_features=32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 16, 1),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    r = {"perturb": jax.random.PRNGKey(3)}
    out, _ = m.apply(v, x, train=True, rngs=r, mutable=["batch_stats"])
    outf, _ = mf.apply(v, x, train=True, rngs=r,
                       mutable=["batch_stats"])
    for i, (a, b) in enumerate(zip(out, outf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, err_msg=f"head {i}")
