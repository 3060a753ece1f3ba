"""Exact-parity of the folded 3D URPC net (models/urpc3d_s2d.py) with
unet3d_urpc: param tree, eval outputs, f64 grads, Hebbian deltas."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # folded 3D URPC/CCT/DTC parity group

import jax
import jax.numpy as jnp
from flax import linen as nn

from hebbax.hebb.spec import HebbSpec
from hebbax.models import get_network


def _pair(hebb=None):
    m = get_network("unet3d_urpc", 1, 2, hebb=hebb)
    mf = get_network("unet3d_urpc_s2d", 1, 2, hebb=hebb)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 16, 1),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m, mf, x, v


def test_param_tree_identical():
    m, mf, x, v = _pair()
    vf = mf.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, vf["params"]))


def test_eval_exact():
    m, mf, x, v = _pair()
    out = m.apply(v, x, train=False)
    outf = mf.apply(v, x, train=False)
    for i, (a, b) in enumerate(zip(out, outf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, err_msg=f"dsv{i + 1}")


def test_train_grads_exact_f64(monkeypatch):
    monkeypatch.setattr(nn.Dropout, "__call__", lambda self, x, **kw: x)
    jax.config.update("jax_enable_x64", True)
    try:
        _body()
    finally:
        jax.config.update("jax_enable_x64", False)


def _body():
    m, mf, x, v = _pair()
    x = x.astype(jnp.float64)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
    y = jnp.asarray(np.random.RandomState(1).randint(0, 2,
                                                     (2, 16, 16, 16)))

    def loss_of(model):
        def f(params):
            outs = model.apply({"params": params}, x, train=True)
            logp = jax.nn.log_softmax(outs[0])
            onehot = jax.nn.one_hot(y, 2)
            loss = -jnp.mean(jnp.sum(onehot * logp, -1))
            return loss + 1e-3 * sum(jnp.mean(o ** 2) for o in outs[1:])
        return f

    l1, g1 = jax.value_and_grad(loss_of(m))(v["params"])
    l2, g2 = jax.value_and_grad(loss_of(mf))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-9)
    for (p1, a), (p2, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                                jax.tree_util.tree_leaves_with_path(g2)):
        assert p1 == p2
        scale = max(1e-9, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(p1))


@pytest.mark.parametrize("mode", ["swta_t", "hpca_t"])
def test_hebbian_deltas_exact(mode, monkeypatch):
    monkeypatch.setattr(nn.Dropout, "__call__", lambda self, x, **kw: x)
    spec = HebbSpec(mode=mode, k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("dsv1", "dsv2", "dsv3", "dsv4"))
    m, mf, x, v = _pair(hebb=spec)
    _, mut = m.apply(v, x, train=True, mutable=["hebb"])
    _, mutf = mf.apply(v, x, train=True, mutable=["hebb"])
    flatf = dict(jax.tree_util.tree_leaves_with_path(mutf["hebb"]))
    leaves = jax.tree_util.tree_leaves_with_path(mut["hebb"])
    assert len(leaves) > 0
    for path, val in leaves:
        ref = np.asarray(val)
        got = np.asarray(flatf[path])
        scale = max(1e-6, np.abs(ref).max())
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))
