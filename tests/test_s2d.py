"""Space-to-depth folded UNet2D: exact equivalence with UNet2D.

The folded variant (models/unet2d_s2d.py) must be a pure LAYOUT change:
same parameter tree, same outputs, same Hebbian deltas, same BN batch
stats.  Dropout draws different positions across layouts, so the
train-mode checks monkeypatch nn.Dropout to identity in BOTH models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from hebbax.hebb.spec import HebbSpec
from hebbax.ops.dropout import FastDropout
from hebbax.models import get_network
from hebbax.ops import s2d


def test_fold_unfold_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(s2d.unfold(s2d.fold(x))),
                                  np.asarray(x))


def test_folded_conv_exact():
    """Folded conv == original 3x3 pad-1 conv, including edges."""
    from hebbax.hebb import rules

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, 16, 16, 5), jnp.float32)
    w = jnp.asarray(rs.rand(3, 3, 5, 7) - 0.5, jnp.float32)
    ref = rules.conv_fwd(x, w, (1, 1), ((1, 1), (1, 1)))
    wf = s2d.fold_conv_kernel(w, (5,))
    got = s2d.unfold(rules.conv_fwd(s2d.fold(x), wf, (1, 1),
                                    ((1, 1), (1, 1))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_folded_conv_grouped_concat():
    """Folded concat of two sources == original concat, via in_groups."""
    from hebbax.hebb import rules

    rs = np.random.RandomState(2)
    a = jnp.asarray(rs.rand(2, 8, 8, 3), jnp.float32)
    b = jnp.asarray(rs.rand(2, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rs.rand(3, 3, 7, 6) - 0.5, jnp.float32)
    ref = rules.conv_fwd(jnp.concatenate([a, b], -1), w, (1, 1),
                         ((1, 1), (1, 1)))
    xf = jnp.concatenate([s2d.fold(a), s2d.fold(b)], -1)
    wf = s2d.fold_conv_kernel(w, (3, 4))
    got = s2d.unfold(rules.conv_fwd(xf, wf, (1, 1), ((1, 1), (1, 1))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)


def test_subpixel_max_is_maxpool():
    from hebbax.models.common import max_pool

    x = jnp.asarray(np.random.RandomState(3).rand(2, 8, 8, 5),
                    jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(s2d.subpixel_max(s2d.fold(x))),
        np.asarray(max_pool(x)))


def _both_models(hebb=None):
    m = get_network("unet", 3, 2, hebb=hebb)
    mf = get_network("unet_s2d", 3, 2, hebb=hebb)
    return m, mf


def _init(model, x, rngs=None):
    # deliberately EAGER: per-op XLA CPU compiles are shared process-wide
    # across tests (measured faster than per-test whole-program jits)
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    return model.init(rngs, x, train=False)


def _train_apply(model, v, x, r):
    return model.apply(v, x, train=True, rngs=r,
                       mutable=["batch_stats", "hebb"])


def test_unet_s2d_param_tree_identical():
    m, mf = _both_models()
    x = jnp.zeros((1, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(0)}
    v = jax.eval_shape(lambda xx: m.init(rngs, xx, train=False), x)
    vf = jax.eval_shape(lambda xx: mf.init(rngs, xx, train=False), x)
    flat = jax.tree_util.tree_map(jnp.shape, v)
    flatf = jax.tree_util.tree_map(jnp.shape, vf)
    assert jax.tree_util.tree_structure(flat) == \
        jax.tree_util.tree_structure(flatf)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, flat, flatf))


def test_unet_s2d_eval_exact():
    m, mf = _both_models()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    v = _init(m, x)
    out = m.apply(v, x, train=False)
    outf = mf.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(outf), np.asarray(out),
                               atol=3e-5)


@pytest.mark.slow  # non-default config (head_depth=1 is TPU-optimal, r5)
def test_unet_s2d_head_depth2_exact():
    """head_depth=2 (4x4-folded MLP head) is a pure layout change:
    same params, same outputs, same grads as the unfolded model."""
    from hebbax.models.unet2d_s2d import UNet2DS2D

    m, _ = _both_models()
    mf2 = UNet2DS2D(3, 2, head_depth=2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(mf2.apply(v, x, train=False)),
        np.asarray(m.apply(v, x, train=False)), atol=3e-5)

    def loss(params, model):
        return jnp.mean(model.apply({**v, "params": params}, x,
                                    train=False) ** 2)

    g = jax.grad(loss)(v["params"], m)
    g2 = jax.grad(loss)(v["params"], mf2)
    for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(g),
                         jax.tree_util.tree_leaves(g2)):
        rel = float(jnp.max(jnp.abs(a - b))
                    / (jnp.max(jnp.abs(a)) + 1e-12))
        assert rel < 2e-4, (jax.tree_util.keystr(p), rel)


def test_unet_s2d_train_deltas_and_stats(monkeypatch):
    """Train-mode forward with dropout disabled: outputs, every sown
    Hebbian delta, and every BN batch stat must match."""
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, **kw: x)
    monkeypatch.setattr(FastDropout, "__call__",
                        lambda self, x, **kw: x)
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("out_conv",))
    m, mf = _both_models(hebb=spec)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                    jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0)}
    v = _init(m, x, rngs)
    r = {"dropout": jax.random.PRNGKey(1)}
    out, mut = _train_apply(m, v, x, r)
    outf, mutf = _train_apply(mf, v, x, r)
    # atol 3e-5: the fast-tier conftest runs XLA at backend opt level 0,
    # which changes CPU fusion order enough to move single elements ~2e-5
    np.testing.assert_allclose(np.asarray(outf), np.asarray(out),
                               atol=3e-5)

    flat = jax.tree_util.tree_leaves_with_path(mut["hebb"])
    flatf = dict(jax.tree_util.tree_leaves_with_path(mutf["hebb"]))
    assert len(flat) > 0
    for path, val in flat:
        got = flatf[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(val), atol=2e-3,
            err_msg=jax.tree_util.keystr(path))

    sflat = jax.tree_util.tree_leaves_with_path(mut["batch_stats"])
    sflatf = dict(jax.tree_util.tree_leaves_with_path(
        mutf["batch_stats"]))
    for path, val in sflat:
        np.testing.assert_allclose(
            np.asarray(sflatf[path]), np.asarray(val), atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_unet_s2d_hpca_deltas(monkeypatch):
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, **kw: x)
    monkeypatch.setattr(FastDropout, "__call__",
                        lambda self, x, **kw: x)
    spec = HebbSpec(mode="hpca", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("out_conv",))
    m, mf = _both_models(hebb=spec)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 16, 16, 3),
                    jnp.float32)
    v = _init(m, x)
    r = {"dropout": jax.random.PRNGKey(1)}
    _, mut = _train_apply(m, v, x, r)
    _, mutf = _train_apply(mf, v, x, r)
    flatf = dict(jax.tree_util.tree_leaves_with_path(mutf["hebb"]))
    for path, val in jax.tree_util.tree_leaves_with_path(mut["hebb"]):
        # hpca's Gram-matrix decay sums y y^T over ~1e5 positions, so
        # the folded layout's different accumulation order amplifies
        # ~1e-6 fp noise to ~1e-3 absolute on isolated elements; a
        # norm-wise bound is the right equivalence statement here.
        a, b = np.asarray(flatf[path]), np.asarray(val)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
        assert rel < 1e-3, (jax.tree_util.keystr(path), rel)


@pytest.mark.parametrize("base,folded", [("unet_urpc", "unet_urpc_s2d"),
                                         ("unet_cct", "unet_cct_s2d")])
def test_semi_variant_s2d_param_tree_identical(base, folded):
    m = get_network(base, 3, 2)
    mf = get_network(folded, 3, 2)
    x = jnp.zeros((1, 32, 32, 3))
    rngs = {"params": jax.random.PRNGKey(0)}
    v = jax.eval_shape(lambda xx: m.init(rngs, xx, train=False), x)
    vf = jax.eval_shape(lambda xx: mf.init(rngs, xx, train=False), x)
    flat = jax.tree_util.tree_map(jnp.shape, v)
    flatf = jax.tree_util.tree_map(jnp.shape, vf)
    assert jax.tree_util.tree_structure(flat) == \
        jax.tree_util.tree_structure(flatf)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, flat, flatf))


def test_unet_urpc_s2d_eval_exact():
    """All four deep-supervision logits match the unfolded model."""
    m = get_network("unet_urpc", 3, 2)
    mf = get_network("unet_urpc_s2d", 3, 2)
    x = jnp.asarray(np.random.RandomState(4).rand(2, 32, 32, 3),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = m.apply(v, x, train=False)
    outsf = mf.apply(v, x, train=False)
    assert len(outs) == len(outsf) == 4
    for i, (a, b) in enumerate(zip(outsf, outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, err_msg=f"dp{i}")


def test_unet_cct_s2d_eval_exact_with_perturbations():
    """Main AND the three perturbed aux outputs match the unfolded
    model under the same 'perturb' rng (identical draws by design —
    _perturb_folded perturbs in the original layout)."""
    m = get_network("unet_cct", 3, 2)
    mf = get_network("unet_cct_s2d", 3, 2)
    x = jnp.asarray(np.random.RandomState(5).rand(2, 32, 32, 3),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    r = {"perturb": jax.random.PRNGKey(7)}
    outs = m.apply(v, x, train=False, rngs=r)
    outsf = mf.apply(v, x, train=False, rngs=r)
    for i, (a, b) in enumerate(zip(outsf, outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, err_msg=f"out{i}")
    # the aux heads really were perturbed (not the identity fallback)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_unet_urpc_s2d_hebbian_deltas(monkeypatch):
    """swta_t pretraining deltas on the URPC backbone match (the URPC
    pretrain path excludes the four heads)."""
    monkeypatch.setattr(nn.Dropout, "__call__",
                        lambda self, x, **kw: x)
    monkeypatch.setattr(FastDropout, "__call__",
                        lambda self, x, **kw: x)
    spec = HebbSpec(mode="swta_t", k=50.0, w_nrm=True, alpha=1.0,
                    exclude=("out_conv", "out_conv_dp1", "out_conv_dp2",
                             "out_conv_dp3"))
    m = get_network("unet_urpc", 3, 2, hebb=spec)
    mf = get_network("unet_urpc_s2d", 3, 2, hebb=spec)
    x = jnp.asarray(np.random.RandomState(6).rand(2, 32, 32, 3),
                    jnp.float32)
    v = _init(m, x)
    r = {"dropout": jax.random.PRNGKey(1)}
    _, mut = _train_apply(m, v, x, r)
    _, mutf = _train_apply(mf, v, x, r)
    flatf = dict(jax.tree_util.tree_leaves_with_path(mutf["hebb"]))
    leaves = jax.tree_util.tree_leaves_with_path(mut["hebb"])
    assert len(leaves) > 0
    for path, val in leaves:
        np.testing.assert_allclose(
            np.asarray(flatf[path]), np.asarray(val), atol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_unet_s2d_semi_step_and_dp():
    """unet_s2d drives the semi-supervised step factories and the dp
    mesh path (data-parallel sharding is layout-agnostic)."""
    import optax

    from hebbax.engine.semi import make_semi_step
    from hebbax.engine.state import TrainState
    from hebbax.ops.losses import entropy_loss, segmentation_loss

    model = get_network("unet_s2d", 3, 2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                    jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState(params=v["params"],
                       batch_stats=v.get("batch_stats"),
                       opt_state=tx.init(v["params"]), step=0)
    criterion = segmentation_loss("dice", False, num_classes=2)

    def unsup_fn(outputs, batch):
        from hebbax.models.registry import primary_logits
        probs = jax.nn.softmax(primary_logits("unet_s2d", outputs), -1)
        return entropy_loss(probs, num_classes=2)

    step = make_semi_step(model, "unet_s2d", criterion, tx, unsup_fn)
    sup = {"image": x, "mask": jnp.zeros((2, 16, 16), jnp.int32)}
    unsup = {"image": x}
    state, out = step(state, sup, unsup, 0.5, jax.random.PRNGKey(1))
    assert np.isfinite(float(out["loss"]))


def test_unet_cct_s2d_batched_aux():
    """The 4N-batched shared-decoder CCT ('unet_cct_s2d_batched'):
    identical param tree, EVAL-exact vs unet_cct, and in train mode the
    batched aux passes are real perturbed outputs (documented BN-stat
    deviation makes train outputs differ from serial only slightly)."""
    m = get_network("unet_cct", 3, 2)
    mb = get_network("unet_cct_s2d_batched", 3, 2)
    x = jnp.asarray(np.random.RandomState(9).rand(2, 32, 32, 3),
                    jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    vb = mb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(vb["params"]))

    # eval (no perturb rng): exactly the unfolded model's output
    out = m.apply(v, x, train=False)
    outb = mb.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(out[0]),
                               atol=3e-5)

    # train with perturbations: 4 outputs, aux genuinely perturbed,
    # close to the serial protocol (per-pass vs 4N BN stats)
    r = {"perturb": jax.random.PRNGKey(7),
         "dropout": jax.random.PRNGKey(8)}
    ms = get_network("unet_cct_s2d", 3, 2)
    outs_b, mut_b = mb.apply(v, x, train=True, rngs=r,
                             mutable=["batch_stats"])
    outs_s, _ = ms.apply(v, x, train=True, rngs=r,
                         mutable=["batch_stats"])
    assert len(outs_b) == 4
    for a in outs_b:
        assert a.shape == outs_s[0].shape
    assert not np.allclose(np.asarray(outs_b[0]), np.asarray(outs_b[1]))
    # the documented train-mode deviation is BN batch statistics (4N
    # combined vs per-pass); on a random-init net that shifts logits
    # substantially, so assert structural agreement (correlation), not
    # closeness
    a = np.asarray(outs_b[0]).ravel()
    b = np.asarray(outs_s[0]).ravel()
    assert np.isfinite(a).all()
    assert np.corrcoef(a, b)[0, 1] > 0.8
