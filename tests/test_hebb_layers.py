"""HConv/HConvTranspose module behavior: delta sowing, exclusion, grad
merging, and the pretraining freeze mask."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn
from flax import traverse_util

from hebbax.hebb import (
    HConv, HConvTranspose, HebbSpec, merge_hebbian_grads,
    pretrain_trainable_mask, hebb_delta_tree,
)
from hebbax.hebb.surgery import apply_mask


class TinyNet(nn.Module):
    hebb: HebbSpec = None

    @nn.compact
    def __call__(self, x, train=False):
        x = HConv(4, 3, 1, 1, hebb=self.hebb, name="conv1")(x, train)
        x = nn.leaky_relu(x)
        x = HConvTranspose(4, 2, 2, hebb=self.hebb, name="up1")(x, train)
        x = HConv(2, 1, 1, 0, hebb=self.hebb, name="out_conv")(x, train)
        return x


def _init(model, x):
    return model.init({"params": jax.random.PRNGKey(0)}, x, train=False)


def test_plain_and_hebbian_params_identical_structure():
    x = jnp.ones((1, 8, 8, 3))
    plain = _init(TinyNet(hebb=None), x)
    heb = _init(TinyNet(hebb=HebbSpec(exclude=("out_conv",))), x)
    p1 = jax.tree_util.tree_structure(plain["params"])
    p2 = jax.tree_util.tree_structure(heb["params"])
    assert p1 == p2  # checkpoints are interchangeable, no surgery needed


def test_delta_sown_only_when_training_and_active():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    spec = HebbSpec(mode="swta_t", k=10.0, alpha=1.0, exclude=("out_conv",))
    model = TinyNet(hebb=spec)
    variables = _init(model, x)

    out, state = model.apply(variables, x, train=True, mutable=["hebb"])
    flat = traverse_util.flatten_dict(state["hebb"])
    paths = sorted("/".join(p) for p in flat)
    assert paths == ["conv1/delta", "up1/delta"]  # out_conv excluded

    out2, state2 = model.apply(variables, x, train=False, mutable=["hebb"])
    assert state2.get("hebb", {}) == {}

    # eval output == train output for this net (no dropout/BN)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


def test_alpha_zero_skips_delta_but_keeps_wnorm():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    spec0 = HebbSpec(alpha=0.0)
    model = TinyNet(hebb=spec0)
    variables = _init(model, x)
    _, state = model.apply(variables, x, train=True, mutable=["hebb"])
    assert state.get("hebb", {}) == {}
    # w_nrm still shapes the forward: differs from the plain model
    plain_out = TinyNet(hebb=None).apply(variables, x, train=False)
    heb_out = model.apply(variables, x, train=False)
    assert not np.allclose(np.asarray(plain_out), np.asarray(heb_out))


def test_merge_hebbian_grads():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    spec = HebbSpec(mode="swta_t", k=10.0, alpha=1.0, exclude=("out_conv",))
    model = TinyNet(hebb=spec)
    variables = _init(model, x)

    def loss_fn(params):
        out, state = model.apply({"params": params}, x, train=True,
                                 mutable=["hebb"])
        return jnp.mean(out ** 2), state["hebb"]

    (loss, hebb), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    merged = merge_hebbian_grads(grads, hebb, alpha=1.0)
    deltas = hebb_delta_tree(hebb)
    flat_m = traverse_util.flatten_dict(merged)
    flat_g = traverse_util.flatten_dict(grads)
    # alpha=1: hebbian kernels' grads == -delta, others untouched
    for path, delta in deltas.items():
        np.testing.assert_allclose(np.asarray(flat_m[path]),
                                   -np.asarray(delta), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(flat_m[("out_conv", "kernel")]),
        np.asarray(flat_g[("out_conv", "kernel")]))

    # alpha=0.3 blend
    merged2 = merge_hebbian_grads(grads, hebb, alpha=0.3)
    flat_m2 = traverse_util.flatten_dict(merged2)
    p = ("conv1", "kernel")
    np.testing.assert_allclose(
        np.asarray(flat_m2[p]),
        0.7 * np.asarray(flat_g[p]) - 0.3 * np.asarray(deltas[p]),
        rtol=1e-5)


def test_pretrain_mask_and_apply():
    x = jnp.ones((1, 8, 8, 3))
    variables = _init(TinyNet(hebb=HebbSpec(exclude=("out_conv",))), x)
    mask = pretrain_trainable_mask(variables["params"], ("out_conv",))
    flat = traverse_util.flatten_dict(mask)
    assert flat[("conv1", "kernel")] is True
    assert flat[("conv1", "bias")] is False      # converted bias frozen
    assert flat[("out_conv", "kernel")] is True  # excluded head trains
    assert flat[("out_conv", "bias")] is True
    ones = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    masked = apply_mask(ones, mask)
    mflat = traverse_util.flatten_dict(masked)
    assert float(mflat[("conv1", "bias")].sum()) == 0.0
    assert float(mflat[("out_conv", "bias")].sum()) > 0.0


def test_cct_style_double_call_accumulates():
    """A shared conv called twice per step accumulates deltas (reference
    `delta_w +=` behavior for CCT shared decoders)."""

    class Shared(nn.Module):
        hebb: HebbSpec = None

        @nn.compact
        def __call__(self, x, train=False):
            conv = HConv(4, 3, 1, 1, hebb=self.hebb, name="conv1")
            return conv(x, train) + conv(x * 0.5, train)

    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    spec = HebbSpec(mode="swta", k=10.0, alpha=1.0)
    model = Shared(hebb=spec)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    _, state = model.apply(variables, x, train=True, mutable=["hebb"])
    flat = traverse_util.flatten_dict(state["hebb"])
    delta = flat[("conv1", "delta")]
    assert np.all(np.isfinite(np.asarray(delta)))


def test_orthogonal_init_torch_semantics():
    """torch nn.init.orthogonal_ flattens the weight to (dim0, rest) and
    fills a semi-orthogonal matrix (networks_2d/unet.py:19) — verify the
    hebbax initializer reproduces exactly that, for conv and transpose
    layouts, with no silent fallback."""
    import jax
    import numpy as np

    from hebbax.hebb.layers import torch_kernel_init

    for transpose, shape in ((False, (3, 3, 4, 8)), (True, (2, 2, 6, 4)),
                             (False, (3, 3, 3, 2, 16))):
        nd = len(shape) - 2
        init = torch_kernel_init("orthogonal", transpose=transpose, gain=1.0)
        w = np.asarray(init(jax.random.PRNGKey(0), shape))
        i, o = shape[nd], shape[nd + 1]
        if transpose:  # (*k, I, O) -> torch (I, O, *k) -> 2D (I, O*rf)
            t = np.transpose(w, (nd,) + (nd + 1,) + tuple(range(nd)))
            m = t.reshape(i, -1)
        else:          # (*k, I, O) -> torch (O, I, *k) -> 2D (O, I*rf)
            t = np.transpose(w, (nd + 1,) + (nd,) + tuple(range(nd)))
            m = t.reshape(o, -1)
        rows = m.shape[0]
        gram = m @ m.T if m.shape[1] >= rows else m.T @ m
        np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-5)
