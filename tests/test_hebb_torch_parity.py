"""Direct parity: hebbax functional rules vs the torch reference layers
(/root/reference/hebb/hebb.py, hebb3d.py) executed side by side on the
same weights and inputs.  This is the strongest evidence the TPU-native
formulation reproduces the reference math (SURVEY.md section 7 'hard
parts' #1)."""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from hebbax.hebb import rules
from hebbax.hebb.spec import HebbSpec


def _load_ref_hebb():
    spec = importlib.util.spec_from_file_location(
        "ref_hebb", "/root/reference/hebb/hebb.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_ref_hebb()


def _to_jax_kernel(w_torch, transpose=False):
    """torch conv weight (O,I,kh,kw) / transpose (I,O,kh,kw) ->
    hebbax (*k, I, O)."""
    w = w_torch.detach().numpy()
    if transpose:
        return jnp.asarray(np.transpose(w, (2, 3, 0, 1)))
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _run_ref_layer(layer, x_torch):
    layer.train()
    y = layer(x_torch)
    return y, layer.delta_w.detach().numpy()


@pytest.mark.parametrize("mode,k", [("swta", 20.0), ("hpca", None)])
def test_conv2d_rule_parity(ref, mode, k):
    torch.manual_seed(0)
    layer = ref.HebbianConv2d(3, 8, 3, stride=1, padding=1, bias=False,
                              w_nrm=True, mode=mode,
                              k=k if k else 1.0, patchwise=True, alpha=1.0)
    x_t = torch.randn(2, 3, 12, 12)
    y_t, delta_ref = _run_ref_layer(layer, x_t)

    w = _to_jax_kernel(layer.weight)
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    x_pad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    w_n = rules.normalize(w, rules.weight_norm_axes(2, False))
    y = rules.conv_fwd(x_pad, w_n, (1, 1))
    # forward parity first
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)),
        y_t.detach().numpy(), atol=1e-4)
    # delta decay uses the RAW weight (reference: dec multiplies
    # self.weight, hebb.py:114, while y comes from the normalized one)
    if mode == "swta":
        delta = rules.swta_conv_delta(w, x_pad, y, k, (1, 1))
    else:
        delta = rules.hpca_conv_delta(w, x_pad, y, (1, 1))
    # reference delta_w is (O, I, kh, kw)
    got = np.transpose(np.asarray(delta), (3, 2, 0, 1))
    np.testing.assert_allclose(got, delta_ref, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("mode,k,stride", [("swta_t", 10.0, 1),
                                           ("swta_t", 10.0, 2),
                                           ("hpca_t", None, 2)])
def test_convtranspose2d_rule_parity(ref, mode, k, stride):
    torch.manual_seed(1)
    layer = ref.HebbianConvTranspose2d(
        4, 6, 2, stride=stride, padding=0, bias=False, w_nrm=True,
        mode=mode, k=k if k else 1.0, patchwise=True, alpha=1.0)
    x_t = torch.randn(2, 4, 6, 6)
    y_t, delta_ref = _run_ref_layer(layer, x_t)

    w = _to_jax_kernel(layer.weight, transpose=True)
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    w_n = rules.normalize(w, rules.weight_norm_axes(2, True))
    y = rules.conv_transpose_fwd(x, w_n, (stride, stride))
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)),
        y_t.detach().numpy(), atol=1e-4)
    if mode == "swta_t":
        delta = rules.swta_t_delta(w, x, y, k, (stride, stride))
    else:
        delta = rules.hpca_t_delta(w, x, y, (stride, stride))
    # reference transpose delta_w is (I, O, kh, kw)
    got = np.transpose(np.asarray(delta), (2, 3, 0, 1))
    np.testing.assert_allclose(got, delta_ref, rtol=2e-3, atol=2e-4)


def test_conv3d_rule_parity():
    spec3 = importlib.util.spec_from_file_location(
        "ref_hebb3d", "/root/reference/hebb/hebb3d.py")
    ref3 = importlib.util.module_from_spec(spec3)
    spec3.loader.exec_module(ref3)
    torch.manual_seed(2)
    layer = ref3.HebbianConv3d(2, 4, 3, stride=1, padding=1, bias=False,
                               w_nrm=True, mode="swta", k=15.0,
                               patchwise=True, alpha=1.0)
    x_t = torch.randn(1, 2, 8, 8, 6)
    layer.train()
    y_t = layer(x_t)
    delta_ref = layer.delta_w.detach().numpy()   # (O, I, k, k, k)

    w = jnp.asarray(np.transpose(layer.weight.detach().numpy(),
                                 (2, 3, 4, 1, 0)))
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 4, 1)))
    x_pad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    w_n = rules.normalize(w, rules.weight_norm_axes(3, False))
    y = rules.conv_fwd(x_pad, w_n, (1, 1, 1))
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 4, 1, 2, 3)),
        y_t.detach().numpy(), atol=1e-4)
    delta = rules.swta_conv_delta(w, x_pad, y, 15.0, (1, 1, 1))
    got = np.transpose(np.asarray(delta), (4, 3, 0, 1, 2))
    np.testing.assert_allclose(got, delta_ref, rtol=2e-3, atol=2e-4)


def test_contrastive_rule_parity(ref):
    """Contrastive rule (hebb.py:143-172) side-by-side, incl. the
    documented sign convention (the reference ADDS the objective's
    gradient to delta_w).  The batch permutation is pinned to [1, 0] on
    both sides."""
    from unittest import mock

    import jax

    torch.manual_seed(3)
    layer = ref.HebbianConv2d(3, 5, 3, stride=1, padding=1, bias=False,
                              w_nrm=True, mode="contrastive", k=1.0,
                              patchwise=True, contrast=0.7,
                              uniformity=False, alpha=1.0)
    x_t = torch.randn(2, 3, 10, 10)
    layer.train()
    with mock.patch("torch.randperm",
                    side_effect=lambda n, **kw: torch.tensor([1, 0])):
        layer(x_t)
    delta_ref = layer.delta_w.detach().numpy()  # (O, I, kh, kw)

    # find a key whose jax permutation of 2 is [1, 0]
    key = next(jax.random.PRNGKey(s) for s in range(100)
               if list(jax.random.permutation(
                   jax.random.PRNGKey(s), 2)) == [1, 0])
    w = _to_jax_kernel(layer.weight)
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    x_pad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    delta = rules.contrastive_delta(w, x_pad, key, (1, 1), False, True,
                                    contrast=0.7, uniformity=False)
    got = np.transpose(np.asarray(delta), (3, 2, 0, 1))
    np.testing.assert_allclose(got, delta_ref, rtol=2e-3, atol=2e-4)


def test_contrastive_uniformity_reference_is_broken(ref):
    """The reference's uniformity weighting is dead code: apply_weights
    passes the FULL out_channels bias into the 1-channel ones-kernel conv
    (hebb.py:159,75), so uniformity=True crashes for out_channels != 1.
    hebbax implements the intended objective (rules.py contrastive_delta
    uniformity branch) and must produce a finite, distinct update."""
    from unittest import mock

    import jax

    torch.manual_seed(3)
    layer = ref.HebbianConv2d(3, 5, 3, stride=1, padding=1, bias=False,
                              w_nrm=True, mode="contrastive", k=1.0,
                              patchwise=True, contrast=0.7,
                              uniformity=True, alpha=1.0)
    x_t = torch.randn(2, 3, 10, 10)
    layer.train()
    with mock.patch("torch.randperm",
                    side_effect=lambda n, **kw: torch.tensor([1, 0])):
        with pytest.raises(RuntimeError):
            layer(x_t)

    key = jax.random.PRNGKey(0)
    w = _to_jax_kernel(layer.weight)
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    x_pad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    d_u = rules.contrastive_delta(w, x_pad, key, (1, 1), False, True,
                                  contrast=0.7, uniformity=True)
    d_n = rules.contrastive_delta(w, x_pad, key, (1, 1), False, True,
                                  contrast=0.7, uniformity=False)
    assert np.isfinite(np.asarray(d_u)).all()
    assert not np.allclose(np.asarray(d_u), np.asarray(d_n))


@pytest.mark.parametrize("mode,k,ocha", [("swta_t", 12.0, 6),
                                         ("swta_t", 12.0, 40),
                                         ("hpca_t", None, 40)])
def test_convtranspose3d_rule_parity(mode, k, ocha):
    """3D transpose-conv rules vs HebbianConvTranspose3d
    (hebb3d.py:219-306), incl. the reference's PARALLEL_CHANNELS=32
    chunked unfold (ocha=40 makes its loop run twice)."""
    spec3 = importlib.util.spec_from_file_location(
        "ref_hebb3d_t", "/root/reference/hebb/hebb3d.py")
    ref3 = importlib.util.module_from_spec(spec3)
    spec3.loader.exec_module(ref3)
    torch.manual_seed(4)
    layer = ref3.HebbianConvTranspose3d(
        3, ocha, 2, stride=2, padding=0, bias=False, w_nrm=True,
        mode=mode, k=k if k else 1.0, patchwise=True, alpha=1.0)
    x_t = torch.randn(2, 3, 4, 4, 3)
    layer.train()
    y_t = layer(x_t)
    delta_ref = layer.delta_w.detach().numpy()  # (I, O, k1, k2, k3)

    w = jnp.asarray(np.transpose(layer.weight.detach().numpy(),
                                 (2, 3, 4, 0, 1)))
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 4, 1)))
    w_n = rules.normalize(w, rules.weight_norm_axes(3, True))
    y = rules.conv_transpose_fwd(x, w_n, (2, 2, 2))
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 4, 1, 2, 3)),
        y_t.detach().numpy(), atol=1e-4)
    if mode == "swta_t":
        delta = rules.swta_t_delta(w, x, y, k, (2, 2, 2))
    else:
        # chunk=32 replicates the reference's PARALLEL_CHANNELS block-
        # diagonal Sanger tril (hebb3d.py:7,300-306) — see _sanger_tril
        delta = rules.hpca_t_delta(w, x, y, (2, 2, 2), chunk=32)
    got = np.transpose(np.asarray(delta), (3, 4, 0, 1, 2))
    np.testing.assert_allclose(got, delta_ref, rtol=2e-3, atol=2e-4)


def test_conv3d_hpca_chunked_parity():
    """3D conv hpca vs HebbianConv3d with out_channels=40.  The conv
    layer's PARALLEL_CHANNELS loop chunks the INPUT axis, so its Sanger
    tril spans all outputs (hebb3d.py:144-154) — full tril, chunk=None
    (unlike the transpose layer, whose chunking is over outputs)."""
    spec3 = importlib.util.spec_from_file_location(
        "ref_hebb3d_c", "/root/reference/hebb/hebb3d.py")
    ref3 = importlib.util.module_from_spec(spec3)
    spec3.loader.exec_module(ref3)
    torch.manual_seed(5)
    layer = ref3.HebbianConv3d(40, 40, 3, stride=1, padding=1, bias=False,
                               w_nrm=True, mode="hpca", k=1.0,
                               patchwise=True, alpha=1.0)
    x_t = torch.randn(1, 40, 6, 6, 4)
    layer.train()
    layer(x_t)
    delta_ref = layer.delta_w.detach().numpy()   # (O, I, k, k, k)

    w = jnp.asarray(np.transpose(layer.weight.detach().numpy(),
                                 (2, 3, 4, 1, 0)))
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 4, 1)))
    x_pad = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    w_n = rules.normalize(w, rules.weight_norm_axes(3, False))
    y = rules.conv_fwd(x_pad, w_n, (1, 1, 1))
    delta = rules.hpca_conv_delta(w, x_pad, y, (1, 1, 1))
    got = np.transpose(np.asarray(delta), (4, 3, 0, 1, 2))
    np.testing.assert_allclose(got, delta_ref, rtol=2e-3, atol=2e-4)
