"""Model zoo tests: output shapes/structures, parameter-count parity with
the reference architectures, resize-op parity vs torch semantics, and
Hebbian delta sowing through full models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebbax.hebb.spec import HebbSpec
from hebbax.models import get_network, network_meta, primary_logits
from hebbax.models.common import (resize_linear_align_corners,
                                  resize_nearest_torch)

RNGS_2D = {"params": jax.random.PRNGKey(0),
           "dropout": jax.random.PRNGKey(1),
           "perturb": jax.random.PRNGKey(2),
           "latent": jax.random.PRNGKey(3)}


def _init_and_apply(name, x, n_cls=2, train=False, hebb=None):
    # deliberately EAGER: per-op XLA CPU compiles are shared process-wide
    # across tests (measured faster than per-test whole-program jits)
    model = get_network(name, x.shape[-1], n_cls, hebb=hebb)
    variables = model.init(RNGS_2D, x, train=False)
    out = model.apply(variables, x, train=train, rngs=RNGS_2D,
                      mutable=["batch_stats", "hebb"] if train else False)
    if train:
        return out[0], out[1], variables
    return out, {}, variables


def _init_and_apply_shapes(name, x, n_cls=2, hebb=None):
    """Shape-only twin of _init_and_apply via jax.eval_shape: pure
    abstract tracing, ZERO compile — structural/param-count tests on the
    big 3D nets run in ~1 s instead of ~30 s of CPU compiles."""
    model = get_network(name, x.shape[-1], n_cls, hebb=hebb)
    variables = jax.eval_shape(
        lambda xx: model.init(RNGS_2D, xx, train=False), x)
    out = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False, rngs=RNGS_2D),
        variables, x)
    return out, variables


def _n_params(variables):
    return sum(int(np.prod(p.shape))
               for p in jax.tree.leaves(variables["params"]))


def test_resize_bilinear_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).rand(2, 3, 7, 9).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(x), size=(14, 18), mode="bilinear",
        align_corners=True).numpy()
    got = resize_linear_align_corners(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (14, 18))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               atol=1e-5)


def test_resize_trilinear_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(1).rand(1, 2, 4, 5, 6).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(x), size=(8, 10, 12), mode="trilinear",
        align_corners=True).numpy()
    got = resize_linear_align_corners(
        jnp.asarray(np.moveaxis(x, 1, -1)), (8, 10, 12))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref,
                               atol=1e-5)


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(2).rand(2, 2, 16, 16).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(x), size=(128, 128), mode="nearest").numpy()
    got = resize_nearest_torch(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (128, 128))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), ref)


def test_unet2d_shape_and_param_count():
    x = jnp.zeros((2, 128, 128, 3))
    out, _, variables = _init_and_apply("unet", x)
    assert out.shape == (2, 128, 128, 2)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # torch UNet_Transposed_Leaky(3, 2): 1,841,794 parameters (counted from
    # the reference model; BN affine included).
    assert n_params == 1841794


def test_unet2d_eval_deterministic():
    x = jnp.ones((1, 64, 64, 3))
    model = get_network("unet", 3, 2)
    variables = model.init(RNGS_2D, x, train=False)
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name,n_out", [("unet_urpc", 4), ("unet_cct", 4)])
def test_multihead_2d(name, n_out):
    x = jnp.zeros((2, 64, 64, 1))
    out, _, _ = _init_and_apply(name, x, train=True)
    assert len(out) == n_out
    for o in out:
        assert o.shape == (2, 64, 64, 2)
    assert primary_logits(name, out) is out[0]


def test_vae_2d_outputs():
    x = jnp.zeros((2, 64, 64, 3))
    out, _, _ = _init_and_apply("unet_vae", x, train=True)
    assert set(out) == {"output", "mu", "log_var", "reconstr"}
    assert out["output"].shape == (2, 64, 64, 2)
    assert out["mu"].shape == (2, 4, 4, 256)
    assert out["reconstr"].shape == (2, 64, 64, 3)


def test_superpix_2d_outputs():
    x = jnp.zeros((2, 64, 64, 3))
    out, _, _ = _init_and_apply("unet_superpix", x)
    seg, sp = out
    assert seg.shape == (2, 64, 64, 2)
    assert sp.shape == (2, 64, 64, 2)


@pytest.mark.parametrize("name", ["unet3d", "unet3d_min"])
def test_unet3d_shape(name):
    x = jnp.zeros((1, 32, 32, 16, 1))
    out, _ = _init_and_apply_shapes(name, x)
    assert out.shape == (1, 32, 32, 16, 2)


def test_unet3d_param_count():
    x = jnp.zeros((1, 16, 16, 16, 1))
    _, variables = _init_and_apply_shapes("unet3d", x)
    # torch UNet3D(1, 2, init_features=64): 90,304,514 parameters.
    assert _n_params(variables) == 90304514


@pytest.mark.slow  # value assertion (tanh range) needs a real compile;
def test_unet3d_dtc_outputs():  # shapes covered fast just below
    x = jnp.zeros((1, 16, 16, 16, 1))
    out, _, _ = _init_and_apply("unet3d_dtc", x)
    sdf, seg = out
    assert sdf.shape == seg.shape == (1, 16, 16, 16, 2)
    assert np.all(np.abs(np.asarray(sdf)) <= 1.0)


def test_unet3d_dtc_shapes():
    x = jnp.zeros((1, 16, 16, 16, 1))
    out, _ = _init_and_apply_shapes("unet3d_dtc", x)
    sdf, seg = out
    assert sdf.shape == seg.shape == (1, 16, 16, 16, 2)


def test_unet3d_urpc_outputs():
    x = jnp.zeros((1, 16, 16, 16, 1))
    out, _ = _init_and_apply_shapes("unet3d_urpc", x)
    assert len(out) == 4
    for o in out:
        assert o.shape == (1, 16, 16, 16, 2)


def test_vnet_shape():
    x = jnp.zeros((1, 32, 32, 16, 1))
    out, _ = _init_and_apply_shapes("vnet", x)
    assert out.shape == (1, 32, 32, 16, 2)


def test_vnet_param_count():
    x = jnp.zeros((1, 16, 16, 16, 1))
    _, variables = _init_and_apply_shapes("vnet", x)
    # torch VNet(1, 2, elu=True): 45,600,316 parameters.
    assert _n_params(variables) == 45600316


def test_hebbian_deltas_sown_everywhere_except_excluded():
    spec = HebbSpec(mode="swta_t", k=50, alpha=1.0,
                    exclude=("out_conv",))
    x = jnp.ones((2, 32, 32, 3))
    model = get_network("unet", 3, 2, hebb=spec)
    variables = jax.jit(
        lambda xx: model.init(RNGS_2D, xx, train=False))(x)
    _, state = jax.jit(lambda v, xx: model.apply(
        v, xx, train=True, rngs=RNGS_2D,
        mutable=["batch_stats", "hebb"]))(variables, x)
    hebb = state["hebb"]
    import flax.traverse_util as tu
    flat = tu.flatten_dict(hebb)
    paths = {".".join(p[:-1]) for p in flat}
    assert not any(p.startswith("out_conv") for p in paths)
    # every encoder/decoder conv sows exactly one delta
    assert any(p.startswith("encoder.in_conv") for p in paths)
    assert any(p.startswith("main_decoder.up1") for p in paths)
    # delta shape matches the kernel shape
    params = tu.flatten_dict(variables["params"])
    for p, delta in flat.items():
        kernel = params[p[:-1] + ("kernel",)]
        # custom reduce_fn makes sow store the accumulated array directly
        assert jnp.asarray(delta).shape == kernel.shape


def test_hebbian_param_shapes_equal_plain():
    """Checkpoint compatibility: hebbian and plain variants share the
    exact parameter tree (the reference re-runs makehebbian surgery to
    load; we need nothing)."""
    x = jnp.ones((1, 32, 32, 3))
    plain = get_network("unet", 3, 2)
    hebb = get_network("unet", 3, 2, hebb=HebbSpec(exclude=("out_conv",)))
    vp = jax.eval_shape(lambda xx: plain.init(RNGS_2D, xx, train=False), x)
    vh = jax.eval_shape(lambda xx: hebb.init(RNGS_2D, xx, train=False), x)
    sp = jax.tree.map(lambda a: a.shape, vp["params"])
    sh = jax.tree.map(lambda a: a.shape, vh["params"])
    assert sp == sh
