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
