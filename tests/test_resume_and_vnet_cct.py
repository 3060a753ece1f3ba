"""Mid-run resume checkpoints + VNet_CCT model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow  # 3D model e2e: eager init is minutes on CPU
def test_vnet_cct_outputs():
    from hebbax.models import get_network
    model = get_network("vnet_cct", 1, 2)
    rngs = {"params": jax.random.PRNGKey(0),
            "perturb": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    x = jnp.zeros((1, 16, 16, 16, 1))
    v = model.init(rngs, x, train=False)
    out, _ = model.apply(v, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    assert len(out) == 4
    for o in out:
        assert o.shape == (1, 16, 16, 16, 2)


def test_resume_roundtrip(tmp_path):
    import optax

    from hebbax.engine.state import TrainState
    from hebbax.utils.checkpoint import load_train_state, save_train_state

    params = {"layer": {"kernel": jnp.ones((3, 3)),
                        "bias": jnp.zeros((3,))}}
    tx = optax.adam(1e-3)
    state = TrainState(params=params, batch_stats=None,
                       opt_state=tx.init(params), step=7)
    # advance the optimizer so its state is nontrivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, state.opt_state, params)
    state = state.replace(opt_state=opt_state,
                          params=optax.apply_updates(params, updates))

    save_train_state(state, str(tmp_path), epoch=5, best_val=[0.1, 0.5,
                                                              0.6])
    template = TrainState(params=params, batch_stats=None,
                          opt_state=tx.init(params), step=0)
    restored, meta = load_train_state(
        template, os.path.join(tmp_path, "resume.ckpt"))
    assert meta["epoch"] == 5
    assert meta["best_val"][1] == 0.5
    np.testing.assert_array_equal(np.asarray(restored.params["layer"][
        "kernel"]), np.asarray(state.params["layer"]["kernel"]))
    # adam mu restored
    r_leaves = jax.tree_util.tree_leaves(restored.opt_state)
    s_leaves = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(r_leaves, s_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_end_to_end(tmp_path):
    root = tmp_path / "GlaS"
    rng = np.random.default_rng(6)
    for split, n in (("train", 4), ("val", 2)):
        os.makedirs(root / split / "image")
        os.makedirs(root / split / "mask")
        for i in range(n):
            yy, xx = np.mgrid[:32, :32]
            m = ((yy - 16) ** 2 + (xx - 16) ** 2 < 64).astype(np.uint8)
            img = np.stack([m * 150 + 50] * 3, -1).astype(np.uint8)
            Image.fromarray(img).save(root / split / "image" / f"{i}.png")
            Image.fromarray(m * 255).save(root / split / "mask" / f"{i}.png")

    from hebbax.cli.common import base_parser_2d
    from hebbax.cli.train_sup_2d import add_args, build

    def make(num_epochs):
        args = add_args(base_parser_2d()).parse_args([
            "--path_dataset", str(root), "--dataset_name", "GlaS",
            "--path_root_exp", str(tmp_path / "runs"),
            "--regime", "100", "--batch_size", "2",
            "--num_epochs", str(num_epochs), "--validate_iter", "1",
            "--optimizer", "adam", "--lr", "1e-3", "--num_workers", "2",
            "--resume", "1",
        ])
        t = build(args)
        for ld in t.loaders.values():
            ld.dataset.size = (32, 32)
        return t

    t1 = make(2)
    t1.run()
    assert os.path.exists(os.path.join(t1.paths.checkpoints,
                                       "resume.ckpt"))
    # second invocation with more epochs resumes past epoch 2
    t2 = make(3)
    t2.run()
    import pandas as pd
    log = pd.read_csv(os.path.join(t2.paths.run, "train_log.csv"))
    assert list(log["epoch"]) == [3]  # only the resumed epoch was trained
