"""Diffusion math + DDPM model verification (VERDICT r3 item #1).

Golden-value / closed-form checks of hebbax.ops.diffusion against the
lucidrains denoising_diffusion_pytorch formulas the reference delegates to
(/root/reference/models/networks_2d/unet_ddpm.py:1-7 imports the library;
SuperDiffusion overrides at :9-116), plus oracle tests of the reverse
sampler and shape tests for DDPMUNet.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hebbax.ops import diffusion as diff


# ---------------------------------------------------------------------------
# schedules: independent re-derivations of the lucidrains closed forms
# ---------------------------------------------------------------------------

def _ref_linear(T):
    scale = 1000.0 / T
    return np.linspace(scale * 1e-4, scale * 0.02, T, dtype=np.float64)


def _ref_cosine(T, s=0.008):
    x = np.linspace(0, T, T + 1, dtype=np.float64)
    ac = np.cos(((x / T) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    return np.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999)


def _ref_sigmoid(T, start=-3.0, end=3.0, tau=1.0):
    def sig(z):
        return 1 / (1 + np.exp(-z))
    x = np.linspace(0, T, T + 1, dtype=np.float64) / T
    ac = (-sig((x * (end - start) + start) / tau) + sig(end / tau)) / (
        sig(end / tau) - sig(start / tau))
    ac = ac / ac[0]
    return np.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999)


@pytest.mark.parametrize("name,ref", [("linear", _ref_linear),
                                      ("cosine", _ref_cosine),
                                      ("sigmoid", _ref_sigmoid)])
def test_beta_schedules_match_reference_formulas(name, ref):
    T = 100
    sched = diff.make_schedule(T, "pred_noise", beta_schedule=name)
    np.testing.assert_allclose(np.asarray(sched.betas), ref(T),
                               rtol=1e-6, atol=1e-7)
    betas = np.asarray(sched.betas)
    assert betas.shape == (T,)
    assert np.all(betas > 0) and np.all(betas <= 0.999 + 1e-7)


def test_schedule_buffer_identities():
    """Every derived buffer must satisfy its defining identity."""
    T = 50
    refs = {"linear": _ref_linear, "cosine": _ref_cosine,
            "sigmoid": _ref_sigmoid}
    for name in ("linear", "cosine", "sigmoid"):
        s = diff.make_schedule(T, "pred_noise", beta_schedule=name)
        betas = refs[name](T)  # f64 — avoid f32 cumprod compounding
        ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ac,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod_prev),
                                   np.concatenate([[1.0], ac[:-1]]),
                                   rtol=1e-5)
        # sqrt(ac)^2 + sqrt(1-ac)^2 == 1  (signal + noise power)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_alphas_cumprod) ** 2
            + np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2,
            np.ones(T), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s.sqrt_recip_alphas_cumprod),
                                   np.sqrt(1 / ac), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_recipm1_alphas_cumprod),
            np.sqrt(1 / ac - 1), rtol=1e-5, atol=1e-7)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        post_var = betas * (1 - ac_prev) / (1 - ac)
        np.testing.assert_allclose(np.asarray(s.posterior_variance),
                                   post_var, rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(s.posterior_log_variance_clipped),
            np.log(np.maximum(post_var, 1e-20)), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(s.posterior_mean_coef1),
            betas * np.sqrt(ac_prev) / (1 - ac), rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(s.posterior_mean_coef2),
            (1 - ac_prev) * np.sqrt(1 - betas) / (1 - ac), rtol=1e-5)
        # at t=0 the posterior collapses onto x_start exactly
        assert abs(float(s.posterior_mean_coef1[0]) - 1.0) < 1e-6
        assert abs(float(s.posterior_mean_coef2[0])) < 1e-7
        assert float(s.posterior_variance[0]) < 1e-10


def test_loss_weight_per_objective():
    T = 40
    ac = np.asarray(diff.make_schedule(T, "pred_noise").alphas_cumprod,
                    np.float64)
    snr = ac / (1 - ac)
    np.testing.assert_allclose(
        np.asarray(diff.make_schedule(T, "pred_noise").loss_weight),
        np.ones(T), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(diff.make_schedule(T, "pred_x0").loss_weight),
        snr, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(diff.make_schedule(T, "pred_v").loss_weight),
        snr / (snr + 1), rtol=1e-5)
    with pytest.raises(ValueError):
        diff.make_schedule(T, "pred_bogus")


# ---------------------------------------------------------------------------
# forward-process identities
# ---------------------------------------------------------------------------

def test_q_sample_golden_and_roundtrips():
    T = 64
    s = diff.make_schedule(T, "pred_noise")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 8, 8, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    # avoid the last few t: sqrt(1/ac) there is O(1e3) and amplifies f32
    # rounding beyond any useful tolerance (same in the torch library)
    t = jnp.asarray([0, 7, 31, 48], jnp.int32)

    xt = diff.q_sample(s, x0, t, noise)
    # golden closed form: sqrt(ac_t) x0 + sqrt(1-ac_t) eps, per sample
    ac = np.asarray(s.alphas_cumprod, np.float64)
    for i, ti in enumerate([0, 7, 31, 48]):
        expect = (math.sqrt(ac[ti]) * np.asarray(x0[i])
                  + math.sqrt(1 - ac[ti]) * np.asarray(noise[i]))
        np.testing.assert_allclose(np.asarray(xt[i]), expect, rtol=1e-5,
                                   atol=1e-6)

    # inversions: noise <-> x0 <-> v are mutually consistent
    np.testing.assert_allclose(
        np.asarray(diff.predict_start_from_noise(s, xt, t, noise)),
        np.asarray(x0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(diff.predict_noise_from_start(s, xt, t, x0)),
        np.asarray(noise), rtol=1e-3, atol=1e-3)
    v = diff.predict_v(s, x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(diff.predict_start_from_v(s, xt, t, v)),
        np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_pred_x_start_objectives_agree():
    """All three objective parameterizations must recover the same x0."""
    T = 32
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    t = jnp.asarray([3, 20], jnp.int32)
    for obj, out in (("pred_noise", None), ("pred_x0", None),
                     ("pred_v", None)):
        s = diff.make_schedule(T, obj)
        xt = diff.q_sample(s, x0, t, noise)
        if obj == "pred_noise":
            model_out = noise
        elif obj == "pred_x0":
            model_out = x0
        else:
            model_out = diff.predict_v(s, x0, t, noise)
        rec = diff.pred_x_start(s, xt, t, model_out)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0),
                                   rtol=1e-4, atol=1e-4)
    # clip flag clamps to [-1, 1]
    s = diff.make_schedule(T, "pred_x0")
    big = jnp.full((1, 2, 2, 1), 7.0)
    assert float(jnp.max(diff.pred_x_start(s, big, jnp.zeros((1,),
                 jnp.int32), big, clip=True))) == 1.0


def test_q_posterior_hand_computed():
    # linear needs T >= 100 to keep betas < 1 (scale = 1000/T quirk kept
    # from lucidrains)
    T = 100
    s = diff.make_schedule(T, "pred_noise", beta_schedule="linear")
    x0 = jnp.ones((1, 2, 2, 1)) * 0.5
    xt = jnp.ones((1, 2, 2, 1)) * -0.25
    t = jnp.asarray([5], jnp.int32)
    mean, log_var = diff.q_posterior(s, x0, xt, t)
    betas = _ref_linear(T)  # noqa: same formula, independent code path
    ac = np.cumprod(1 - betas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    c1 = betas[5] * math.sqrt(ac_prev[5]) / (1 - ac[5])
    c2 = (1 - ac_prev[5]) * math.sqrt(1 - betas[5]) / (1 - ac[5])
    np.testing.assert_allclose(float(mean[0, 0, 0, 0]),
                               c1 * 0.5 + c2 * -0.25, rtol=1e-5)
    pv = betas[5] * (1 - ac_prev[5]) / (1 - ac[5])
    np.testing.assert_allclose(float(log_var[0, 0, 0, 0]), math.log(pv),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# SuperDiffusion semantics (p_losses / forward / conditioner routing)
# ---------------------------------------------------------------------------

def _toy_batch(n_cls=2):
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, n_cls, (2, 8, 8)), jnp.int32)
    return img, mask


def test_super_p_losses_oracle_zero_loss():
    """A model that outputs the exact objective target gives loss == 0 and
    pred == unnormalize(x_start)."""
    T = 16
    img, mask = _toy_batch()
    key = jax.random.PRNGKey(0)
    for obj in ("pred_noise", "pred_x0", "pred_v"):
        s = diff.make_schedule(T, obj)
        x0 = diff.normalize(img)
        y = jnp.zeros_like(img)
        t = jnp.asarray([2, 9], jnp.int32)

        captured = {}

        def oracle(x, tt):
            # reconstruct the target from the noised input analytically
            c = x0.shape[-1]
            xt = x[..., :c]
            captured["xt"] = xt
            if s.objective == "pred_x0":
                return x0
            if s.objective == "pred_noise":
                return diff.predict_noise_from_start(s, xt, tt, x0)
            n = diff.predict_noise_from_start(s, xt, tt, x0)
            return diff.predict_v(s, x0, tt, n)

        loss, pred = diff.super_p_losses(s, oracle, x0, y, t, key)
        assert float(loss) < 1e-6, obj
        np.testing.assert_allclose(np.asarray(pred), np.asarray(img),
                                   rtol=1e-3, atol=1e-3)


def test_super_forward_conditioner_garble_behaves_as_img():
    """The reference's live call passes conditioner='img) #' (a broken
    string literal, pretrain_superdiff_unsup_2d.py:193); anything other
    than 'target' must route identically to 'img'."""
    T = 8
    s = diff.make_schedule(T, "pred_x0")
    img, mask = _toy_batch()
    key = jax.random.PRNGKey(3)

    def model(x, t):
        return x[..., :2] * 0.1

    l_img, p_img = diff.super_forward(s, model, img, mask, key, 2,
                                      conditioner="img")
    l_g, p_g = diff.super_forward(s, model, img, mask, key, 2,
                                  conditioner="img) #")
    np.testing.assert_allclose(np.asarray(l_img), np.asarray(l_g))
    np.testing.assert_allclose(np.asarray(p_img), np.asarray(p_g))
    # and 'target' routes differently (diffuses the image stream: pred has
    # image channel count, not n_cls)
    l_t, p_t = diff.super_forward(
        s, lambda x, t: x[..., :3] * 0.1, img, mask, key, 2,
        conditioner="target")
    assert p_t.shape[-1] == 3 and p_img.shape[-1] == 2


def test_super_forward_onehot_and_shapes():
    """Integer mask is one-hot'd to n_cls channels; diffused stream is the
    mask stream under conditioner='img' (unet_ddpm.py:103-116)."""
    T = 8
    s = diff.make_schedule(T, "pred_x0")
    img, mask = _toy_batch(n_cls=3)
    seen = {}

    def model(x, t):
        seen["in"] = x.shape
        return x[..., :3]

    loss, pred = diff.super_forward(s, model, img, mask,
                                    jax.random.PRNGKey(0), 3,
                                    conditioner="img")
    assert seen["in"] == (2, 8, 8, 3 + 3)  # n_cls diffused + img cond
    assert pred.shape == (2, 8, 8, 3)
    assert np.isfinite(float(loss))


def test_super_p_losses_loss_fn_path():
    """loss_fn path (unet_ddpm.py:90-91): criterion(unnormalized pred,
    argmax(unnormalized x_start)), SNR-weighted."""
    from hebbax.ops.losses import segmentation_loss
    T = 8
    s = diff.make_schedule(T, "pred_x0")
    img, mask = _toy_batch()
    key = jax.random.PRNGKey(1)
    crit = segmentation_loss("dice", False, num_classes=2)
    onehot = jax.nn.one_hot(mask, 2).astype(jnp.float32)
    x0 = diff.normalize(onehot)
    t = jnp.asarray([1, 6], jnp.int32)

    def model(x, tt):
        return x[..., :2] * 0.2

    loss, pred = diff.super_p_losses(s, model, x0, diff.normalize(img), t,
                                     key, loss_fn=crit)
    # independently recompute: same noise draw -> same pred; loss must be
    # crit(pred, argmax(onehot)) * mean(snr[t])
    _, pred2 = diff.super_p_losses(s, model, x0, diff.normalize(img), t,
                                   key)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2))
    expect = float(crit(pred, jnp.argmax(onehot, -1))) * float(
        jnp.mean(s.loss_weight[t]))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# reverse sampler
# ---------------------------------------------------------------------------

def test_sample_mask_oracle_recovers_x0():
    """With an oracle pred_x0 model the posterior collapses onto the true
    x0 by t=0 (coef1[0]==1, coef2[0]==0, var[0]==0) — sample_mask must
    return it exactly (SuperDiffusion.sample_mask_loop contract)."""
    T = 8
    s = diff.make_schedule(T, "pred_x0")
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32)
    true_mask = jnp.asarray(rng.integers(0, 2, (1, 8, 8)), jnp.int32)
    x0_true = diff.normalize(jax.nn.one_hot(true_mask, 2).astype(
        jnp.float32))

    def oracle(x, t):
        return x0_true

    out = diff.sample_mask(s, oracle, img, jax.random.PRNGKey(0), 2)
    assert out.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.nn.one_hot(true_mask, 2)),
                               atol=1e-4)


def test_sample_mask_shapes_and_range():
    T = 4
    s = diff.make_schedule(T, "pred_noise")
    img = jnp.zeros((2, 8, 8, 1), jnp.float32)

    def model(x, t):
        return jnp.tanh(x[..., :3])

    out = jax.jit(lambda i, k: diff.sample_mask(s, model, i, k, 3))(
        img, jax.random.PRNGKey(1))
    assert out.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # clipped pred_x_start keeps the unnormalized stream within ~[0, 1]
    # plus posterior noise
    assert float(jnp.max(jnp.abs(out))) < 3.0


# ---------------------------------------------------------------------------
# DDPMUNet model
# ---------------------------------------------------------------------------

def test_ddpm_unet_modes_and_shapes():
    from hebbax.models import get_network
    model = get_network("unet_ddpm", 3, 2)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    # structure/shape assertions only -> eval_shape (zero XLA compiles;
    # the numerics of every mode are covered by the golden/oracle tests)
    b, hw = 2, 32
    probe_in = jnp.zeros((b, hw, hw, 2))
    v = jax.eval_shape(
        lambda x: model.init(rngs, x, mode="probe", train=False),
        probe_in)
    t = jnp.zeros((b,), jnp.int32)
    for mode, out_ch in (("net", 3), ("net_seg", 2)):
        xin = jnp.zeros((b, hw, hw, 5))
        v2 = jax.eval_shape(
            lambda x, tt: model.init(rngs, x, tt, mode=mode, train=False),
            xin, t)
        y = jax.eval_shape(
            lambda vv, x, tt: model.apply(vv, x, tt, mode=mode,
                                          train=False), v2, xin, t)
        assert y.shape == (b, hw, hw, out_ch), mode
        assert mode in v2["params"]
    y = jax.eval_shape(
        lambda vv, x: model.apply(vv, x, mode="probe", train=False),
        v, probe_in)
    assert y.shape == (b, hw, hw, 2)
    assert "final_conv" in v["params"]
    with pytest.raises(ValueError):
        jax.eval_shape(
            lambda vv, x: model.apply(vv, x, mode="bogus", train=False),
            v, probe_in)


def test_sinusoidal_pos_emb():
    from hebbax.models.ddpm import sinusoidal_pos_emb
    t = jnp.asarray([0, 5], jnp.int32)
    emb = sinusoidal_pos_emb(t, 64)
    assert emb.shape == (2, 64)
    # t=0: sin part all 0, cos part all 1
    np.testing.assert_allclose(np.asarray(emb[0, :32]), np.zeros(32),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), np.ones(32),
                               atol=1e-7)
    # golden: dim k frequency 10000^{-k/(half-1)}
    np.testing.assert_allclose(float(emb[1, 0]), math.sin(5.0), rtol=1e-5)
    np.testing.assert_allclose(
        float(emb[1, 31]), math.sin(5.0 * 10000 ** (-31 / 31)), rtol=1e-4)
