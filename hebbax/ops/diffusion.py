"""Gaussian diffusion math (functional JAX).

Replaces the reference's dependency on lucidrains'
denoising_diffusion_pytorch and reproduces its SuperDiffusion subclass
(/root/reference/models/networks_2d/unet_ddpm.py:9-176): the diffused
variable is channel-concatenated with a conditioner (image<->mask),
objectives pred_noise / pred_x0 / pred_v, SNR loss weighting, and a
reverse-process mask sampler.

Schedules follow lucidrains: 'linear' (scaled 1e-4..2e-2), 'cosine',
'sigmoid' (current upstream default).
"""

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps):
    scale = 1000 / timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, timesteps,
                       dtype=np.float64)


def cosine_beta_schedule(timesteps, s=0.008):
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    alphas_cumprod = np.cos((t + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def sigmoid_beta_schedule(timesteps, start=-3, end=3, tau=1):
    steps = timesteps + 1
    t = np.linspace(0, timesteps, steps, dtype=np.float64) / timesteps
    v_start = 1 / (1 + np.exp(-start / tau))
    v_end = 1 / (1 + np.exp(-end / tau))
    alphas_cumprod = (-1 / (1 + np.exp(-((t * (end - start) + start) / tau)))
                      + v_end) / (v_end - v_start)
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


_SCHEDULES = {"linear": linear_beta_schedule,
              "cosine": cosine_beta_schedule,
              "sigmoid": sigmoid_beta_schedule}


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed buffers (all (T,) float32 jnp arrays)."""

    timesteps: int
    objective: str
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    loss_weight: jnp.ndarray


def make_schedule(timesteps=1000, objective="pred_noise",
                  beta_schedule="sigmoid") -> DiffusionSchedule:
    betas = _SCHEDULES[beta_schedule](timesteps)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
    snr = ac / (1 - ac)
    if objective == "pred_noise":
        loss_weight = snr / snr
    elif objective == "pred_x0":
        loss_weight = snr
    elif objective == "pred_v":
        loss_weight = snr / (snr + 1)
    else:
        raise ValueError(objective)
    f = lambda x: jnp.asarray(x, jnp.float32)
    return DiffusionSchedule(
        timesteps=timesteps, objective=objective,
        betas=f(betas), alphas_cumprod=f(ac),
        alphas_cumprod_prev=f(ac_prev),
        sqrt_alphas_cumprod=f(np.sqrt(ac)),
        sqrt_one_minus_alphas_cumprod=f(np.sqrt(1 - ac)),
        sqrt_recip_alphas_cumprod=f(np.sqrt(1 / ac)),
        sqrt_recipm1_alphas_cumprod=f(np.sqrt(1 / ac - 1)),
        posterior_variance=f(posterior_variance),
        posterior_log_variance_clipped=f(
            np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f(betas * np.sqrt(ac_prev) / (1 - ac)),
        posterior_mean_coef2=f((1 - ac_prev) * np.sqrt(alphas) / (1 - ac)),
        loss_weight=f(loss_weight))


def _extract(buf, t, ndim):
    return buf[t].reshape((-1,) + (1,) * (ndim - 1))


def q_sample(sched, x_start, t, noise):
    return (_extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(sched.sqrt_one_minus_alphas_cumprod, t,
                       x_start.ndim) * noise)


def predict_start_from_noise(sched, x_t, t, noise):
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
            * noise)


def predict_noise_from_start(sched, x_t, t, x0):
    return ((_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
             - x0)
            / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))


def predict_v(sched, x_start, t, noise):
    return (_extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - _extract(sched.sqrt_one_minus_alphas_cumprod, t,
                       x_start.ndim) * x_start)


def predict_start_from_v(sched, x_t, t, v):
    return (_extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim)
            * v)


def pred_x_start(sched, x_t, t, model_output, clip=False):
    """SuperDiffusion.model_predictions (unet_ddpm.py:10-33)."""
    if sched.objective == "pred_noise":
        x0 = predict_start_from_noise(sched, x_t, t, model_output)
    elif sched.objective == "pred_x0":
        x0 = model_output
    else:
        x0 = predict_start_from_v(sched, x_t, t, model_output)
    if clip:
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def q_posterior(sched, x_start, x_t, t):
    mean = (_extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t)
    log_var = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, log_var


def normalize(x):
    return x * 2.0 - 1.0


def unnormalize(x):
    return (x + 1.0) * 0.5


def super_p_losses(sched, apply_model: Callable, x_start, y_start, t, key,
                   loss_fn=None):
    """SuperDiffusion.p_losses (unet_ddpm.py:35-101): noise x_start,
    concat the conditioner y_start, model predicts on the concatenated
    input.  loss_fn=None -> MSE to the objective target on the x channels;
    loss_fn given -> loss_fn(unnormalized pred_x0, argmax of unnormalized
    x_start) as in the reference's live call
    (pretrain_superdiff_unsup_2d.py:193, unet_ddpm.py:90-91).  Either way
    SNR-weighted.  Returns (loss, unnormalized pred_x0)."""
    c_in = x_start.shape[-1]
    noise = jax.random.normal(key, x_start.shape, x_start.dtype)
    x = q_sample(sched, x_start, t, noise)
    x = jnp.concatenate([x, y_start], axis=-1)
    model_out = apply_model(x, t)
    pred = pred_x_start(sched, x[..., :c_in], t, model_out)
    if loss_fn is None:
        if sched.objective == "pred_noise":
            target = predict_noise_from_start(sched, x[..., :c_in], t,
                                              x_start[..., :c_in])
        elif sched.objective == "pred_x0":
            target = x_start[..., :c_in]
        else:
            target = predict_v(sched, x_start[..., :c_in], t,
                               noise[..., :c_in])
        loss = jnp.mean((model_out - target) ** 2)
    else:
        loss = loss_fn(unnormalize(pred),
                       jnp.argmax(unnormalize(x_start), axis=-1))
    w = jnp.mean(_extract(sched.loss_weight, t, 1))
    return loss * w, unnormalize(pred)


def super_forward(sched, apply_model, img, target_mask, key, n_classes,
                  conditioner="img", loss_fn=None):
    """SuperDiffusion.forward (unet_ddpm.py:103-116): one-hot + normalize
    both streams, sample t ~ U{0, T}, route (x, y) by conditioner.  Any
    conditioner string other than 'target' routes like 'img' — including
    the reference's live garbled value 'img) #'
    (pretrain_superdiff_unsup_2d.py:193)."""
    k_t, k_n = jax.random.split(key)
    if target_mask.ndim == img.ndim - 1:
        onehot = jax.nn.one_hot(target_mask.astype(jnp.int32), n_classes)
    else:
        onehot = target_mask
    onehot = onehot.astype(img.dtype)
    t = jax.random.randint(k_t, (img.shape[0],), 0, sched.timesteps)
    img_n, tgt_n = normalize(img), normalize(onehot)
    if conditioner == "target":
        return super_p_losses(sched, apply_model, img_n, tgt_n, t, k_n,
                              loss_fn=loss_fn)
    return super_p_losses(sched, apply_model, tgt_n, img_n, t, k_n,
                          loss_fn=loss_fn)


def sample_mask(sched, apply_model, img, key, n_classes,
                conditioner="img"):
    """Reverse-process sampling of the diffused stream conditioned on the
    other (SuperDiffusion.sample_mask_loop, unet_ddpm.py:145-176)."""
    onehot = jnp.concatenate(
        [jnp.zeros(img.shape[:-1] + (1,), img.dtype),
         jnp.ones(img.shape[:-1] + (1,), img.dtype)], axis=-1
    ) if n_classes == 2 else jnp.zeros(img.shape[:-1] + (n_classes,),
                                       img.dtype)
    img_n, tgt_n = normalize(img), normalize(onehot)
    x_start, y_start = ((img_n, tgt_n) if conditioner == "target"
                        else (tgt_n, img_n))
    c_in = x_start.shape[-1]
    b = img.shape[0]
    k0, key = jax.random.split(key)
    noise = jax.random.normal(k0, x_start.shape, x_start.dtype)
    t_full = jnp.full((b,), sched.timesteps - 1, jnp.int32)
    x = q_sample(sched, x_start, t_full, noise)

    def body(i, carry):
        x, key = carry
        t = sched.timesteps - 1 - i
        tb = jnp.full((b,), t, jnp.int32)
        model_out = apply_model(jnp.concatenate([x, y_start], axis=-1), tb)
        x0 = jnp.clip(pred_x_start(sched, x, tb, model_out), -1.0, 1.0)
        mean, log_var = q_posterior(sched, x0, x, tb)
        key, kn = jax.random.split(key)
        z = jax.random.normal(kn, mean.shape, mean.dtype)
        x_new = mean + jnp.where(t > 0, jnp.exp(0.5 * log_var), 0.0) * z
        return x_new, key

    x, _ = jax.lax.fori_loop(0, sched.timesteps, body, (x, key))
    return unnormalize(x[..., :c_in])
