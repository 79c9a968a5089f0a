"""Deterministic DDIM sampler with classifier-free guidance.

Reimplements Diffuser (/root/reference/src/model/stablediffusion/mod.rs:269-542)
TPU-first: the whole denoising loop compiles into a single ``lax.scan`` —
the reference's per-step `get_alpha` device->host syncs (:485-492)
disappear because the ᾱ values are gathered on-chip before the scan.

Semantics preserved:
  - timestep schedule t = (0..1000-step_start).rev().step_by(1000/n_steps)
    (:400-406) — note 30 "steps" yields 31 UNet iterations, as in the
    reference
  - deterministic DDIM update, sigma = 0 hardcoded (:402, 414-428)
  - CFG: eps = u + (c - u)*scale (:539-540), but PAIR-BATCHED in one UNet
    call (the reference computes uncond/cond in two calls; its own
    commented-out design :145-152 is restored here — on TPU one batched
    call keeps the MXU saturated)
  - the refiner skips the unconditional pass entirely (:528-530)
  - inpainting pins the non-masked region to the re-noised reference each
    step BEFORE the UNet call (:462-465); mask true = generated region
  - refine_latent re-noises at t = 1000 - step_start then runs the tail of
    the schedule (:355-376)
  - noise is N(0,1) in latent space [B, h/8, w/8, 4]; unlike the reference
    (fresh unseeded RNG, :378-388) sampling takes an explicit PRNGKey

Latent state is carried in float32 through the scan for update-rule
accuracy; the UNet runs in bf16 (reference: f16 UNet, sample/main.rs:122).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DiffuserConfig
from ..models.unet import unet_forward
from .conditioning import Conditioning

N_STEPS_TOTAL = 1000  # DDPM table length (stablediffusion/mod.rs:282)


def scaled_linear_alphas_cumprod(n_steps: int = N_STEPS_TOTAL) -> np.ndarray:
    """Standard SD scaled-linear beta schedule -> cumulative alphas.

    The reference ships this table inside the weight dump
    (LegacyDDPMDiscretization, python/dump.py:27-31); this reproduces it for
    runs without a checkpoint and matches the dumped table to f32 precision.
    """
    betas = np.linspace(0.00085**0.5, 0.012**0.5, n_steps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def cosine_schedule(n_steps: int = N_STEPS_TOTAL) -> np.ndarray:
    """Signal-rate cosine schedule (stablediffusion/mod.rs:805-810).

    Vestigial in the reference (the real ᾱ table ships with the weights)
    but part of its public surface; kept for parity.
    """
    times = np.arange(1, n_steps + 1, dtype=np.float64)
    return np.cos(times * (np.pi * 0.5 / n_steps)).astype(np.float32)


def offset_cosine_schedule(n_steps: int = N_STEPS_TOTAL) -> np.ndarray:
    """Offset cosine signal rates, min/max 0.02/0.95 (mod.rs:812-822)."""
    min_signal_rate, max_signal_rate = 0.02, 0.95
    start_angle = np.arccos(max_signal_rate)
    end_angle = np.arccos(min_signal_rate)
    times = np.arange(1, n_steps + 1, dtype=np.float64)
    angles = times * ((end_angle - start_angle) / n_steps) + start_angle
    return np.cos(angles).astype(np.float32)


def offset_cosine_schedule_cumprod(n_steps: int = N_STEPS_TOTAL) -> np.ndarray:
    """Squared offset-cosine signal rates = ᾱ table (mod.rs:824-829)."""
    return (offset_cosine_schedule(n_steps) ** 2).astype(np.float32)


def ddim_timesteps(step_start: int, n_steps: int) -> np.ndarray:
    """(0..1000-step_start).rev().step_by(1000/n_steps) (mod.rs:400-406)."""
    step_size = N_STEPS_TOTAL // n_steps
    hi = N_STEPS_TOTAL - step_start
    return np.arange(hi - 1, -1, -step_size, dtype=np.int32)


def _cfg_contexts(cfg: DiffuserConfig, cond: Conditioning, compute_dtype):
    """Scan-invariant context/channel tensors for forward_diffuser
    (mod.rs:494-541): the refiner feeds the OpenCLIP context only and skips
    CFG; the base gets the [uncond | cond] pair for one batched call."""
    if cfg.is_refiner:
        return (
            cond.context_open_clip.astype(compute_dtype),
            cond.channel_context_refiner.astype(compute_dtype),
        )
    ctx = cond.context_full
    ch = cond.channel_context
    uctx = jnp.broadcast_to(cond.unconditional_context_full, ctx.shape)
    uch = jnp.broadcast_to(cond.unconditional_channel_context, ch.shape)
    return (
        jnp.concatenate([uctx, ctx], axis=0).astype(compute_dtype),
        jnp.concatenate([uch, ch], axis=0).astype(compute_dtype),
    )


def _cfg_eps(unet_params, cfg: DiffuserConfig, latent, t, ctx2, ch2,
             guidance_scale, compute_dtype):
    """One guided epsilon prediction (forward_diffuser, mod.rs:494-541)."""
    n_batch = latent.shape[0]
    ucfg = cfg.unet_config()

    if cfg.is_refiner:
        t_vec = jnp.broadcast_to(t, (n_batch,))
        return unet_forward(
            unet_params, ucfg, latent.astype(compute_dtype), t_vec, ctx2, ch2
        ).astype(jnp.float32)

    # pair-batched CFG: [uncond | cond] in one UNet call
    x2 = jnp.concatenate([latent, latent], axis=0).astype(compute_dtype)
    t2 = jnp.broadcast_to(t, (2 * n_batch,))
    eps2 = unet_forward(unet_params, ucfg, x2, t2, ctx2, ch2).astype(jnp.float32)
    eps_u, eps_c = jnp.split(eps2, 2, axis=0)
    return eps_u + (eps_c - eps_u) * guidance_scale


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "step_start", "n_steps", "compute_dtype", "inpaint"),
    donate_argnames=("latent",),
)
def diffuse_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod: jnp.ndarray,
    latent: jnp.ndarray,
    cond: Conditioning,
    guidance_scale: float,
    step_start: int = 0,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """DDIM loop as one lax.scan (diffuse_latent, mod.rs:390-483)."""
    step_size = N_STEPS_TOTAL // n_steps
    ts = jnp.asarray(ddim_timesteps(step_start, n_steps))
    a_t = alphas_cumprod[ts]
    a_prev = jnp.where(ts >= step_size, alphas_cumprod[ts - step_size], 1.0)

    latent = latent.astype(jnp.float32)
    if inpaint:
        reference = reference.astype(jnp.float32)
        keys = jax.random.split(key, ts.shape[0])
    else:
        keys = jnp.zeros((ts.shape[0], 2), dtype=jnp.uint32)

    # loop-invariant conditioning hoisted out of the scan
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype)

    def step(lat, inp):
        t, alpha, alpha_prev, k = inp
        if inpaint:
            noise = jax.random.normal(k, lat.shape, jnp.float32)
            noised_ref = reference * jnp.sqrt(alpha) + noise * jnp.sqrt(1.0 - alpha)
            lat = jnp.where(mask, lat, noised_ref)

        eps = _cfg_eps(unet_params, cfg, lat, t, ctx2, ch2, guidance_scale,
                       compute_dtype)
        sqrt_noise = jnp.sqrt(1.0 - alpha)
        x0 = (lat - eps * sqrt_noise) / jnp.sqrt(alpha)
        lat = x0 * jnp.sqrt(alpha_prev) + eps * jnp.sqrt(1.0 - alpha_prev)
        return lat, None

    latent, _ = jax.lax.scan(step, latent, (ts, a_t, a_prev, keys))
    return latent


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "compute_dtype"),
    donate_argnames=("latent",),
)
def euler_diffuse_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod: jnp.ndarray,
    latent: jnp.ndarray,  # N(0,1) noise; scaled by sigma_max inside
    cond: Conditioning,
    guidance_scale: float,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Euler discrete sampler (capability extension; BASELINE config #1).

    Standard k-diffusion/EulerDiscrete update over sigmas derived from the
    same ᾱ table the DDIM path uses (σ = sqrt((1-ᾱ)/ᾱ)): the UNet input is
    scaled by 1/sqrt(σ²+1), denoised = x - σ·ε̂, x += (σ_next - σ)·(x -
    denoised)/σ. Deterministic (no churn), seeded via the initial noise.
    """
    n_train = alphas_cumprod.shape[0]
    sigmas_full = jnp.sqrt(
        (1.0 - alphas_cumprod.astype(jnp.float32)) / alphas_cumprod
    )
    # diffusers-style linearly spaced timesteps, high -> low (static)
    ts = np.linspace(0, n_train - 1, n_steps).round()[::-1].astype(np.int32)
    sigmas = jnp.concatenate(
        [sigmas_full[jnp.asarray(ts)], jnp.zeros((1,), jnp.float32)]
    )

    latent = latent.astype(jnp.float32) * sigmas[0]
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype)

    def step(lat, inp):
        t, sigma, sigma_next = inp
        scaled = lat / jnp.sqrt(sigma**2 + 1.0)
        eps = _cfg_eps(unet_params, cfg, scaled, t, ctx2, ch2, guidance_scale,
                       compute_dtype)
        denoised = lat - sigma * eps
        d = (lat - denoised) / sigma
        return lat + d * (sigma_next - sigma), None

    latent, _ = jax.lax.scan(
        step, latent, (jnp.asarray(ts), sigmas[:-1], sigmas[1:])
    )
    return latent


def euler_sample_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    return euler_diffuse_latent(
        unet_params, cfg, alphas_cumprod, gen_noise(key, cond), cond,
        guidance_scale, n_steps, compute_dtype,
    )


def gen_noise(key, cond: Conditioning) -> jnp.ndarray:
    """Initial latent noise [B, h/8, w/8, 4] (gen_noise, mod.rs:378-388)."""
    h, w = cond.resolution
    return jax.random.normal(
        key, (cond.batch, h // 8, w // 8, 4), dtype=jnp.float32
    )


def sample_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """txt2img (+ optional latent-mask inpainting) (mod.rs:316-353)."""
    noise_key, inpaint_key = jax.random.split(key)
    latent = gen_noise(noise_key, cond)
    if reference is not None:
        return diffuse_latent(
            unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
            0, n_steps, compute_dtype,
            inpaint=True, reference=reference, mask=mask, key=inpaint_key,
        )
    return diffuse_latent(
        unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
        0, n_steps, compute_dtype,
    )


def refine_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    latent: jnp.ndarray,
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    step_start: int = 800,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Refiner stage: re-noise at t = 1000 - step_start, run the schedule
    tail (refine_latent, mod.rs:355-376)."""
    t = N_STEPS_TOTAL - step_start
    start_alpha = alphas_cumprod[t]
    noise = jax.random.normal(key, latent.shape, jnp.float32)
    noised = (
        latent.astype(jnp.float32) * jnp.sqrt(start_alpha)
        + noise * jnp.sqrt(1.0 - start_alpha)
    )
    return diffuse_latent(
        unet_params, cfg, alphas_cumprod, noised, cond, guidance_scale,
        step_start, n_steps, compute_dtype,
    )
