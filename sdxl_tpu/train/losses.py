"""Training losses for the served model families.

Capability extension (no training exists in the reference). Two loss
families, matching the two sampler families the framework ships:

  - ``diffusion_loss``: the DDPM epsilon / v-prediction MSE over the
    same scaled-linear alpha-bar table the inference DDIM/k-samplers use
    (pipeline/sampler.py:57), with the two standard quality knobs:
    min-SNR-gamma loss weighting (arXiv:2303.09556 — the exact diffusers
    ``compute_snr`` recipe: eps weight min(snr,g)/snr, v weight
    min(snr,g)/(snr+1), pinned in tests/test_train_losses.py) and noise
    offset (per-sample constant added to the noise, the brightness-range
    trick from crosslabs' noise-offset post; kohya's --noise_offset).
  - ``flow_matching_loss``: the rectified-flow / conditional-flow-
    matching loss of SD3 (arXiv:2403.03206 §3: x_t = (1-t) x0 + t eps,
    velocity target eps - x0) and FLUX.1, with logit-normal timestep
    sampling (the paper's best-performing density, m=0 s=1) and the
    SD3 static time shift sigma = s*u / (1 + (s-1) u).

Both take an ``apply_fn(params, x_t, t, batch) -> prediction`` closure
so the same loss serves the UNet families (SDXL/SD1/SD2), MMDiT and
Flux; the batch dict carries whatever conditioning the closure needs.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _reduce(per_sample: jnp.ndarray, batch: dict) -> jnp.ndarray:
    """Batch reduction. Plain mean by default; an optional per-example
    ``batch["loss_weight"]`` [B] turns it into sum(per_sample * weight) —
    the caller owns normalization, which lets one batch express composed
    objectives exactly (DreamBooth prior preservation: instance rows get
    1/B_inst, class rows prior_weight/B_class, so the total equals
    mean(instance) + w * mean(class) — diffusers' train_dreambooth.py
    two-chunk loss, here in a single fused forward)."""
    lw = batch.get("loss_weight")
    if lw is not None:
        return jnp.sum(per_sample * lw.astype(jnp.float32))
    return jnp.mean(per_sample)


def snr_from_alphas(alphas_cumprod: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio per train timestep: ab / (1 - ab)."""
    ab = alphas_cumprod.astype(jnp.float32)
    return ab / (1.0 - ab)


def min_snr_weight(
    snr_t: jnp.ndarray, gamma: float, prediction_type: str
) -> jnp.ndarray:
    """Min-SNR-gamma per-sample loss weight (arXiv:2303.09556; the
    diffusers train_text_to_image.py formulation)."""
    clipped = jnp.minimum(snr_t, jnp.float32(gamma))
    if prediction_type == "epsilon":
        return clipped / snr_t
    if prediction_type == "v":
        return clipped / (snr_t + 1.0)
    raise ValueError(prediction_type)


def multires_noise(key, shape, iterations: int = 6,
                   discount: float = 0.3) -> jnp.ndarray:
    """Multi-resolution ("pyramid") noise: base gaussian plus coarser
    gaussians (each at 1/2^i the spatial grid, bilinearly upsampled)
    scaled by discount^i, renormalized to unit std. The kohya
    multires_noise recipe with the deterministic power-of-2 ladder —
    static shapes per level, so the whole draw stays jittable. Improves
    very-dark/very-bright reproduction like noise offset but with
    spatial structure."""
    noise = jax.random.normal(key, shape, jnp.float32)
    b, h, w, c = shape
    for i in range(1, iterations):
        r = 2 ** i
        if h // r < 1 or w // r < 1:
            break
        small = jax.random.normal(
            jax.random.fold_in(key, 1000 + i),
            (b, h // r, w // r, c), jnp.float32)
        noise = noise + jax.image.resize(
            small, shape, "bilinear") * (discount ** i)
    return noise / jnp.std(noise)


def diffusion_loss(
    apply_fn: Callable,
    params,
    alphas_cumprod: jnp.ndarray,
    batch: dict,
    key,
    prediction_type: str = "epsilon",
    snr_gamma: Optional[float] = None,
    noise_offset: float = 0.0,
    multires_iterations: int = 0,
    multires_discount: float = 0.3,
) -> jnp.ndarray:
    """DDPM noise-prediction MSE on a batch of clean LATENTS.

    batch["latents"]: [B, h, w, c] (VAE-encoded, already scaled by the
    latent scale factor — the same tensors the sampler denoises).
    t ~ U{0..N-1}; x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps; target eps
    (or v = sqrt(ab_t) eps - sqrt(1-ab_t) x0, the SD2.1-768 family's
    parameterization — the exact inverse of the sampler-side v->eps
    conversion in pipeline/sampler.py)."""
    x0 = batch["latents"]
    b = x0.shape[0]
    n_train = alphas_cumprod.shape[0]
    k_t, k_n, k_off = jax.random.split(key, 3)
    t = jax.random.randint(k_t, (b,), 0, n_train)
    if multires_iterations:
        noise = multires_noise(k_n, x0.shape, multires_iterations,
                               multires_discount)
    else:
        noise = jax.random.normal(k_n, x0.shape, jnp.float32)
    if noise_offset:
        noise = noise + noise_offset * jax.random.normal(
            k_off, (b,) + (1,) * (x0.ndim - 1), jnp.float32
        )
    ab_t = alphas_cumprod.astype(jnp.float32)[t].reshape(
        (b,) + (1,) * (x0.ndim - 1)
    )
    sq, sq1 = jnp.sqrt(ab_t), jnp.sqrt(1.0 - ab_t)
    x_t = sq * x0.astype(jnp.float32) + sq1 * noise
    pred = apply_fn(params, x_t, t, batch).astype(jnp.float32)
    if prediction_type == "epsilon":
        target = noise
    elif prediction_type == "v":
        target = sq * noise - sq1 * x0.astype(jnp.float32)
    else:
        raise ValueError(prediction_type)
    per_sample = jnp.mean(
        jnp.square(pred - target), axis=tuple(range(1, x0.ndim))
    )
    if snr_gamma is not None:
        snr_t = snr_from_alphas(alphas_cumprod)[t]
        per_sample = per_sample * min_snr_weight(
            snr_t, snr_gamma, prediction_type
        )
    return _reduce(per_sample, batch)


def logit_normal_t(key, shape, mean: float = 0.0, std: float = 1.0):
    """t in (0,1) with logit-normal density (SD3 §5.3.1, m=0 s=1)."""
    return jax.nn.sigmoid(mean + std * jax.random.normal(key, shape))


def shift_time(u: jnp.ndarray, shift: float) -> jnp.ndarray:
    """SD3's static timestep shift: sigma = s*u / (1 + (s-1)*u) —
    identical to diffusers' FlowMatchEulerDiscreteScheduler shift (the
    inference-side grid uses the same map, pipeline/sd3.py)."""
    return shift * u / (1.0 + (shift - 1.0) * u)


def flow_matching_loss(
    apply_fn: Callable,
    params,
    batch: dict,
    key,
    shift: float = 1.0,
    time_sampling: str = "logit_normal",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
) -> jnp.ndarray:
    """Rectified-flow velocity-matching MSE (SD3 / FLUX.1 families).

    x_t = (1 - sigma) x0 + sigma eps; the model predicts the velocity
    d x_t / d sigma = eps - x0 (the quantity the inference Euler step
    integrates, pipeline/flux.py / pipeline/sd3.py). The model is
    conditioned at t = sigma * 1000 — the same convention the
    flow-matching schedules feed the towers at inference."""
    x0 = batch["latents"]
    b = x0.shape[0]
    k_t, k_n = jax.random.split(key)
    if time_sampling == "logit_normal":
        u = logit_normal_t(k_t, (b,), logit_mean, logit_std)
    elif time_sampling == "uniform":
        u = jax.random.uniform(k_t, (b,))
    else:
        raise ValueError(time_sampling)
    sigma = shift_time(u, shift) if shift != 1.0 else u
    noise = jax.random.normal(k_n, x0.shape, jnp.float32)
    sig = sigma.reshape((b,) + (1,) * (x0.ndim - 1))
    x_t = (1.0 - sig) * x0.astype(jnp.float32) + sig * noise
    pred = apply_fn(params, x_t, sigma * 1000.0, batch).astype(jnp.float32)
    target = noise - x0.astype(jnp.float32)
    per_sample = jnp.mean(
        jnp.square(pred - target), axis=tuple(range(1, x0.ndim))
    )
    return _reduce(per_sample, batch)
