"""Flow-matching Euler sampler — the SD3 family's scheduler.

Implements diffusers' FlowMatchEulerDiscreteScheduler semantics
(rectified flow, Esser et al. 2024 arXiv:2403.03206) as one lax.scan:

  - training grid: sigmas = t/1000 for t in [1000..1], time-shifted
    sigma' = shift*sigma / (1 + (shift-1)*sigma) (shift=3 for sd3-medium)
  - set_timesteps(n): linspace in t-space between the SHIFTED endpoints,
    then the shift applied again — the public code's exact (quirky)
    composition, preserved verbatim so trajectories match; pinned against
    a literal transcription in tests/test_sd3.py
  - model predicts velocity: x_{i+1} = x_i + (sigma_{i+1} - sigma_i)*v
  - pure noise at sigma_max = 1 (init_noise_sigma = 1); the model input
    is NOT rescaled; the timestep fed to the MMDiT is sigma*1000
  - CFG pair-batched like the UNet samplers: [uncond | cond] in one
    MMDiT call, v = u + (c - u)*scale

img2img: window the schedule by strength (the SD3 img2img pipeline runs
the last n*strength steps) and noise the clean latent along the straight
path x = (1-sigma)*x0 + sigma*noise.

inpaint: diffusers StableDiffusion3InpaintPipeline blending — after every
Euler update the clean reference latent is re-noised to the NEXT step's
sigma and keeps the un-masked region: lat = m*lat + (1-m)*((1-s')*x0 +
s'*noise), with the SAME noise tensor every step. The final step has
s' = 0, so the formula itself pins the reference exactly (the public
code's i == len(timesteps)-1 special case is the same value).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import MMDiTConfig
from ..models.mmdit import mmdit_forward

N_TRAIN = 1000


def fm_shift(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def fm_schedule(n_steps: int, shift: float = 3.0,
                n_train: int = N_TRAIN) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps [n], sigmas [n+1, trailing 0]), both descending f32.

    Verbatim FlowMatchEulerDiscreteScheduler: the __init__ grid's shifted
    sigma_min/max are mapped back to t-space, linspaced, divided by
    n_train, and shifted AGAIN (sigma_max=1 is a fixed point of the
    shift, so only the low end is affected by the double application)."""
    train_sigmas = np.arange(n_train, 0, -1, dtype=np.float64) / n_train
    train_sigmas = fm_shift(train_sigmas, shift)
    sigma_max, sigma_min = train_sigmas[0], train_sigmas[-1]
    ts = np.linspace(sigma_max * n_train, sigma_min * n_train, n_steps,
                     dtype=np.float64)
    sigmas = fm_shift(ts / n_train, shift)
    timesteps = (sigmas * n_train).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return timesteps, sigmas


def fm_window(n_steps: int, strength: float) -> int:
    """Index of the first schedule entry an img2img run executes
    (diffusers SD3 img2img: skip the first (1-strength) of the steps)."""
    init = min(int(n_steps * strength), n_steps)
    return max(n_steps - init, 0)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "shift", "compute_dtype", "use_cfg",
                     "start_index", "slg_layers", "slg_start", "slg_stop"),
    donate_argnames=("latent",),
)
def fm_diffuse_latent(
    mmdit_params,
    cfg: MMDiTConfig,
    latent: jnp.ndarray,    # [B, h, w, C] — noise at sigmas[start_index]
    context: jnp.ndarray,   # [B or 2B, T, joint_dim] (CFG: [uncond|cond])
    pooled: jnp.ndarray,    # [B or 2B, pooled_dim]
    guidance_scale: float,
    n_steps: int = 28,
    shift: float = 3.0,
    compute_dtype=jnp.bfloat16,
    use_cfg: bool = True,
    start_index: int = 0,
    pin_reference: Optional[jnp.ndarray] = None,  # [B,h,w,C] clean latent
    pin_mask: Optional[jnp.ndarray] = None,       # [1|B,h,w,1], 1 = generate
    pin_noise: Optional[jnp.ndarray] = None,      # [B,h,w,C]
    slg_scale: float = 0.0,
    slg_layers: tuple = (),
    slg_start: float = 0.01,
    slg_stop: float = 0.2,
) -> jnp.ndarray:
    """The whole flow-matching Euler loop as one lax.scan.

    Skip-layer guidance (SD3.5, arXiv:2403.03206 follow-up; diffusers'
    skip_guidance_layers): inside the (slg_start, slg_stop) fraction of
    the run, one extra cond-only MMDiT eval with slg_layers omitted adds
    (v_cond - v_skip) * slg_scale to the CFG-combined velocity. The step
    window transcribes the public gate exactly: i > n*start and
    i < n*stop, i the 0-based index over the steps actually run. The
    off-window steps pay nothing (lax.cond skips the extra eval).
    """
    timesteps, sigmas = fm_schedule(n_steps, shift)
    ts = jnp.asarray(timesteps[start_index:])
    sig = jnp.asarray(sigmas[start_index:-1])
    sig_next = jnp.asarray(sigmas[start_index + 1:])

    latent = latent.astype(jnp.float32)
    ctx = context.astype(compute_dtype)
    pld = pooled.astype(compute_dtype)

    if slg_layers and not use_cfg:
        raise ValueError("skip-layer guidance needs the CFG pair "
                         "(use_cfg=True), like the public pipeline")
    n_run = n_steps - start_index
    idx = np.arange(n_run)
    slg_on = jnp.asarray((idx > n_run * slg_start)
                         & (idx < n_run * slg_stop))

    def velocity(lat, t):
        """CFG-combined velocity (+ the bare cond velocity for SLG)."""
        n_batch = lat.shape[0]
        if not use_cfg:
            t_vec = jnp.broadcast_to(t, (n_batch,))
            v = mmdit_forward(
                mmdit_params, cfg, lat.astype(compute_dtype), t_vec, ctx, pld
            ).astype(jnp.float32)
            return v, v
        x2 = jnp.concatenate([lat, lat], axis=0).astype(compute_dtype)
        t2 = jnp.broadcast_to(t, (2 * n_batch,))
        v2 = mmdit_forward(mmdit_params, cfg, x2, t2, ctx, pld
                           ).astype(jnp.float32)
        vu, vc = jnp.split(v2, 2, axis=0)
        return vu + (vc - vu) * guidance_scale, vc

    if pin_reference is not None:
        pin_ref = pin_reference.astype(jnp.float32)
        pin_m = pin_mask.astype(jnp.float32)
        pin_n = pin_noise.astype(jnp.float32)

    def step(lat, inp):
        t, s, s_next, on = inp
        v, vc = velocity(lat, t)
        if slg_layers:
            b = lat.shape[0]

            def perturbed(_):
                t_vec = jnp.broadcast_to(t, (b,))
                v_skip = mmdit_forward(
                    mmdit_params, cfg, lat.astype(compute_dtype), t_vec,
                    ctx[b:], pld[b:], skip_layers=slg_layers,
                ).astype(jnp.float32)
                return v + (vc - v_skip) * slg_scale

            v = jax.lax.cond(on, perturbed, lambda _: v, None)
        lat = lat + (s_next - s) * v
        if pin_reference is not None:
            proper = (1.0 - s_next) * pin_ref + s_next * pin_n
            lat = pin_m * lat + (1.0 - pin_m) * proper
        return lat, None

    latent, _ = jax.lax.scan(step, latent, (ts, sig, sig_next, slg_on))
    return latent


def fm_add_noise(x0: jnp.ndarray, noise: jnp.ndarray,
                 sigma: float) -> jnp.ndarray:
    """Rectified-flow noising: x = (1-sigma)*x0 + sigma*noise
    (FlowMatchEulerDiscreteScheduler.scale_noise)."""
    return (1.0 - sigma) * x0.astype(jnp.float32) + sigma * noise
