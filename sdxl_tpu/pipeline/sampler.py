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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DiffuserConfig
from ..models.controlnet import (
    control_cond_embed,
    controlnet_forward,
    precompute_control_cross_kv,
)
from ..models.unet import precompute_cross_kv, unet_forward
from .conditioning import Conditioning

N_STEPS_TOTAL = 1000  # DDPM table length (stablediffusion/mod.rs:282)

# k-diffusion sampler surface (capability extension; the reference ships
# only DDIM). Stochastic methods draw per-step noise inside the scan.
# "heun" runs TWO model evals per step (the public 2nd-order scheme).
K_SAMPLERS = ("euler", "dpmpp", "euler_a", "dpmpp_sde", "dpmpp_3m_sde",
              "unipc", "heun", "euler_cfgpp", "dpm2", "dpm2_a",
              "dpmpp_2s_a", "lms")
K_STOCHASTIC = ("euler_a", "dpmpp_sde", "dpmpp_3m_sde", "dpm2_a",
                "dpmpp_2s_a")
# methods with a SECOND model eval at a mid sigma between grid points
# (k-diffusion sample_dpm_2 / sample_dpm_2_ancestral /
# sample_dpmpp_2s_ancestral)
K_MID = ("dpm2", "dpm2_a", "dpmpp_2s_a")


def scaled_linear_alphas_cumprod(n_steps: int = N_STEPS_TOTAL) -> np.ndarray:
    """Standard SD scaled-linear beta schedule -> cumulative alphas.

    The reference ships this table inside the weight dump
    (LegacyDDPMDiscretization, python/dump.py:27-31); this reproduces it for
    runs without a checkpoint and matches the dumped table to f32 precision.
    """
    betas = np.linspace(0.00085**0.5, 0.012**0.5, n_steps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Rescale an ᾱ table so the terminal SNR is exactly zero.

    Lin et al. 2023 (arXiv:2305.08891, alg. 1), the fix for the
    signal-leak mismatch at t=T; diffusers' rescale_zero_terminal_snr
    works on sqrt(ᾱ): shift so the last entry is 0, rescale so the first
    keeps its value, square. Checkpoints trained with it (v-prediction +
    zero-terminal-SNR finetunes) need this table plus
    schedule="trailing" and usually guidance_rescale > 0.

    The exact-zero terminal entry would make sigma = sqrt((1-ᾱ)/ᾱ)
    infinite, so it is clamped to 2**-24 — the same sentinel diffusers'
    EulerDiscreteScheduler stores for rescale_betas_zero_snr=True.
    Pinned against a literal transcription of the diffusers function in
    tests/test_k_goldens.py.
    """
    s = np.sqrt(np.asarray(alphas_cumprod, np.float64))
    s0, sT = s[0], s[-1]
    s = (s - sT) * (s0 / (s0 - sT))
    out = (s**2).astype(np.float32)
    out[-1] = 2.0**-24
    return out


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


def ddim_timesteps(
    step_start: int, n_steps: int, n_train: int = N_STEPS_TOTAL
) -> np.ndarray:
    """(0..n_train-step_start).rev().step_by(n_train/n_steps) (mod.rs:400-406).

    n_train is the DDPM table length — DiffuserConfig.n_steps in a loaded
    .cfg; 1000 for SDXL."""
    step_size = n_train // n_steps
    hi = n_train - step_start
    return np.arange(hi - 1, -1, -step_size, dtype=np.int32)


def expert_cutoff(denoising_end: float, n_train: int = N_STEPS_TOTAL) -> int:
    """diffusers' discrete_timestep_cutoff for the SDXL ensemble-of-experts
    base→refiner split (StableDiffusionXLPipeline's denoising_end and the
    img2img pipeline's matching denoising_start):
    int(round(n_train - denoising_end * n_train)). The base stage runs the
    grid entries with t >= cutoff; the refiner continues the complementary
    t < cutoff tail from the still-noisy handoff latent WITHOUT re-noising
    (capability extension; the reference ships only the re-noise-at-t=800
    refiner mode, mod.rs:355-376)."""
    if not 0.0 < denoising_end < 1.0:
        raise ValueError(
            f"denoising_end={denoising_end} must be strictly between 0 "
            "and 1 (the fraction of the noise range the base stage covers)")
    return int(round(n_train - denoising_end * n_train))


def expert_head_steps(alphas_cumprod, n_steps: int, denoising_end: float,
                      sampler: str = "ddim",
                      schedule: str = "linear") -> Tuple[int, int]:
    """(head_steps, grid_total) for an ensemble-of-experts split.

    Builds the SAME full grid the sampler will build (DDIM's integer
    grid or k_schedule's — incl. karras/ays fractional timesteps) and
    counts the entries at or above the discrete cutoff, exactly
    diffusers' `filter(lambda ts: ts >= discrete_timestep_cutoff,
    timesteps)`; the refiner's complementary filter (ts < cutoff) is the
    remaining suffix by construction."""
    n_train = int(alphas_cumprod.shape[0])
    cutoff = expert_cutoff(denoising_end, n_train)
    if sampler == "ddim":
        ts = ddim_timesteps(0, n_steps, n_train).astype(np.float64)
    else:
        ts_j, _ = k_schedule(alphas_cumprod, 0, n_steps, schedule)
        ts = np.asarray(ts_j, dtype=np.float64)
    head = int((ts >= cutoff).sum())
    total = int(ts.shape[0])
    if not 0 < head < total:
        raise ValueError(
            f"denoising_end={denoising_end} leaves "
            f"{'no head' if head == 0 else 'no tail'} steps on the "
            f"{total}-entry grid (cutoff t={cutoff}); use more steps or a "
            "less extreme split")
    return head, total


def _cfg_contexts(cfg: DiffuserConfig, cond: Conditioning, compute_dtype,
                  use_cfg: bool = True, rows3: bool = False):
    """Scan-invariant context/channel tensors for forward_diffuser
    (mod.rs:494-541): the refiner feeds the OpenCLIP context only and skips
    CFG; the base gets the [uncond | cond] pair for one batched call.

    use_cfg=False drops the unconditional branch entirely (conditional
    context only, half the UNet work) — mathematically identical to
    guidance_scale == 1 and the required path for guidance-distilled
    (Turbo/Lightning-style) models.

    rows3=True (InstructPix2Pix 3-way CFG, see _cfg_eps image_scale):
    rows are [uncond-text | uncond-text | cond-text] — the first two rows
    differ only in the image concat channels the caller builds
    ([zeros | image | image])."""
    if not use_cfg and not cfg.is_refiner:
        ctx = cond.context_full.astype(compute_dtype)
        ch = cond.channel_context
        return ctx, None if ch is None else ch.astype(compute_dtype)
    if cfg.is_refiner:
        return (
            cond.context_open_clip.astype(compute_dtype),
            cond.channel_context_refiner.astype(compute_dtype),
        )
    ctx = cond.context_full
    uctx = jnp.broadcast_to(cond.unconditional_context_full, ctx.shape)
    parts = [uctx, uctx, ctx] if rows3 else [uctx, ctx]
    ctx2 = jnp.concatenate(parts, axis=0).astype(compute_dtype)
    ch = cond.channel_context
    if ch is None:  # SD 1.x/2.x: no label/micro-conditioning channel
        return ctx2, None
    uch = jnp.broadcast_to(cond.unconditional_channel_context, ch.shape)
    chp = [uch, uch, ch] if rows3 else [uch, ch]
    return ctx2, jnp.concatenate(chp, axis=0).astype(compute_dtype)


def _cfg_eps(unet_params, cfg: DiffuserConfig, latent, t, ctx2, ch2,
             guidance_scale, compute_dtype, cross_kv=None, alpha_t=None,
             use_cfg: bool = True, guidance_rescale: float = 0.0,
             concat=None, control=None, control_cfg=None, control_kv=None,
             control_scale=None, t_add=None, pag_scale: float = 0.0,
             return_uncond: bool = False, image_scale=None):
    """One guided epsilon prediction (forward_diffuser, mod.rs:494-541).

    image_scale not None (InstructPix2Pix, Brooks et al. 2023,
    arXiv:2211.09800 eq. 3): three-way CFG in ONE batched call over rows
    [uncond | image-only | image+text] — `concat` carries the per-row
    edit-image latent channels ([zeros | image | image], built by the
    caller) and ctx2/ch2 are the rows3 contexts (_cfg_contexts):
    eps = e_u + image_scale*(e_i - e_u) + guidance_scale*(e_t - e_i),
    the exact combination diffusers' StableDiffusionInstructPix2Pix
    pipeline applies to its [text, image, uncond] split. Not combinable
    with ControlNet / PAG / CFG++ / guidance_rescale.

    For prediction_type="v" (SD 2.x-768) the raw output is converted to
    an epsilon via eps = sqrt(a)*v + sqrt(1-a)*x_vp (identity from
    v = sqrt(a)*eps - sqrt(1-a)*x0); `latent` here is the variance-
    preserving x_t the model was trained on, `alpha_t` its a-bar.

    use_cfg=False runs the conditional branch only (see _cfg_contexts).
    concat: extra scan-invariant input channels for inpainting-specialized
    UNets (in_channels=9: [mask, masked-image latent], already CFG-doubled
    by the caller) appended to the model input but never to the latent the
    update rules see.
    guidance_rescale > 0 applies the std-matching correction of Lin et al.
    2023 (arXiv:2305.08891 eq. 15-16) to the guided epsilon — fixes the
    over-saturation high CFG scales cause, essential for v-prediction
    models trained with zero-terminal-SNR.

    control/control_cfg/control_kv/control_scale: ControlNet trunk run on
    the SAME (pair-batched) latent/timestep/context; its zero-conv
    residuals, scaled by control_scale (the per-step window scale), are
    injected into the UNet's skips + middle. The trunk always sees the
    4-channel latent — never the inpainting concat channels (diffusers
    ControlNet-inpaint semantics).

    pag_scale > 0 adds Perturbed-Attention Guidance (Ahn et al. 2024,
    arXiv:2403.17377): one extra UNet eval on the COND rows with the
    middle block's self-attention replaced by the identity map, then
    eps += pag_scale * (eps_cond - eps_perturbed) — diffusers'
    "mid"-layer PAG. Composes with CFG or the no-CFG path; costs one
    extra conditional forward per step.

    return_uncond=True additionally returns the raw UNCONDITIONAL
    epsilon as (eps, eps_uncond) — the CFG++ samplers re-noise along the
    uncond direction (arXiv:2406.08070). Requires the pair-batched CFG
    path (use_cfg=True, not the refiner)."""
    n_batch = latent.shape[0]
    ucfg = cfg.unet_config()
    if pag_scale and cfg.is_refiner:
        raise ValueError("PAG applies to the base/family UNets, not the "
                         "refiner (its stage runs unguided)")
    if return_uncond and (cfg.is_refiner or not use_cfg):
        raise ValueError("CFG++ needs the pair-batched CFG path (a guided "
                         "base/family UNet, not the refiner or --no-cfg)")
    def to_eps(raw, x_vp):
        if cfg.prediction_type == "v":
            return jnp.sqrt(alpha_t) * raw + jnp.sqrt(1.0 - alpha_t) * x_vp
        return raw

    def pag_eps(ctx_c, ch_c, kv_c, cc_c, t_vec):
        # perturbed branch: cond context, identity mid self-attention
        x4 = latent.astype(compute_dtype)
        x_in = x4
        if cc_c is not None:
            x_in = jnp.concatenate([x_in, cc_c.astype(compute_dtype)], -1)
        raw = unet_forward(
            unet_params, ucfg, x_in, t_vec, ctx_c, ch_c,
            cross_kv=kv_c, t_add=t_add, pag_mid=True,
        ).astype(jnp.float32)
        return to_eps(raw, latent.astype(jnp.float32))

    def residuals(x4, t_vec):
        if control is None:
            return None
        if isinstance(control, (tuple, list)):
            # multi-ControlNet (diffusers MultiControlNetModel semantics):
            # each trunk runs on the same latent, residuals are summed,
            # each scaled by its own per-step window scale
            # (control_scale[i]). All nets share control_cfg.
            total_down, total_mid = None, None
            for i, (ctl_i, kv_i) in enumerate(zip(control, control_kv)):
                down, mid = controlnet_forward(
                    ctl_i["params"], control_cfg, x4, t_vec, ctx2, ch2,
                    ctl_i["cond_emb"], cross_kv=kv_i,
                )
                s = control_scale[i]
                if total_down is None:
                    total_down = [d * s for d in down]
                    total_mid = mid * s
                else:
                    total_down = [a + d * s
                                  for a, d in zip(total_down, down)]
                    total_mid = total_mid + mid * s
            return total_down, total_mid
        down, mid = controlnet_forward(
            control["params"], control_cfg, x4, t_vec, ctx2, ch2,
            control["cond_emb"], cross_kv=control_kv,
        )
        s = control_scale
        return [d * s for d in down], mid * s

    if image_scale is not None and use_cfg and not cfg.is_refiner:
        if (pag_scale or return_uncond or control is not None
                or guidance_rescale):
            raise ValueError("InstructPix2Pix 3-way CFG is not combinable "
                             "with PAG / CFG++ / ControlNet / "
                             "guidance_rescale")
        # triple-batched ip2p CFG: [uncond | image | image+text]
        x3 = jnp.concatenate([latent] * 3, axis=0).astype(compute_dtype)
        x_in = jnp.concatenate([x3, concat.astype(compute_dtype)], -1)
        t3 = jnp.broadcast_to(t, (3 * n_batch,))
        raw3 = unet_forward(unet_params, ucfg, x_in, t3, ctx2, ch2,
                            cross_kv=cross_kv, t_add=t_add
                            ).astype(jnp.float32)
        eps3 = to_eps(raw3, x3.astype(jnp.float32))
        e_u, e_i, e_t = jnp.split(eps3, 3, axis=0)
        return (e_u + image_scale * (e_i - e_u)
                + guidance_scale * (e_t - e_i))

    if cfg.is_refiner:
        t_vec = jnp.broadcast_to(t, (n_batch,))
        raw = unet_forward(
            unet_params, ucfg, latent.astype(compute_dtype), t_vec, ctx2, ch2,
            cross_kv=cross_kv, t_add=t_add,
        ).astype(jnp.float32)
        return to_eps(raw, latent.astype(jnp.float32))

    if not use_cfg:  # conditional branch only
        t_vec = jnp.broadcast_to(t, (n_batch,))
        x4 = latent.astype(compute_dtype)
        x_in = x4
        if concat is not None:
            x_in = jnp.concatenate([x_in, concat.astype(compute_dtype)], -1)
        raw = unet_forward(
            unet_params, ucfg, x_in, t_vec, ctx2, ch2,
            cross_kv=cross_kv, control_residuals=residuals(x4, t_vec),
            t_add=t_add,
        ).astype(jnp.float32)
        eps = to_eps(raw, latent.astype(jnp.float32))
        if pag_scale:
            eps_pert = pag_eps(ctx2, ch2, cross_kv, concat, t_vec)
            eps = eps + pag_scale * (eps - eps_pert)
        return eps

    # pair-batched CFG: [uncond | cond] in one UNet call
    x2 = jnp.concatenate([latent, latent], axis=0).astype(compute_dtype)
    x_in = x2
    if concat is not None:
        x_in = jnp.concatenate([x_in, concat.astype(compute_dtype)], -1)
    t2 = jnp.broadcast_to(t, (2 * n_batch,))
    raw2 = unet_forward(unet_params, ucfg, x_in, t2, ctx2, ch2,
                        cross_kv=cross_kv, t_add=t_add,
                        control_residuals=residuals(x2, t2)).astype(jnp.float32)
    eps2 = to_eps(raw2, x2.astype(jnp.float32))
    eps_u, eps_c = jnp.split(eps2, 2, axis=0)
    eps = eps_u + (eps_c - eps_u) * guidance_scale
    if pag_scale:
        kv_c = (None if cross_kv is None else jax.tree_util.tree_map(
            lambda a: a[n_batch:], cross_kv))
        ch_c = None if ch2 is None else ch2[n_batch:]
        cc_c = None if concat is None else concat[n_batch:]
        eps_pert = pag_eps(ctx2[n_batch:], ch_c, kv_c, cc_c, t2[:n_batch])
        eps = eps + pag_scale * (eps_c - eps_pert)
    if guidance_rescale > 0.0:
        axes = tuple(range(1, eps.ndim))
        std_c = jnp.std(eps_c, axis=axes, keepdims=True)
        std_g = jnp.std(eps, axis=axes, keepdims=True)
        rescaled = eps * (std_c / jnp.maximum(std_g, 1e-12))
        eps = guidance_rescale * rescaled + (1.0 - guidance_rescale) * eps
    if return_uncond:
        return eps, eps_u
    return eps


def _edit_validate(cfg, concat_channels, inpaint, control_params, deepcache,
                   pag_scale, ip, guidance_rescale, use_cfg):
    """InstructPix2Pix option compatibility (one place for both loops)."""
    if concat_channels is None:
        raise ValueError("edit=True needs concat_channels = the edit-image "
                         "latents [B,h,w,4]")
    if cfg.is_refiner:
        raise ValueError("InstructPix2Pix applies to the base/family UNets")
    if cfg.in_channels != 4 + concat_channels.shape[-1]:
        raise ValueError(
            "InstructPix2Pix needs an 8-channel edit UNet (in_channels="
            f"{cfg.in_channels}; e.g. timbrooks/instruct-pix2pix)")
    if inpaint or control_params is not None or deepcache is not None:
        raise ValueError("InstructPix2Pix is not combinable with the "
                         "inpaint pin / ControlNet / DeepCache")
    if pag_scale or ip is not None:
        raise ValueError("InstructPix2Pix is not combinable with PAG or "
                         "IP-Adapter")
    if guidance_rescale and use_cfg:
        raise ValueError("guidance_rescale does not apply to the ip2p "
                         "3-way CFG")


def _deepcache_validate(deepcache, control_params, concat_channels):
    """DeepCache (arXiv:2312.00858) supports the plain txt2img/inpaint
    paths: ControlNet injects residuals into the deep skips a shallow
    step never computes, and the 9-channel inpainting concat changes
    conv_in — both are rejected rather than silently wrong."""
    interval, branch = deepcache
    if interval < 1:
        raise ValueError("deepcache interval must be >= 1")
    if control_params is not None:
        raise ValueError("deepcache is incompatible with ControlNet "
                         "(residuals target the skipped deep blocks)")
    if concat_channels is not None:
        raise ValueError("deepcache is incompatible with "
                         "inpainting-specialized (9-channel) UNets")
    return interval, branch


def _cfg_eps_deepcache(unet_params, cfg: DiffuserConfig, latent, t, ctx2,
                       ch2, guidance_scale, compute_dtype, cross_kv,
                       alpha_t, use_cfg, guidance_rescale, cache, is_full,
                       branch: int):
    """_cfg_eps with the DeepCache full/shallow switch: full steps run
    the whole UNet and refresh the deep-feature cache; shallow steps
    splice the cached deep U and run only the shallow prefix/suffix
    (unet_forward_cached / unet_forward_shallow). lax.cond keeps both
    bodies in one compiled scan. Returns (eps, cache)."""
    from ..models.unet import unet_forward_cached, unet_forward_shallow

    n_batch = latent.shape[0]
    ucfg = cfg.unet_config()

    def to_eps(raw, x_vp):
        if cfg.prediction_type == "v":
            return jnp.sqrt(alpha_t) * raw + jnp.sqrt(1.0 - alpha_t) * x_vp
        return raw

    if use_cfg and not cfg.is_refiner:
        x_in = jnp.concatenate([latent, latent], axis=0).astype(compute_dtype)
        t_vec = jnp.broadcast_to(t, (2 * n_batch,))
    else:
        x_in = latent.astype(compute_dtype)
        t_vec = jnp.broadcast_to(t, (n_batch,))

    def full(c):
        raw, new_cache = unet_forward_cached(
            unet_params, ucfg, x_in, t_vec, ctx2, ch2, cross_kv=cross_kv,
            branch=branch,
        )
        return raw, new_cache

    def shallow(c):
        raw = unet_forward_shallow(
            unet_params, ucfg, x_in, t_vec, ctx2, ch2, c,
            cross_kv=cross_kv, branch=branch,
        )
        return raw, c

    raw, cache = jax.lax.cond(is_full, full, shallow, cache)
    raw = raw.astype(jnp.float32)
    if not (use_cfg and not cfg.is_refiner):
        return to_eps(raw, latent.astype(jnp.float32)), cache
    eps2 = to_eps(raw, x_in.astype(jnp.float32))
    eps_u, eps_c = jnp.split(eps2, 2, axis=0)
    eps = eps_u + (eps_c - eps_u) * guidance_scale
    if guidance_rescale > 0.0:
        axes = tuple(range(1, eps.ndim))
        std_c = jnp.std(eps_c, axis=axes, keepdims=True)
        std_g = jnp.std(eps, axis=axes, keepdims=True)
        rescaled = eps * (std_c / jnp.maximum(std_g, 1e-12))
        eps = guidance_rescale * rescaled + (1.0 - guidance_rescale) * eps
    return eps, cache


def _deepcache_init(unet_params, cfg: DiffuserConfig, latent, ctx2, ch2,
                    compute_dtype, cross_kv, use_cfg, branch: int):
    """Zero-filled cache with the exact shape/dtype the full step will
    produce (jax.eval_shape — no FLOPs); step 0 is always full, so the
    zeros are never read."""
    from ..models.unet import unet_forward_cached

    n_batch = latent.shape[0]
    pair = use_cfg and not cfg.is_refiner
    x_in = jax.ShapeDtypeStruct(
        (2 * n_batch if pair else n_batch,) + latent.shape[1:], compute_dtype
    )
    t_vec = jax.ShapeDtypeStruct((x_in.shape[0],), jnp.float32)
    _, cache_aval = jax.eval_shape(
        lambda p, x, tv, c2, h2, kv: unet_forward_cached(
            p, cfg.unet_config(), x, tv, c2, h2, cross_kv=kv, branch=branch
        ),
        unet_params, x_in, t_vec, ctx2, ch2, cross_kv,
    )
    return jnp.zeros(cache_aval.shape, cache_aval.dtype)


def _deepcache_schedule(n: int, interval: int) -> jnp.ndarray:
    """is_full flags: step 0 and every `interval`-th step run the whole
    UNet (the official uniform cache schedule)."""
    return jnp.asarray([(i % interval) == 0 for i in range(n)])


def _control_window_scales(n: int, scale, window) -> jnp.ndarray:
    """Per-step ControlNet scale: `scale` inside the [start, end) fraction
    window, 0 outside — exactly diffusers' `controlnet_keep` rule
    (step i active iff i/n >= start and (i+1)/n <= end).

    Multi-ControlNet: `scale` a sequence of N scales and `window` a
    sequence of N (start, end) windows -> [n, N] (one scale column per
    net, sliced per scan step)."""
    if isinstance(scale, (tuple, list)):
        cols = [_control_window_scales(n, s, w)
                for s, w in zip(scale, window)]
        return jnp.stack(cols, axis=1)
    start, end = window
    keep = np.array(
        [0.0 if (i / n < start or (i + 1) / n > end) else 1.0
         for i in range(n)],
        np.float32,
    )
    return jnp.asarray(keep) * scale


def _control_setup(control_params, control_cfg, control_image, ctx2,
                   compute_dtype, use_cfg, is_refiner):
    """Loop-invariant ControlNet work, hoisted out of the scan: the
    conditioning-image embedding (pair-doubled to match the CFG batch) and
    the trunk's cross-attention K/V projections.

    Multi-ControlNet: control_params/control_image are sequences of the
    same length N -> returns (tuple of N ctrl dicts, tuple of N kv trees)."""
    if control_params is None:
        return None, None
    if isinstance(control_params, (tuple, list)):
        pairs = [
            _control_setup(p, control_cfg, im, ctx2, compute_dtype,
                           use_cfg, is_refiner)
            for p, im in zip(control_params, control_image)
        ]
        return tuple(c for c, _ in pairs), tuple(k for _, k in pairs)
    ce = control_cond_embed(
        control_params["cond_embed"], control_image.astype(compute_dtype)
    )
    if use_cfg and not is_refiner:
        ce = jnp.concatenate([ce, ce], axis=0)
    ctrl = {"params": control_params, "cond_emb": ce}
    ckv = precompute_control_cross_kv(control_params, control_cfg, ctx2)
    return ctrl, ckv


def _merge_ip(cross_kv, ip, cfg: DiffuserConfig, cond: Conditioning,
              compute_dtype, use_cfg: bool):
    """Extend the hoisted cross-attention K/V with IP-Adapter image-token
    K/V (models/ip_adapter.py — loop-invariant, so the scan body pays
    only the extra tiny-KV attention).

    ip: {"layers": organized to_k_ip/to_v_ip tree, "tokens": [B|1, n, d]
    image tokens, "tokens_uncond": zero-image tokens, "scale": float}.
    The token batch is paired [uncond | cond] exactly like _cfg_contexts
    pairs the text context."""
    if ip is None:
        return cross_kv
    from ..models.ip_adapter import merge_ip_kv

    batch = cond.context_full.shape[0]
    tok = jnp.broadcast_to(ip["tokens"], (batch,) + ip["tokens"].shape[1:])
    if use_cfg and not cfg.is_refiner:
        utok = jnp.broadcast_to(ip["tokens_uncond"], tok.shape)
        tok = jnp.concatenate([utok, tok], axis=0)
    return merge_ip_kv(cross_kv, ip["layers"], tok.astype(compute_dtype),
                       ip["scale"])


def ddim_sigma(alpha, alpha_prev, eta: float):
    """diffusers DDIMScheduler._get_variance^0.5 * eta:
    sigma_t = eta * sqrt((1-a_prev)/(1-a_t)) * sqrt(1 - a_t/a_prev).
    0 at the a_prev = 1 tail; <= sqrt(1-a_prev) for eta <= 1 (the
    direction term's sqrt stays real)."""
    var = (1.0 - alpha_prev) / (1.0 - alpha) * (1.0 - alpha / alpha_prev)
    return eta * jnp.sqrt(jnp.maximum(var, 0.0))


def _ddim_update(x0, eps, alpha, alpha_prev, eta: float, k, shape):
    """One DDIM latent update. eta == 0: the reference's deterministic
    step (mod.rs:406-429, sigma hardcoded 0 at :402,448) — bit-identical
    to the historical code path. eta > 0: diffusers DDIMScheduler.step's
    stochastic variant, x = sqrt(a_prev)*x0 +
    sqrt(1-a_prev-sigma^2)*eps + sigma*noise, with the step noise drawn
    from stream 1 of the scan key (stream 0 is the inpaint pin)."""
    if eta <= 0:
        return x0 * jnp.sqrt(alpha_prev) + eps * jnp.sqrt(1.0 - alpha_prev)
    sig = ddim_sigma(alpha, alpha_prev, eta)
    dirn = jnp.sqrt(jnp.maximum(1.0 - alpha_prev - sig**2, 0.0))
    noise = _scan_normal(_scan_fold(k, 1), shape)
    return x0 * jnp.sqrt(alpha_prev) + dirn * eps + sig * noise


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "step_start", "n_steps", "compute_dtype", "inpaint",
                     "use_cfg", "guidance_rescale", "control_cfg",
                     "control_window", "deepcache", "pag_scale", "head_steps",
                     "tail_from", "edit", "ddim_eta"),
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
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    deepcache: Optional[Tuple[int, int]] = None,
    pag_scale: float = 0.0,
    head_steps: int = 0,
    tail_from: int = 0,
    edit: bool = False,
    image_guidance_scale: float = 1.5,
    ddim_eta: float = 0.0,
    step_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM loop as one lax.scan (diffuse_latent, mod.rs:390-483).

    ddim_eta > 0: stochastic DDIM (diffusers DDIMScheduler's eta; eta=1
    is DDPM-like ancestral sampling): per step
    sigma_t = eta*sqrt((1-a_prev)/(1-a_t))*sqrt(1-a_t/a_prev) and
    x = sqrt(a_prev)*x0 + sqrt(1-a_prev-sigma_t^2)*eps + sigma_t*noise
    — pinned against a literal transcription in tests/test_ddim_eta.py.
    eta = 0 keeps the reference's deterministic update bitwise
    (mod.rs:402,448 hardcodes sigma=0). Step noise draws from stream 1
    of the scan keys (stream 0 is the inpaint pin); step_keys [T, B, 2]
    overrides with PER-IMAGE keys so fused serving batches keep the
    per-image-seed contract.

    edit=True (InstructPix2Pix): concat_channels is the UNSCALED
    edit-image latent [B,h,w,4] (in_channels == 8 models) and the CFG
    batch becomes the 3-way [uncond | image | image+text] split combined
    with (guidance_scale, image_guidance_scale) — see _cfg_eps.

    head_steps > 0 (ensemble-of-experts base stage, diffusers'
    denoising_end): run only the first head_steps entries of the grid;
    the scan ends at a_prev = alpha(ts[head_steps]) — the handoff noise
    level — and returns the still-noisy VP-space latent for a refiner
    continuing the complementary tail with no re-noise.

    tail_from > 0 (the matching refiner stage, diffusers' img2img
    denoising_start): run the grid's SUFFIX ts[tail_from:], treating
    `latent` as the still-noisy handoff at alpha(ts[tail_from]). The
    per-step metadata (inpaint pin keys, control window scales,
    deepcache cadence) is rebuilt over the tail exactly as diffusers'
    refiner pipeline re-enters its own scheduler over the sliced
    timesteps. head(h) then tail_from(h) == one full run bitwise
    (DDIM is memoryless; the pin/window streams are per-stage).

    concat_channels [B,h,w,5]: mask + masked-image latent for
    inpainting-specialized UNets (DiffuserConfig.in_channels == 9).

    control_*: optional ControlNet guidance (models/controlnet.py) —
    control_image is [B, 8h, 8w, 3] in [0, 1]; control_window is the
    (start, end) step-fraction window the residuals apply in.

    deepcache: optional (interval, branch) — DeepCache (arXiv:2312.00858):
    every `interval`-th step runs the full UNet and caches the deep
    decoder feature; in-between steps recompute only the `branch`
    shallowest input/output blocks and splice the cache in (lax.cond
    inside the same scan). interval=1 == off (identical math).

    pag_scale > 0: Perturbed-Attention Guidance (see _cfg_eps); not
    combinable with ControlNet or DeepCache (one extra cond-rows UNet
    eval per step; the perturbed branch would need its own trunk run /
    feature cache)."""
    if pag_scale and (control_params is not None or deepcache is not None):
        raise ValueError("pag_scale is not combinable with ControlNet or "
                         "deepcache")
    # DDPM table length comes from the table itself; DiffuserConfig.n_steps
    # must agree (a loaded .cfg with a different table length is honored,
    # a mismatched one is an error rather than silently ignored).
    n_train = alphas_cumprod.shape[0]
    if cfg.n_steps != n_train:
        raise ValueError(
            f"DiffuserConfig.n_steps={cfg.n_steps} does not match the "
            f"alphas_cumprod table length {n_train}"
        )
    step_size = n_train // n_steps
    ts = jnp.asarray(ddim_timesteps(step_start, n_steps, n_train))
    if head_steps and tail_from:
        raise ValueError("head_steps and tail_from are mutually exclusive "
                         "(one stage is either the head or the tail)")
    if head_steps and not 0 < head_steps < int(ts.shape[0]):
        raise ValueError(
            f"head_steps={head_steps} must leave at least one step on "
            f"each side of the {int(ts.shape[0])}-entry grid")
    if tail_from:
        if not 0 < tail_from < int(ts.shape[0]):
            raise ValueError(
                f"tail_from={tail_from} must leave at least one step on "
                f"each side of the {int(ts.shape[0])}-entry grid")
        ts = ts[tail_from:]
    a_t = alphas_cumprod[ts]
    a_prev = jnp.where(ts >= step_size, alphas_cumprod[ts - step_size], 1.0)

    latent = latent.astype(jnp.float32)
    if inpaint:
        reference = reference.astype(jnp.float32)
    if step_keys is not None:
        keys = step_keys  # [T, B, 2]: per-image scan keys
    elif inpaint or ddim_eta > 0:
        if key is None:
            raise ValueError("inpaint / ddim_eta > 0 needs a PRNG key")
        keys = jax.random.split(key, ts.shape[0])
    else:
        keys = jnp.zeros((ts.shape[0], 2), dtype=jnp.uint32)

    if edit:
        _edit_validate(cfg, concat_channels, inpaint, control_params,
                       deepcache, pag_scale, ip, guidance_rescale, use_cfg)
    # loop-invariant conditioning hoisted out of the scan, including every
    # cross-attention K/V projection of the fixed context
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype, use_cfg, rows3=edit)
    cross_kv = precompute_cross_kv(unet_params, cfg.unet_config(), ctx2)
    cross_kv = _merge_ip(cross_kv, ip, cfg, cond, compute_dtype, use_cfg)
    cc = concat_channels
    if cc is not None and use_cfg and not cfg.is_refiner:
        if edit:  # ip2p rows: [no image | image | image]
            cc = jnp.concatenate([jnp.zeros_like(cc), cc, cc], axis=0)
        else:
            cc = jnp.concatenate([cc, cc], axis=0)
    img_scale = image_guidance_scale if (edit and use_cfg) else None
    ctrl, ctrl_kv = _control_setup(control_params, control_cfg, control_image,
                                   ctx2, compute_dtype, use_cfg, cfg.is_refiner)
    cscales = _control_window_scales(int(ts.shape[0]), control_scale,
                                     control_window)

    if deepcache is not None:
        interval, branch = _deepcache_validate(deepcache, control_params,
                                               concat_channels)
        full_flags = _deepcache_schedule(int(ts.shape[0]), interval)
        cache0 = _deepcache_init(unet_params, cfg, latent, ctx2, ch2,
                                 compute_dtype, cross_kv, use_cfg, branch)

        def dc_step(carry, inp):
            lat, cache = carry
            t, alpha, alpha_prev, k, is_full = inp
            if inpaint:
                noise = _scan_normal(k, lat.shape)
                noised_ref = (reference * jnp.sqrt(alpha)
                              + noise * jnp.sqrt(1.0 - alpha))
                lat = inpaint_pin(mask, lat, noised_ref)
            eps, cache = _cfg_eps_deepcache(
                unet_params, cfg, lat, t, ctx2, ch2, guidance_scale,
                compute_dtype, cross_kv, alpha, use_cfg, guidance_rescale,
                cache, is_full, branch,
            )
            sqrt_noise = jnp.sqrt(1.0 - alpha)
            x0 = (lat - eps * sqrt_noise) / jnp.sqrt(alpha)
            lat = _ddim_update(x0, eps, alpha, alpha_prev, ddim_eta, k,
                               lat.shape)
            return (lat, cache), None

        inputs = (ts, a_t, a_prev, keys, full_flags)
        if head_steps:  # expert head: the full schedule's prefix
            inputs = tuple(a[:head_steps] for a in inputs)
        (latent, _), _ = jax.lax.scan(dc_step, (latent, cache0), inputs)
        return latent

    def step(lat, inp):
        t, alpha, alpha_prev, k, cs = inp
        if inpaint:
            noise = _scan_normal(k, lat.shape)
            noised_ref = reference * jnp.sqrt(alpha) + noise * jnp.sqrt(1.0 - alpha)
            lat = inpaint_pin(mask, lat, noised_ref)

        eps = _cfg_eps(unet_params, cfg, lat, t, ctx2, ch2, guidance_scale,
                       compute_dtype, cross_kv, alpha,
                       use_cfg=use_cfg, guidance_rescale=guidance_rescale,
                       concat=cc, control=ctrl, control_cfg=control_cfg,
                       control_kv=ctrl_kv, control_scale=cs,
                       pag_scale=pag_scale, image_scale=img_scale)
        sqrt_noise = jnp.sqrt(1.0 - alpha)
        x0 = (lat - eps * sqrt_noise) / jnp.sqrt(alpha)
        lat = _ddim_update(x0, eps, alpha, alpha_prev, ddim_eta, k,
                           lat.shape)
        return lat, None

    inputs = (ts, a_t, a_prev, keys, cscales)
    if head_steps:  # expert head: the full schedule's prefix
        inputs = tuple(a[:head_steps] for a in inputs)
    latent, _ = jax.lax.scan(step, latent, inputs)
    return latent


def karras_sigmas(sigma_min: float, sigma_max: float, n: int,
                  rho: float = 7.0) -> np.ndarray:
    """Karras et al. 2022 (arXiv:2206.00364 eq. 5) sigma schedule.

    Spends more of the step budget at low noise than the linear-t schedule
    — the standard quality booster for <=20-step Euler/DPM++ sampling.
    Capability extension; the reference ships only the DDIM schedule."""
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    inv = 1.0 / rho
    return ((sigma_max**inv + ramp * (sigma_min**inv - sigma_max**inv)) ** rho
            ).astype(np.float32)


def k_timesteps(step_start: int, n_steps: int, n_train: int,
                spacing: str = "linspace") -> np.ndarray:
    """diffusers-style spaced timesteps, high -> low (static).

    spacing follows diffusers' `timestep_spacing` scheduler config
    (transcribed from EulerDiscreteScheduler.set_timesteps):
      - "linspace": linspace(0, n_train-1, n) — the diffusers default for
        EulerDiscrete and the grid every schedule here used before.
      - "trailing": round(n_train - arange(n)*(n_train/n)) - 1 — anchors
        the FIRST step at the terminal t=n_train-1 with uniform n_train/n
        spacing (linspace is the grid that ends at t=0; trailing ends at
        n_train/n - 1). Required by SDXL-Lightning / zero-terminal-SNR
        checkpoints (their README mandates timestep_spacing="trailing")
        because it always samples the terminal (SNR=0) timestep.
        Computed closed-form per index rather than diffusers' literal
        arange(n_train, 0, -n_train/n): for 62 of the 1000 step counts
        (61, 103, 121, ...) the float endpoint error gives that arange
        n+1 entries whose spurious last rounds to t=-1 — the closed form
        yields the same values for every exact count and exactly n
        entries always.
      - "leading": arange(n)*(n_train//n) + 1, reversed — the legacy
        SD1 grid (steps_offset=1 per the SD scheduler configs).

    step_start > 0 keeps the GLOBAL n_steps spacing and slices the tail
    below the handoff — the refiner/img2img runs ~n_steps*(tail/n_train)
    UNet evals, the same step DENSITY as txt2img. This matches both the
    reference's DDIM handoff (step size stays 1000/n_steps through the
    refiner window, mod.rs:400-406) and diffusers img2img (which runs
    strength*num_inference_steps of the full schedule); the previous
    behavior squeezed all n_steps into the tail, 3-5x the UNet evals for
    the same nominal step count.
    """
    if spacing in ("trailing", "leading") and n_steps > n_train:
        raise ValueError(
            f"n_steps ({n_steps}) > n_train ({n_train}) is invalid for "
            f"timestep_spacing='{spacing}' (diffusers' set_timesteps raises "
            "the same way; the leading grid would collapse every step onto "
            "t=1)")
    if spacing == "trailing":
        ts_full = (
            np.round(n_train
                     - np.arange(n_steps, dtype=np.float64)
                     * (n_train / n_steps)).astype(np.int32)
            - 1
        )
    elif spacing == "leading":
        step_ratio = n_train // n_steps
        ts_full = (
            (np.arange(0, n_steps) * step_ratio).round().astype(np.int32)[::-1]
            + 1
        )
    else:
        ts_full = (
            np.linspace(0, n_train - 1, n_steps).round()[::-1].astype(np.int32)
        )
    if step_start <= 0:
        return ts_full
    ts = ts_full[ts_full < n_train - step_start]
    if len(ts) == 0:  # degenerate window: at least one denoise step
        ts = ts_full[-1:]
    return ts


# Align Your Steps (Sabour et al. 2024, arXiv:2404.14507): the paper's
# published 10-step optimized noise-level schedules (minimizing the KLUB
# discretization bound) for the SD families. The constants ARE the
# published data (paper appendix / the authors' released schedules);
# other step counts come from the paper's own log-linear interpolation
# recipe (ays_sigmas).
AYS_SIGMAS_SDXL = (14.615, 6.315, 3.771, 2.181, 1.342,
                   0.862, 0.555, 0.380, 0.234, 0.113)
AYS_SIGMAS_SD15 = (14.615, 6.475, 3.861, 2.697, 1.886,
                   1.396, 0.963, 0.652, 0.399, 0.152)


def ays_sigmas(n_steps: int, family: str = "sdxl") -> np.ndarray:
    """AYS sigma schedule at n_steps (descending, no trailing zero).

    n_steps == 10 returns the published table verbatim; other counts use
    log-linear interpolation over a unit ramp (the paper's recipe for
    retargeting its 10-point schedules)."""
    table = AYS_SIGMAS_SDXL if family == "sdxl" else AYS_SIGMAS_SD15
    logt = np.log(np.asarray(table, dtype=np.float64))
    if n_steps == len(table):
        out = logt
    else:
        xs = np.linspace(0.0, 1.0, len(table))
        xt = np.linspace(0.0, 1.0, n_steps)
        out = np.interp(xt, xs, logt)
    return np.exp(out).astype(np.float32)


def k_schedule(alphas_cumprod, step_start: int, n_steps: int,
               schedule: str = "linear"):
    """(timesteps, sigmas) for the k-samplers; sigmas has n+1 entries
    (trailing 0), timesteps n entries, both descending.

    schedule="linear" indexes the sigma table at the k_timesteps integer
    grid; schedule="karras" respaces the SAME sigma endpoints with the
    Karras rho=7 ramp (arXiv:2206.00364 eq. 5 — diffusers'
    _convert_to_karras takes sigma_min/max from the selected schedule's
    ends the same way) and interpolates fractional UNet timesteps from
    log-sigma (continuous-time conditioning, as diffusers does for
    use_karras_sigmas=True). Pinned against literal transcriptions of the
    public algorithms in tests/test_k_goldens.py.

    schedule="ays" / "ays_sd15" uses the published Align-Your-Steps
    10-point optimized schedule (arXiv:2404.14507) for SDXL / SD1.x,
    log-linearly retargeted to n_steps; step_start windows it to the
    sigmas at or below the handoff noise level (img2img/refiner tails),
    keeping at least one step. Fractional timesteps from log-sigma like
    karras.

    schedule="trailing" / "leading" are the linear sigma grid over the
    other diffusers timestep_spacing choices (k_timesteps); "trailing"
    anchors the FIRST step at the terminal t=n_train-1 with uniform
    n_train/n spacing (leading never samples the terminal timestep) and
    is REQUIRED by SDXL-Lightning / zero-terminal-SNR checkpoints.
    """
    n_train = alphas_cumprod.shape[0]
    sigmas_full = jnp.sqrt(
        (1.0 - alphas_cumprod.astype(jnp.float32)) / alphas_cumprod
    )
    spacing = (schedule if schedule in ("trailing", "leading")
               else "linspace")
    lin_ts = k_timesteps(step_start, n_steps, n_train, spacing)
    if schedule in ("ays", "ays_sd15"):
        sig_np = ays_sigmas(n_steps, "sdxl" if schedule == "ays" else "sd15")
        if step_start > 0:
            # window to the handoff noise level, like k_timesteps slices
            # the linear grid: keep sigmas below sigma(t_handoff). The
            # bound comes from the STATIC scaled-linear table (this runs
            # under jit where alphas_cumprod is traced; the published AYS
            # sigmas presuppose the SD scaled-linear schedule anyway)
            alphas_np = scaled_linear_alphas_cumprod(n_train).astype(
                np.float64)
            t_hi = n_train - step_start - 1
            bound = float(np.sqrt((1 - alphas_np[t_hi]) / alphas_np[t_hi]))
            kept = sig_np[sig_np <= bound]
            sig_np = kept if len(kept) else sig_np[-1:]
        sig_k = jnp.asarray(sig_np)
        ts = jnp.interp(
            jnp.log(sig_k), jnp.log(sigmas_full),
            jnp.arange(n_train, dtype=jnp.float32),
        )
        sigmas = jnp.concatenate([sig_k, jnp.zeros((1,), jnp.float32)])
        return ts, sigmas
    if schedule == "karras":
        # same sigma endpoints as the linear schedule, Karras rho=7 spacing
        # between them (descending, like the t schedule); endpoints are
        # traced values so the ramp is evaluated in jnp
        smin = sigmas_full[0]
        smax = sigmas_full[int(lin_ts[0])]
        rho = 7.0
        # len(lin_ts) <= n_steps when step_start truncates the schedule:
        # the karras spacing covers the same (shortened) step budget
        ramp = jnp.asarray(np.linspace(0, 1, len(lin_ts), dtype=np.float32))
        sig_k = (
            smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))
        ) ** rho
        # fractional timesteps: interp log-sigma against the (ascending)
        # table; the UNet's sinusoid embedding is continuous in t
        ts = jnp.interp(
            jnp.log(sig_k), jnp.log(sigmas_full),
            jnp.arange(n_train, dtype=jnp.float32),
        )
        sigmas = jnp.concatenate([sig_k, jnp.zeros((1,), jnp.float32)])
    else:
        ts = jnp.asarray(lin_ts)
        sigmas = jnp.concatenate(
            [sigmas_full[jnp.asarray(lin_ts)], jnp.zeros((1,), jnp.float32)]
        )
    return ts, sigmas


def inpaint_pin(mask, lat, noised_ref):
    """Per-step inpainting pin. Boolean masks take the reference's exact
    mask_where path (mod.rs:462-465, bitwise-identical to the historical
    behavior); float masks in [0, 1] blend soft-inpainting style
    (m*lat + (1-m)*ref — A1111's mask-blur semantics; a {0,1}-valued
    float mask reproduces the bool path bitwise because the f32
    multiplies by exactly 0.0/1.0 are exact)."""
    if mask.dtype == jnp.bool_:
        return jnp.where(mask, lat, noised_ref)
    m = mask.astype(lat.dtype)
    return m * lat + (1.0 - m) * noised_ref


def _scan_normal(k, shape):
    """Standard normal draw from a scan key. k [2]: one batch-shaped draw
    (reference-style single-seed semantics). k [B, 2]: one draw per image
    from its own key (per-image-seed contract, k_step_keys_per_seed)."""
    if k.ndim == 1:
        return jax.random.normal(k, shape, jnp.float32)
    return jax.vmap(
        lambda kk: jax.random.normal(kk, shape[1:], jnp.float32)
    )(k)


def _scan_fold(k, i: int):
    """fold_in for a scan key of either layout ([2] or [B, 2])."""
    if k.ndim == 1:
        return jax.random.fold_in(k, i)
    return jax.vmap(lambda kk: jax.random.fold_in(kk, i))(k)


def k_step_keys_per_seed(seeds, n_steps: int, stream: int = 2) -> jnp.ndarray:
    """Per-image scan keys [n_steps, B, 2] for the stochastic k-samplers:
    step noise for image i depends only on seeds[i] (fold_in `stream` of
    its key; stream 0 = initial noise, stream 1 = refiner re-noise,
    stream 2 = base-scan step noise, stream 3 = refiner-scan step noise),
    so fused server batches keep each request's full noise stream."""
    cols = [
        jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(int(s)), stream), n_steps
        )
        for s in seeds
    ]
    return jnp.stack(cols, axis=1)


def k_step_update(method: str, lat, denoised, old_denoised, sigma, sigma_next,
                  sigma_prev, is_first, noise=None, eta: float = 1.0):
    """One k-sampler latent update (pure math, no UNet).

    method="euler": EulerDiscrete's step (diffusers
    EulerDiscreteScheduler.step with gamma=0): d = (x - denoised)/sigma,
    x += d*(sigma_next - sigma).

    method="dpmpp": DPM-Solver++ 2M multistep (k-diffusion
    sample_dpmpp_2m, itself Lu et al. arXiv:2211.01095 algorithm 2) in
    lambda = -log(sigma) space; first step and final (sigma_next = 0)
    step fall back to the exact first-order DPM++ update. Pinned against
    a literal sequential transcription of the public loop in
    tests/test_k_goldens.py.

    method="euler_a": ancestral Euler (k-diffusion
    sample_euler_ancestral, s_noise=1): Euler step to sigma_down, then
    add `noise`*sigma_up, with (sigma_down, sigma_up) from
    get_ancestral_step.

    method="dpmpp_sde": DPM-Solver++(2M) SDE, midpoint solver (k-diffusion
    sample_dpmpp_2m_sde, s_noise=1), with independent per-step normals in
    place of the Brownian tree — the same substitution diffusers'
    DPMSolverMultistepScheduler algorithm_type='sde-dpmsolver++' makes.
    Final sigma_next=0 step returns `denoised` exactly, per the public
    loop.

    The stochastic methods require `noise` (a standard normal of lat's
    shape); `eta` is the ancestral/SDE noise fraction (1 = the public
    defaults). All four pinned against literal sequential transcriptions
    in tests/test_k_goldens.py.
    """
    if method == "euler":
        d = (lat - denoised) / sigma
        return lat + d * (sigma_next - sigma)
    if method == "euler_a":
        # k-diffusion get_ancestral_step(eta); sigma_next = 0 gives
        # sigma_up = 0, sigma_down = 0 -> x = denoised, noise term vanishes
        var = sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2
        sigma_up = jnp.minimum(sigma_next,
                               eta * jnp.sqrt(jnp.maximum(var, 0.0)))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next**2 - sigma_up**2, 0.0))
        d = (lat - denoised) / sigma
        x = lat + d * (sigma_down - sigma)
        return jnp.where(sigma_next > 0, x + noise * sigma_up, x)
    if method == "dpmpp_sde":
        lam = -jnp.log(sigma)
        lam_next = -jnp.log(jnp.maximum(sigma_next, 1e-10))
        h = lam_next - lam
        eta_h = eta * h
        em = -jnp.expm1(-h - eta_h)  # (-h - eta_h).expm1().neg()
        x = (sigma_next / sigma) * jnp.exp(-eta_h) * lat + em * denoised
        h_last = lam - (-jnp.log(sigma_prev))
        # first step has no history (old_denoised is zeros): the where
        # drops the 2nd-order term; r stays finite for debug_nans
        r = jnp.where(is_first, 1.0, h_last / h)
        x = x + jnp.where(is_first, 0.0, 0.5 * em / r) * (denoised - old_denoised)
        x = x + noise * sigma_next * jnp.sqrt(-jnp.expm1(-2.0 * eta_h))
        return jnp.where(sigma_next > 0, x, denoised)
    lam, lam_next = -jnp.log(sigma), -jnp.log(jnp.maximum(sigma_next, 1e-10))
    h = lam_next - lam
    ratio = jnp.where(sigma_next > 0, sigma_next / sigma, 0.0)
    em1 = -jnp.expm1(-h)  # (1 - e^-h)
    h_last = lam - (-jnp.log(sigma_prev))
    # first step has no history: r is irrelevant there (the where below
    # picks the first-order update) but must stay finite so NaNs can't
    # leak through jax.debug_nans
    r = jnp.where(is_first, 1.0, h_last / h)
    denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
    use_first_order = jnp.logical_or(is_first, sigma_next <= 0.0)
    d_eff = jnp.where(use_first_order, denoised, denoised_d)
    return ratio * lat + em1 * d_eff


def m3_scan_extras(sig: jnp.ndarray):
    """Static per-step inputs for the DPM++ 3M SDE scan: sig_prev2[i] =
    sig[i-2] (dummy sig[0] for i < 2) and the second-step flag (the step
    whose history holds one denoised — 2nd-order branch)."""
    n = sig.shape[0]
    sig_prev2 = jnp.concatenate([sig[:1], sig[:1], sig[:-2]])[:n]
    second = jnp.arange(n) == 1
    return sig_prev2, second


def dpmpp_3m_sde_update(lat, denoised, den1, den2, sigma, sigma_next,
                        sigma_prev, sigma_prev2, is_first, is_second,
                        noise, eta: float = 1.0):
    """DPM-Solver++(3M) SDE (k-diffusion sample_dpmpp_3m_sde, eta=1,
    s_noise=1), with independent per-step normals in place of the
    Brownian tree — the same substitution the dpmpp_sde path and
    diffusers' sde-dpmsolver++ make.

    Third-order multistep in lambda = -log(sigma) space: the exponential
    decay exp(-h*(eta+1)) toward `denoised`, then the 2nd/3rd-order
    history corrections with phi_2 = expm1(-h_eta)/h_eta + 1 and
    phi_3 = phi_2/h_eta - 1/2, exactly the public loop's operation order.
    Warmup follows the history: 1st order on the first step (no den1),
    2nd on the second (no den2), 3rd after. With a static sigma grid the
    public loop's carried step sizes are reproducible from the grid:
    h_1 = lam(sigma) - lam(sigma_prev), h_2 = lam(sigma_prev) -
    lam(sigma_prev2) (the same reconstruction unipc_step_update uses).
    Final sigma_next = 0 step returns `denoised` exactly. Pinned against
    a literal sequential transcription in tests/test_k_goldens.py."""
    lam = -jnp.log(sigma)
    lam_next = -jnp.log(jnp.maximum(sigma_next, 1e-10))
    h = lam_next - lam
    h_eta = h * (eta + 1.0)
    x = jnp.exp(-h_eta) * lat - jnp.expm1(-h_eta) * denoised

    # histories from the static grid; guards keep r0/r1 finite on the
    # warmup steps (the wheres below drop their branches) for debug_nans
    h_1 = lam - (-jnp.log(sigma_prev))
    h_2 = (-jnp.log(sigma_prev)) - (-jnp.log(sigma_prev2))
    r0 = jnp.where(is_first, 1.0, h_1 / h)
    r1 = jnp.where(jnp.logical_or(is_first, is_second), 1.0, h_2 / h)
    phi_2 = jnp.expm1(-h_eta) / h_eta + 1.0
    phi_3 = phi_2 / h_eta - 0.5

    d1_0 = (denoised - den1) / r0
    d1_1 = (den1 - den2) / r1
    d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
    d2 = (d1_0 - d1_1) / (r0 + r1)
    third = x + phi_2 * d1 - phi_3 * d2
    second = x + phi_2 * d1_0  # k-diffusion's h_2-is-None branch (d = d1_0)
    x = jnp.where(is_first, x, jnp.where(is_second, second, third))

    x = x + noise * sigma_next * jnp.sqrt(-jnp.expm1(-2.0 * h * eta))
    return jnp.where(sigma_next > 0, x, denoised)


def heun_proposal(lat, denoised, sigma, sigma_next):
    """Heun's Euler proposal x_2 = x + d*dt (k-diffusion sample_heun) —
    the point where the SECOND model eval happens, at sigma_next."""
    d = (lat - denoised) / sigma
    return lat + d * (sigma_next - sigma)


def ancestral_step_sigmas(sig, sig_next, eta: float = 1.0):
    """k-diffusion sampling.get_ancestral_step, vectorized:
    (sigma_down, sigma_up) with sigma_up = min(sigma_next,
    eta*sqrt(sig_next^2*(sig^2-sig_next^2)/sig^2)). sigma_next = 0 gives
    (0, 0) (the guards keep every intermediate finite for debug_nans)."""
    var = sig_next**2 * (sig**2 - sig_next**2) / sig**2
    sigma_up = jnp.minimum(sig_next, eta * jnp.sqrt(jnp.maximum(var, 0.0)))
    sigma_down = jnp.sqrt(jnp.maximum(sig_next**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


def mid_scan_extras(method: str, sigmas, sigmas_full, eta: float = 1.0):
    """Static per-step inputs for the mid-eval samplers (K_MID):
    (t_mid, sig_mid, sig_down, sig_up), each [n].

    The second model eval happens at the log-space midpoint sigma —
    sample_dpm_2's sigmas[i].log().lerp(target.log(), 0.5).exp() ==
    sqrt(sig * target), where target is sigma_next (dpm2) or the
    ancestral sigma_down (dpm2_a / dpmpp_2s_a; dpmpp_2s_ancestral's
    s = t + h/2 in t = -log(sigma) space is the same geometric mean).
    t_mid interpolates the fractional UNet timestep from log-sigma,
    exactly like the karras schedule's fractional conditioning
    (k-diffusion DiscreteSchedule.sigma_to_t). The final row (target 0)
    is a masked dummy — mid_combine's wheres never use it."""
    sig, sig_next = sigmas[:-1], sigmas[1:]
    if method == "dpm2":
        sig_down, sig_up = sig_next, jnp.zeros_like(sig_next)
    else:
        sig_down, sig_up = ancestral_step_sigmas(sig, sig_next, eta)
    sig_mid = jnp.sqrt(sig * jnp.maximum(sig_down, 1e-20))
    n_train = sigmas_full.shape[0]
    t_mid = jnp.interp(
        jnp.log(jnp.maximum(sig_mid, 1e-10)), jnp.log(sigmas_full),
        jnp.arange(n_train, dtype=jnp.float32),
    )
    return t_mid, sig_mid, sig_down, sig_up


def mid_proposal(method: str, lat, denoised, sigma, sig_mid, sig_down):
    """The point x_2 where the K_MID samplers' SECOND model eval happens
    (at sig_mid): dpm2 / dpm2_a take the Euler half-step x + d*(sig_mid
    - sigma); dpmpp_2s_a takes the DPM-Solver++ exponential half-step
    (sigma_fn(s)/sigma_fn(t))*x - expm1(-h/2)*denoised with
    h = log(sigma/sigma_down) (k-diffusion sample_dpmpp_2s_ancestral,
    r = 1/2). Pinned against literal transcriptions in
    tests/test_k_goldens.py."""
    if method == "dpmpp_2s_a":
        h = jnp.log(sigma / jnp.maximum(sig_down, 1e-10))
        return (sig_mid / sigma) * lat - jnp.expm1(-0.5 * h) * denoised
    d = (lat - denoised) / sigma
    return lat + d * (sig_mid - sigma)


def mid_combine(method: str, lat, denoised, x_2, denoised_2, sigma,
                sigma_next, sig_mid, sig_down, sig_up, noise=None):
    """Second-stage update of the K_MID samplers, exactly the public
    loops' operation order:

    dpm2   (sample_dpm_2):           x += d_2*(sigma_next - sigma) with
      d_2 the derivative at (x_2, sig_mid); plain Euler on the final
      (sigma_next = 0) step.
    dpm2_a (sample_dpm_2_ancestral): x += d_2*(sigma_down - sigma), then
      + noise*sigma_up — both only when sigma_down > 0 (the final step is
      plain Euler to 0, no noise, per the public if/else).
    dpmpp_2s_a (sample_dpmpp_2s_ancestral): x = (sigma_down/sigma)*x -
      expm1(-h)*denoised_2 (h = log(sigma/sigma_down)); Euler fallback
      when sigma_down == 0; then + noise*sigma_up whenever
      sigma_next > 0 (the noise line sits OUTSIDE the branch there).
    """
    d = (lat - denoised) / sigma
    sm = jnp.maximum(sig_mid, 1e-10)
    if method == "dpm2":
        d_2 = (x_2 - denoised_2) / sm
        x = lat + d_2 * (sigma_next - sigma)
        euler = lat + d * (sigma_next - sigma)
        return jnp.where(sigma_next > 0, x, euler)
    if method == "dpm2_a":
        d_2 = (x_2 - denoised_2) / sm
        x = lat + d_2 * (sig_down - sigma) + noise * sig_up
        euler = lat + d * (sig_down - sigma)
        return jnp.where(sig_down > 0, x, euler)
    # dpmpp_2s_a
    h = jnp.log(sigma / jnp.maximum(sig_down, 1e-10))
    x = (sig_down / sigma) * lat - jnp.expm1(-h) * denoised_2
    euler = lat + d * (sig_down - sigma)
    x = jnp.where(sig_down > 0, x, euler)
    return jnp.where(sigma_next > 0, x + noise * sig_up, x)


def lms_scan_coeffs(sigmas, order: int = 4):
    """Linear-multistep coefficients over the sigma grid — k-diffusion
    sample_lms's linear_multistep_coeff (order 4, the A1111 'LMS'
    sampler): coeff[i, j] = ∫_{sig[i]}^{sig[i+1]} Π_{k≠j, k<cur}
    (τ - sig[i-k]) / (sig[i-j] - sig[i-k]) dτ with cur = min(i+1,
    order); the update is x += Σ_j coeff[i, j] · d_{i-j}.

    The public code integrates with scipy.integrate.quad; the integrand
    is a polynomial of degree < order, which Gauss-Kronrod evaluates
    exactly, so the EXACT expansion computed here matches it to machine
    precision (asserted against the literal transcription in
    tests/test_k_goldens.py). The polynomial is expanded in the shifted
    variable u = τ - sig[i] (every root offset is O(local grid spacing))
    so the f32 evaluation stays cancellation-free. Rows are 0 for
    j >= cur — the scan's unused history slots (whose carry is zeros).
    """
    sig = sigmas[:-1]
    n = sig.shape[0]
    idx = jnp.arange(n)
    # r[k, i] = sig[i] - sig[i-k] (clamped at the head; masked below)
    r = jnp.stack([sig - sig[jnp.maximum(idx - k, 0)] for k in range(order)])
    cur = jnp.minimum(idx + 1, order)
    dt = sigmas[1:] - sig
    cols = []
    for j in range(order):
        # poly(u) = Π_{k≠j, k<cur} (u - r[k]) / (r[j] - r[k]); note
        # τ - sig[i-k] = u + (sig[i] - sig[i-k])... with r[k] =
        # sig[i] - sig[i-k] the factor is (u + r[k]), and the
        # denominator sig[i-j] - sig[i-k] = r[k] - r[j].
        c = [jnp.ones(n)] + [jnp.zeros(n)] * (order - 1)
        for k in range(order):
            if k == j:
                continue
            active = cur > k
            denom = jnp.where(active, r[k] - r[j], 1.0)
            nc = []
            for deg in range(order):
                term = (c[deg - 1] if deg else 0.0) + r[k] * c[deg]
                nc.append(jnp.where(active, term / denom, c[deg]))
            c = nc
        integ = sum(c[deg] * dt ** (deg + 1) / (deg + 1)
                    for deg in range(order))
        cols.append(jnp.where(cur > j, integ, 0.0))
    return jnp.stack(cols, axis=1)  # [n, order]


def heun_combine(lat, denoised, x_2, denoised_2, sigma, sigma_next):
    """k-diffusion sample_heun's 2nd-order combine (s_churn=0 path):
    average the derivative at (x, sigma) with the derivative at the Euler
    proposal (x_2, sigma_next); the final (sigma_next = 0) step is plain
    Euler, exactly as in the public loop (the masked lane keeps sigma_next
    clamped so every intermediate stays finite for jax.debug_nans).
    Pinned against a literal transcription in tests/test_k_goldens.py."""
    d = (lat - denoised) / sigma
    dt = sigma_next - sigma
    sn = jnp.maximum(sigma_next, 1e-10)
    d_2 = (x_2 - denoised_2) / sn
    return jnp.where(sigma_next > 0, lat + 0.5 * (d + d_2) * dt, x_2)


def unipc_scan_extras(sig: jnp.ndarray):
    """Static per-step inputs for the UniPC scan: sig_prev2[i] = sig[i-2]
    (dummy sig[0] for i < 2) plus the order masks of diffusers'
    UniPCMultistepScheduler state machine (solver_order=2,
    lower_order_final=True, disable_corrector=[]):

    - use_corr[i]: the UniC corrector runs from step 1 on (last_sample
      exists).
    - corr_o2[i]: corrector order is the PREVIOUS step's predictor order
      (step() assigns this_order after the corrector) — order 2 from step
      2 on.
    - pred_o2[i]: predictor order min(solver_order, n-i, i+1) == 2, i.e.
      order 1 on the first step (multistep warmup) and on the final step
      (lower_order_final).
    """
    n = sig.shape[0]
    idx = jnp.arange(n)
    sig_prev2 = jnp.concatenate([sig[:1], sig[:1], sig[:-2]])[:n]
    use_corr = idx >= 1
    corr_o2 = idx >= 2
    pred_o2 = jnp.logical_and(idx >= 1, idx <= n - 2)
    return sig_prev2, use_corr, corr_o2, pred_o2


def unipc_step_update(lat, denoised, m_prev, m_prev2, last_sample,
                      sigma, sigma_next, sigma_prev, sigma_prev2,
                      use_corr, corr_o2, pred_o2):
    """One UniPC step (Zhao et al. 2023, arXiv:2302.04867): UniC-2
    corrector at the current point, then UniP-2 predictor to sigma_next.

    Follows diffusers' UniPCMultistepScheduler exactly (predict_x0=True,
    solver_type='bh2', solver_order=2, lower_order_final=True), pinned
    against a literal transcription in tests/test_k_goldens.py. The math
    is carried in k-diffusion sigma space (x_kd = x_vp / alpha_t), where
    every alpha_t factor of the published VP-space update cancels:
    lambda = log(alpha_t/sigma_t) = -log(sigma_kd), and the x0-coefficient
    alpha_t*phi and the sample-coefficient sigma_t/sigma_s0 both lose
    their alphas after dividing the whole update by alpha_t.

    The corrector refines THIS step's input from `last_sample` (the
    corrected sample of the previous step) using the fresh model output
    `denoised` — one model eval per step, like DPM++ 2M, but with the
    B_h = expm1(hh) corrector stage that buys UniPC its accuracy edge at
    5-10 steps. m_prev/m_prev2 are the two previous x0 predictions (zeros
    before they exist; the masks gate them out). Returns
    (new_lat, corrected_sample) — the corrected sample becomes the next
    step's last_sample.

    Dummy-step guards (jnp.where on h/r before any division) keep every
    lane finite so jax.debug_nans stays clean.
    """
    f32 = jnp.float32
    lam = -jnp.log(sigma).astype(f32)
    lam_prev = -jnp.log(sigma_prev).astype(f32)
    lam_prev2 = -jnp.log(sigma_prev2).astype(f32)

    # --- UniC (bh2) corrector at (sigma, .) from last_sample @ sigma_prev
    h_c = jnp.where(use_corr, lam - lam_prev, 1.0)
    hh_c = -h_c
    h_phi_1_c = jnp.expm1(hh_c)
    B_h_c = h_phi_1_c  # bh2: B_h = expm1(hh)
    b1_c = (h_phi_1_c / hh_c - 1.0) / B_h_c
    h_phi_2_c = (h_phi_1_c / hh_c - 1.0) / hh_c - 0.5
    b2_c = h_phi_2_c * 2.0 / B_h_c
    # rks[0] for order 2: (lambda(t_{i-2}) - lambda(t_{i-1})) / h < 0, so
    # the dummy 2.0 (also != 1) only protects the masked-out lanes
    r0_c = jnp.where(corr_o2, (lam_prev2 - lam_prev) / h_c, 2.0)
    # solve [[1,1],[r0,1]] @ rhos = [b1,b2] in closed form
    rho0_c = (b2_c - b1_c) / (r0_c - 1.0)
    rho1_c = b1_c - rho0_c
    d1_0_c = (m_prev2 - m_prev) / r0_c
    d1_t = denoised - m_prev
    x_t_c = (sigma / sigma_prev) * last_sample - h_phi_1_c * m_prev
    corr = x_t_c - B_h_c * jnp.where(
        corr_o2, rho0_c * d1_0_c + rho1_c * d1_t, 0.5 * d1_t
    )
    x_c = jnp.where(use_corr, corr, lat)

    # --- UniP (bh2) predictor from (sigma, x_c) to sigma_next
    lam_next = -jnp.log(jnp.maximum(sigma_next, 1e-10)).astype(f32)
    h = lam_next - lam
    h_phi_1 = jnp.expm1(-h)
    B_h = h_phi_1  # bh2
    r0_p = jnp.where(pred_o2, (lam_prev - lam) / h, 1.0)
    d1_0_p = (m_prev - denoised) / r0_p
    x_t_p = (sigma_next / sigma) * x_c - h_phi_1 * denoised
    # order 2: rhos_p = [0.5] (diffusers hardcodes the 2-step case)
    pred = x_t_p - jnp.where(pred_o2, B_h * 0.5, 0.0) * d1_0_p
    new_lat = jnp.where(sigma_next > 0, pred, denoised)
    return new_lat, x_c


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "method", "step_start", "n_steps", "compute_dtype", "inpaint",
        "schedule", "use_cfg", "guidance_rescale", "control_cfg",
        "control_window", "deepcache", "pag_scale", "head_steps",
        "tail_from", "edit",
    ),
    donate_argnames=("latent",),
)
def k_diffuse_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod: jnp.ndarray,
    latent: jnp.ndarray,  # sigma-space latent: x = x0 + sigma*eps (see below)
    cond: Conditioning,
    guidance_scale: float,
    method: str = "euler",
    step_start: int = 0,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    schedule: str = "linear",
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    step_keys: Optional[jnp.ndarray] = None,
    ip=None,
    deepcache: Optional[Tuple[int, int]] = None,
    pag_scale: float = 0.0,
    head_steps: int = 0,
    tail_from: int = 0,
    edit: bool = False,
    image_guidance_scale: float = 1.5,
) -> jnp.ndarray:
    """k-diffusion samplers over the same ᾱ table the DDIM path uses.

    edit=True (InstructPix2Pix): concat_channels is the UNSCALED
    edit-image latent [B,h,w,4] and CFG becomes the 3-way
    [uncond | image | image+text] split (see _cfg_eps image_scale).

    head_steps > 0 (ensemble-of-experts base stage, diffusers'
    denoising_end): run only the first head_steps entries of the grid —
    the scan stops at the HANDOFF sigma sigmas[head_steps] (not 0) and
    returns the still-noisy sigma-space latent for a refiner running the
    complementary tail with no re-noise. Every scan input is the PREFIX
    of the full schedule's (heun's next-t, unipc's order masks, the
    control window, the deepcache cadence), exactly as diffusers'
    pipeline slices `timesteps` without re-deriving scheduler state —
    the head IS the full run's first head_steps steps bitwise.

    tail_from > 0 (the matching refiner stage, diffusers' img2img
    denoising_start): run the grid's SUFFIX — ts[tail_from:] and
    sigmas[tail_from:] of the full schedule (so the first sigma IS the
    handoff sigma the head stopped at, for any schedule incl.
    karras/ays whose spacing a step_start re-derivation would NOT
    reproduce) — with FRESH scheduler state (first-step flag, unipc
    order masks, multistep history), exactly as diffusers' refiner
    pipeline enters a new scheduler over the sliced timesteps. For the
    memoryless samplers (euler, ddim) head(h) + tail_from(h) == one
    full run bitwise; the multistep samplers re-warm up at the
    boundary, as diffusers' two-pipeline split does.

    schedule="linear" picks sigmas at linearly spaced integer timesteps;
    schedule="karras" uses the Karras rho=7 sigma spacing between the same
    endpoints, with fractional UNet timesteps interpolated from the sigma
    table (the continuous-time conditioning diffusers uses for the same
    schedule).

    Works in sigma space (x_kd = x_vp / sqrt(ᾱ), σ = sqrt((1-ᾱ)/ᾱ)): the
    UNet input is scaled by 1/sqrt(σ²+1) = sqrt(ᾱ), which maps back to the
    variance-preserving latent the model was trained on. Both methods are
    deterministic; the seed only enters through the initial noise.

    method="euler": EulerDiscrete — denoised = x - σ·ε̂,
      x += (σ_next - σ)·(x - denoised)/σ.
    method="dpmpp": DPM-Solver++ 2M — second-order multistep in
      λ = -log σ space with the standard first-order fallback on the first
      step and on the final (σ_next = 0) step. ~2x quality per step vs
      Euler/DDIM at low step counts (capability extension; the reference
      ships only DDIM).

    Inpainting pins the unmasked region to reference + σ·noise before each
    UNet call (sigma-space analogue of mod.rs:462-465).

    method="euler_a"/"dpmpp_sde" (stochastic): per-step noise is drawn
    inside the scan from fold_in(keys[i], 1) (stream 0 is the inpaint
    pin). step_keys [n_steps, B, 2] overrides the key-split scan keys
    with PER-IMAGE keys (k_step_keys_per_seed): image i's step noise then
    depends only on its own seed, extending the per-image-seed contract
    to the stochastic samplers (fused serving).

    method="unipc": UniPC predictor-corrector (arXiv:2302.04867,
    diffusers UniPCMultistepScheduler semantics: bh2 / predict_x0 /
    order 2 / lower_order_final), deterministic, one UNet eval per step;
    the scan carry extends to (lat, m_prev, m_prev2, last_sample) — see
    unipc_step_update.

    method="euler_cfgpp": CFG++ (Chung et al. 2024, arXiv:2406.08070;
    the k-diffusion/ComfyUI sample_euler_cfg_pp loop): the Euler step
    targets the GUIDED denoised but re-noises along the UNCONDITIONAL
    epsilon — x_next = denoised + sigma_next * eps_uncond — taming the
    off-manifold drift of large guidance scales (intended scales ~1-2).
    Unguided (refiner tail / no-CFG) eps_uncond == eps, so the method
    degrades to plain Euler exactly and is handled as such.
    """
    if method not in K_SAMPLERS:
        raise ValueError(
            f"unknown k-sampler {method!r} ({'|'.join(K_SAMPLERS)})"
        )
    if schedule not in ("linear", "karras", "ays", "ays_sd15",
                        "trailing", "leading"):
        raise ValueError(
            f"unknown schedule {schedule!r} "
            "(linear|karras|ays|ays_sd15|trailing|leading)")
    if pag_scale and (control_params is not None or deepcache is not None):
        raise ValueError("pag_scale is not combinable with ControlNet or "
                         "deepcache")
    ts, sigmas = k_schedule(alphas_cumprod, step_start, n_steps, schedule)
    if head_steps and tail_from:
        raise ValueError("head_steps and tail_from are mutually exclusive "
                         "(one stage is either the head or the tail)")
    if head_steps and not 0 < head_steps < int(ts.shape[0]):
        raise ValueError(
            f"head_steps={head_steps} must leave at least one step on "
            f"each side of the {int(ts.shape[0])}-entry grid")
    if tail_from:
        if not 0 < tail_from < int(ts.shape[0]):
            raise ValueError(
                f"tail_from={tail_from} must leave at least one step on "
                f"each side of the {int(ts.shape[0])}-entry grid")
        # the full schedule's suffix: sigmas keeps its trailing 0, the
        # first kept sigma is the handoff level; everything derived below
        # (first flag, keys, unipc masks, control window, deepcache
        # cadence) rebuilds fresh over the tail
        ts = ts[tail_from:]
        sigmas = sigmas[tail_from:]

    if method == "euler_cfgpp" and (cfg.is_refiner or not use_cfg):
        # unguided there is no cond/uncond split and eps_u == eps, so
        # CFG++ IS plain Euler — take that path exactly (refiner tails,
        # --no-cfg / guidance_scale == 1)
        method = "euler"
    cfgpp = method == "euler_cfgpp"
    if cfgpp and deepcache is not None:
        raise ValueError("euler_cfgpp is not combinable with deepcache "
                         "(the cached-step eps path has no uncond split)")

    stochastic = method in K_STOCHASTIC
    latent = latent.astype(jnp.float32)
    if inpaint:
        reference = reference.astype(jnp.float32)
    if step_keys is not None:
        keys = step_keys  # [T, B, 2]: per-image scan keys
    elif inpaint or stochastic:
        if key is None:
            raise ValueError(f"method {method!r} needs a PRNG key")
        keys = jax.random.split(key, ts.shape[0])
    else:
        keys = jnp.zeros((ts.shape[0], 2), dtype=jnp.uint32)

    if edit:
        if method in ("euler_cfgpp",):
            raise ValueError("euler_cfgpp does not apply to the ip2p 3-way "
                             "CFG (no single uncond direction)")
        _edit_validate(cfg, concat_channels, inpaint, control_params,
                       deepcache, pag_scale, ip, guidance_rescale, use_cfg)
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype, use_cfg, rows3=edit)
    cross_kv = precompute_cross_kv(unet_params, cfg.unet_config(), ctx2)
    cross_kv = _merge_ip(cross_kv, ip, cfg, cond, compute_dtype, use_cfg)
    cc = concat_channels
    if cc is not None and use_cfg and not cfg.is_refiner:
        if edit:  # ip2p rows: [no image | image | image]
            cc = jnp.concatenate([jnp.zeros_like(cc), cc, cc], axis=0)
        else:
            cc = jnp.concatenate([cc, cc], axis=0)
    img_scale = image_guidance_scale if (edit and use_cfg) else None
    ctrl, ctrl_kv = _control_setup(control_params, control_cfg, control_image,
                                   ctx2, compute_dtype, use_cfg, cfg.is_refiner)
    cscales = _control_window_scales(int(ts.shape[0]), control_scale,
                                     control_window)

    sig, sig_next = sigmas[:-1], sigmas[1:]
    sig_prev = jnp.concatenate([sigmas[:1], sigmas[:-2]])  # sig[i-1]; dummy @0
    first = jnp.arange(ts.shape[0]) == 0
    unipc = method == "unipc"
    heun = method == "heun"
    m3 = method == "dpmpp_3m_sde"
    mid_ = method in K_MID
    lms_ = method == "lms"
    if unipc:
        # per-step order masks + sig[i-2] for the predictor-corrector
        sig_prev2, u_corr, c_o2, p_o2 = unipc_scan_extras(sig)
        extras = (sig_prev2, u_corr, c_o2, p_o2)
    elif heun:
        # the 2nd model eval is conditioned at the NEXT step's timestep;
        # the final entry is a masked dummy (sigma_next = 0 -> plain Euler)
        tsj = jnp.asarray(ts)
        extras = (jnp.concatenate([tsj[1:], tsj[-1:]]),)
    elif m3:
        # sig[i-2] + second-step flag for the 3rd-order history
        extras = m3_scan_extras(sig)
    elif mid_:
        # the 2nd model eval is conditioned at the log-space mid sigma
        sigmas_full = jnp.sqrt(
            (1.0 - alphas_cumprod.astype(jnp.float32)) / alphas_cumprod)
        extras = mid_scan_extras(method, sigmas, sigmas_full)
    elif lms_:
        # per-step linear-multistep coefficient rows over the sigma grid
        extras = (lms_scan_coeffs(sigmas),)
    else:
        extras = ()

    if (heun or mid_) and deepcache is not None:
        raise ValueError(f"{method} (two UNet evals per step) is not "
                         "combinable with deepcache")
    if lms_ and deepcache is not None:
        raise ValueError("lms (4-deep derivative history) is not "
                         "combinable with deepcache")

    if deepcache is not None:
        interval, branch = _deepcache_validate(deepcache, control_params,
                                               concat_channels)
        full_flags = _deepcache_schedule(int(ts.shape[0]), interval)
        cache0 = _deepcache_init(unet_params, cfg, latent, ctx2, ch2,
                                 compute_dtype, cross_kv, use_cfg, branch)

        def dc_step(carry, inp):
            if unipc:
                lat, m_prev, m_prev2, last_sample, cache = carry
                (t, sigma, sigma_next, sigma_prev, is_first, k,
                 sigma_prev2, uc, c2, p2, is_full) = inp
            elif m3:
                lat, den1, den2, cache = carry
                (t, sigma, sigma_next, sigma_prev, is_first, k,
                 sigma_prev2, is_second, is_full) = inp
            else:
                lat, old_denoised, cache = carry
                t, sigma, sigma_next, sigma_prev, is_first, k, is_full = inp
            if inpaint:
                noise = _scan_normal(k, lat.shape)
                lat = inpaint_pin(mask, lat, reference + sigma * noise)
            scaled = lat / jnp.sqrt(sigma**2 + 1.0)
            eps, cache = _cfg_eps_deepcache(
                unet_params, cfg, scaled, t, ctx2, ch2, guidance_scale,
                compute_dtype, cross_kv, 1.0 / (sigma**2 + 1.0), use_cfg,
                guidance_rescale, cache, is_full, branch,
            )
            denoised = lat - sigma * eps
            if unipc:
                new_lat, x_c = unipc_step_update(
                    lat, denoised, m_prev, m_prev2, last_sample,
                    sigma, sigma_next, sigma_prev, sigma_prev2, uc, c2, p2)
                return (new_lat, denoised, m_prev, x_c, cache), None
            if m3:
                snoise = _scan_normal(_scan_fold(k, 1), lat.shape)
                new_lat = dpmpp_3m_sde_update(
                    lat, denoised, den1, den2, sigma, sigma_next,
                    sigma_prev, sigma_prev2, is_first, is_second, snoise)
                return (new_lat, denoised, den1, cache), None
            snoise = (_scan_normal(_scan_fold(k, 1), lat.shape)
                      if stochastic else None)
            new_lat = k_step_update(method, lat, denoised, old_denoised,
                                    sigma, sigma_next, sigma_prev, is_first,
                                    noise=snoise)
            return (new_lat, denoised, cache), None

        z = jnp.zeros_like(latent)
        carry0 = ((latent, z, z, latent, cache0) if unipc
                  else (latent, z, z, cache0) if m3
                  else (latent, z, cache0))
        inputs = ((jnp.asarray(ts), sig, sig_next, sig_prev, first, keys)
                  + extras + (full_flags,))
        if head_steps:  # expert head: the full schedule's prefix
            inputs = tuple(a[:head_steps] for a in inputs)
        carry, _ = jax.lax.scan(dc_step, carry0, inputs)
        return carry[0]

    def step(carry, inp):
        if unipc:
            lat, m_prev, m_prev2, last_sample = carry
            (t, sigma, sigma_next, sigma_prev, is_first, k,
             sigma_prev2, uc, c2, p2, cs) = inp
        elif heun:
            lat, old_denoised = carry
            t, sigma, sigma_next, sigma_prev, is_first, k, t_nx, cs = inp
        elif m3:
            lat, den1, den2 = carry
            (t, sigma, sigma_next, sigma_prev, is_first, k,
             sigma_prev2, is_second, cs) = inp
        elif mid_:
            lat, old_denoised = carry
            (t, sigma, sigma_next, sigma_prev, is_first, k,
             t_mid, s_mid, s_down, s_up, cs) = inp
        elif lms_:
            lat, d1, d2, d3 = carry
            t, sigma, sigma_next, sigma_prev, is_first, k, co, cs = inp
        else:
            lat, old_denoised = carry
            t, sigma, sigma_next, sigma_prev, is_first, k, cs = inp
        if inpaint:
            noise = _scan_normal(k, lat.shape)
            lat = inpaint_pin(mask, lat, reference + sigma * noise)

        scaled = lat / jnp.sqrt(sigma**2 + 1.0)
        # in sigma space a-bar = 1/(sigma^2+1); needed for v-prediction
        eps = _cfg_eps(unet_params, cfg, scaled, t, ctx2, ch2, guidance_scale,
                       compute_dtype, cross_kv, 1.0 / (sigma**2 + 1.0),
                       use_cfg=use_cfg, guidance_rescale=guidance_rescale,
                       concat=cc, control=ctrl, control_cfg=control_cfg,
                       control_kv=ctrl_kv, control_scale=cs,
                       pag_scale=pag_scale, return_uncond=cfgpp,
                       image_scale=img_scale)
        if cfgpp:
            eps, eps_u = eps
        denoised = lat - sigma * eps
        if cfgpp:
            # CFG++ (arXiv:2406.08070; k-diffusion sample_euler_cfg_pp):
            # Euler step toward the GUIDED denoised along the UNCOND
            # noise direction — x_next = denoised + sigma_next * eps_u
            # (to_d(x, sigma, uncond_denoised) == eps_u exactly)
            new_lat = denoised + sigma_next * eps_u
            return (new_lat, denoised), None
        if unipc:
            new_lat, x_c = unipc_step_update(
                lat, denoised, m_prev, m_prev2, last_sample,
                sigma, sigma_next, sigma_prev, sigma_prev2, uc, c2, p2)
            return (new_lat, denoised, m_prev, x_c), None
        if m3:
            snoise = _scan_normal(_scan_fold(k, 1), lat.shape)
            new_lat = dpmpp_3m_sde_update(
                lat, denoised, den1, den2, sigma, sigma_next,
                sigma_prev, sigma_prev2, is_first, is_second, snoise)
            return (new_lat, denoised, den1), None
        if heun:
            x_2 = heun_proposal(lat, denoised, sigma, sigma_next)
            sn = jnp.maximum(sigma_next, 1e-10)
            scaled_2 = x_2 / jnp.sqrt(sn**2 + 1.0)
            eps_2 = _cfg_eps(unet_params, cfg, scaled_2, t_nx, ctx2, ch2,
                             guidance_scale, compute_dtype, cross_kv,
                             1.0 / (sn**2 + 1.0), use_cfg=use_cfg,
                             guidance_rescale=guidance_rescale, concat=cc,
                             control=ctrl, control_cfg=control_cfg,
                             control_kv=ctrl_kv, control_scale=cs,
                             pag_scale=pag_scale, image_scale=img_scale)
            denoised_2 = x_2 - sn * eps_2
            new_lat = heun_combine(lat, denoised, x_2, denoised_2,
                                   sigma, sigma_next)
            return (new_lat, denoised), None
        if mid_:
            x_2 = mid_proposal(method, lat, denoised, sigma, s_mid, s_down)
            sm = jnp.maximum(s_mid, 1e-10)
            scaled_2 = x_2 / jnp.sqrt(sm**2 + 1.0)
            eps_2 = _cfg_eps(unet_params, cfg, scaled_2, t_mid, ctx2, ch2,
                             guidance_scale, compute_dtype, cross_kv,
                             1.0 / (sm**2 + 1.0), use_cfg=use_cfg,
                             guidance_rescale=guidance_rescale, concat=cc,
                             control=ctrl, control_cfg=control_cfg,
                             control_kv=ctrl_kv, control_scale=cs,
                             pag_scale=pag_scale, image_scale=img_scale)
            denoised_2 = x_2 - sm * eps_2
            snoise = (_scan_normal(_scan_fold(k, 1), lat.shape)
                      if stochastic else None)
            new_lat = mid_combine(method, lat, denoised, x_2, denoised_2,
                                  sigma, sigma_next, s_mid, s_down, s_up,
                                  noise=snoise)
            return (new_lat, denoised), None
        if lms_:
            d = (lat - denoised) / sigma
            new_lat = lat + co[0] * d + co[1] * d1 + co[2] * d2 + co[3] * d3
            return (new_lat, d, d1, d2), None
        snoise = (_scan_normal(_scan_fold(k, 1), lat.shape)
                  if stochastic else None)
        new_lat = k_step_update(method, lat, denoised, old_denoised,
                                sigma, sigma_next, sigma_prev, is_first,
                                noise=snoise)
        return (new_lat, denoised), None

    z = jnp.zeros_like(latent)
    carry0 = ((latent, z, z, latent) if unipc
              else (latent, z, z) if m3
              else (latent, z, z, z) if lms_ else (latent, z))
    inputs = ((jnp.asarray(ts), sig, sig_next, sig_prev, first, keys)
              + extras + (cscales,))
    if head_steps:  # expert head: the full schedule's prefix
        inputs = tuple(a[:head_steps] for a in inputs)
    carry, _ = jax.lax.scan(step, carry0, inputs)
    return carry[0]


def k_sigma_at(alphas_cumprod, t: int) -> jnp.ndarray:
    a = alphas_cumprod[t]
    return jnp.sqrt((1.0 - a) / a)


def k_sigma_max(alphas_cumprod, n_steps: int,
                schedule: str = "linear") -> jnp.ndarray:
    """The schedule's actual first sigma — the initial-noise scale for
    the sigma-space samplers. For linear/karras this equals
    sigma(t_max); the AYS tables carry their own (slightly different)
    published top value, and x0 + sigmas[0]*eps must use the same number
    the scan starts from."""
    _, sigmas = k_schedule(alphas_cumprod, 0, n_steps, schedule)
    return sigmas[0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "method", "compute_dtype", "inpaint", "use_cfg",
                     "guidance_rescale", "control_cfg"),
)
def _k_segment(
    unet_params,
    cfg: DiffuserConfig,
    lat: jnp.ndarray,
    old_denoised: jnp.ndarray,
    cond: Conditioning,
    guidance_scale: float,
    ts, sig, sig_next, sig_prev, first, keys,
    compute_dtype=jnp.bfloat16,
    method: str = "euler",
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scales: Optional[jnp.ndarray] = None,
    control_cfg=None,
    ip=None,
    m_prev2: Optional[jnp.ndarray] = None,
    last_sample: Optional[jnp.ndarray] = None,
    seg_extras=None,
):
    """A slice of the k-sampler scan with explicit (lat, old_denoised)
    carry — the segmented twin of k_diffuse_latent's loop, step math
    identical (k_step_update), so chaining segments reproduces the
    unsegmented trajectory exactly (incl. the DPM++ 2M multistep history
    across a segment boundary). control_scales: per-step ControlNet scale
    slice aligned with ts (the preview driver pre-applies the window).

    method="unipc" extends the carry with (m_prev2, last_sample) and takes
    seg_extras = this segment's (sig_prev2, use_corr, corr_o2, pred_o2)
    slices (unipc_scan_extras over the FULL schedule, sliced by the
    driver, so segmented == unsegmented bitwise); returns the 4-carry.

    method="heun" takes seg_extras = (ts_next,) — this segment's slice of
    the FULL next-timestep array, so the 2nd model eval at a segment's
    last step is conditioned exactly like the unsegmented scan's.

    method="dpmpp_3m_sde" carries the second history slot in `m_prev2`
    (den2) and takes seg_extras = this segment's (sig_prev2, is_second)
    slices (m3_scan_extras over the FULL schedule); returns a 3-carry."""
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype, use_cfg)
    cross_kv = precompute_cross_kv(unet_params, cfg.unet_config(), ctx2)
    cross_kv = _merge_ip(cross_kv, ip, cfg, cond, compute_dtype, use_cfg)
    cc = concat_channels
    if cc is not None and use_cfg and not cfg.is_refiner:
        cc = jnp.concatenate([cc, cc], axis=0)
    ctrl, ctrl_kv = _control_setup(control_params, control_cfg, control_image,
                                   ctx2, compute_dtype, use_cfg, cfg.is_refiner)
    if control_scales is None:
        control_scales = jnp.zeros(ts.shape, jnp.float32)

    unipc = method == "unipc"
    heun = method == "heun"
    m3 = method == "dpmpp_3m_sde"
    mid_ = method in K_MID
    lms_ = method == "lms"
    cfgpp = method == "euler_cfgpp" and use_cfg and not cfg.is_refiner
    if method == "euler_cfgpp" and not cfgpp:
        method = "euler"  # unguided CFG++ IS Euler (k_diffuse_latent)

    def step(carry, inp):
        if unipc:
            lat, old_denoised, m_p2, last_s = carry
            (t, sigma, sigma_next, sigma_prev, is_first, k,
             sigma_prev2, uc, c2, p2, cs) = inp
        elif m3:
            lat, old_denoised, den2 = carry
            (t, sigma, sigma_next, sigma_prev, is_first, k,
             sigma_prev2, is_second, cs) = inp
        elif heun:
            lat, old_denoised = carry
            t, sigma, sigma_next, sigma_prev, is_first, k, t_nx, cs = inp
        elif mid_:
            lat, old_denoised = carry
            (t, sigma, sigma_next, sigma_prev, is_first, k,
             t_mid, s_mid, s_down, s_up, cs) = inp
        elif lms_:
            lat, d1, d2, d3 = carry
            t, sigma, sigma_next, sigma_prev, is_first, k, co, cs = inp
        else:
            lat, old_denoised = carry
            t, sigma, sigma_next, sigma_prev, is_first, k, cs = inp
        if inpaint:
            noise = _scan_normal(k, lat.shape)
            lat = inpaint_pin(mask, lat, reference + sigma * noise)
        scaled = lat / jnp.sqrt(sigma**2 + 1.0)
        eps = _cfg_eps(unet_params, cfg, scaled, t, ctx2, ch2, guidance_scale,
                       compute_dtype, cross_kv, 1.0 / (sigma**2 + 1.0),
                       use_cfg=use_cfg, guidance_rescale=guidance_rescale,
                       concat=cc, control=ctrl, control_cfg=control_cfg,
                       control_kv=ctrl_kv, control_scale=cs,
                       return_uncond=cfgpp)
        if cfgpp:
            eps, eps_u = eps
        denoised = lat - sigma * eps
        if cfgpp:
            # same CFG++ update as k_diffuse_latent's scan
            return (denoised + sigma_next * eps_u, denoised), None
        if unipc:
            new_lat, x_c = unipc_step_update(
                lat, denoised, old_denoised, m_p2, last_s,
                sigma, sigma_next, sigma_prev, sigma_prev2, uc, c2, p2)
            return (new_lat, denoised, old_denoised, x_c), None
        if m3:
            snoise = _scan_normal(_scan_fold(k, 1), lat.shape)
            new_lat = dpmpp_3m_sde_update(
                lat, denoised, old_denoised, den2, sigma, sigma_next,
                sigma_prev, sigma_prev2, is_first, is_second, snoise)
            return (new_lat, denoised, old_denoised), None
        if heun:
            x_2 = heun_proposal(lat, denoised, sigma, sigma_next)
            sn = jnp.maximum(sigma_next, 1e-10)
            scaled_2 = x_2 / jnp.sqrt(sn**2 + 1.0)
            eps_2 = _cfg_eps(unet_params, cfg, scaled_2, t_nx, ctx2, ch2,
                             guidance_scale, compute_dtype, cross_kv,
                             1.0 / (sn**2 + 1.0), use_cfg=use_cfg,
                             guidance_rescale=guidance_rescale, concat=cc,
                             control=ctrl, control_cfg=control_cfg,
                             control_kv=ctrl_kv, control_scale=cs)
            denoised_2 = x_2 - sn * eps_2
            new_lat = heun_combine(lat, denoised, x_2, denoised_2,
                                   sigma, sigma_next)
            return (new_lat, denoised), None
        if mid_:
            x_2 = mid_proposal(method, lat, denoised, sigma, s_mid, s_down)
            sm = jnp.maximum(s_mid, 1e-10)
            scaled_2 = x_2 / jnp.sqrt(sm**2 + 1.0)
            eps_2 = _cfg_eps(unet_params, cfg, scaled_2, t_mid, ctx2, ch2,
                             guidance_scale, compute_dtype, cross_kv,
                             1.0 / (sm**2 + 1.0), use_cfg=use_cfg,
                             guidance_rescale=guidance_rescale, concat=cc,
                             control=ctrl, control_cfg=control_cfg,
                             control_kv=ctrl_kv, control_scale=cs)
            denoised_2 = x_2 - sm * eps_2
            snoise = (_scan_normal(_scan_fold(k, 1), lat.shape)
                      if method in K_STOCHASTIC else None)
            new_lat = mid_combine(method, lat, denoised, x_2, denoised_2,
                                  sigma, sigma_next, s_mid, s_down, s_up,
                                  noise=snoise)
            return (new_lat, denoised), None
        if lms_:
            d = (lat - denoised) / sigma
            new_lat = lat + co[0] * d + co[1] * d1 + co[2] * d2 + co[3] * d3
            return (new_lat, d, d1, d2), None
        snoise = (_scan_normal(_scan_fold(k, 1), lat.shape)
                  if method in K_STOCHASTIC else None)
        new_lat = k_step_update(method, lat, denoised, old_denoised,
                                sigma, sigma_next, sigma_prev, is_first,
                                noise=snoise)
        return (new_lat, denoised), None

    if unipc:
        carry0 = (lat, old_denoised, m_prev2, last_sample)
        inputs = (ts, sig, sig_next, sig_prev, first, keys) + tuple(
            seg_extras) + (control_scales,)
    elif m3:
        carry0 = (lat, old_denoised, m_prev2)  # m_prev2 rides as den2
        inputs = (ts, sig, sig_next, sig_prev, first, keys) + tuple(
            seg_extras) + (control_scales,)
    elif heun or mid_:
        carry0 = (lat, old_denoised)
        inputs = (ts, sig, sig_next, sig_prev, first, keys) + tuple(
            seg_extras) + (control_scales,)
    elif lms_:
        # 4-deep derivative history rides (old_denoised, m_prev2,
        # last_sample) as (d1, d2, d3); seg_extras = this segment's
        # coefficient-row slice of the FULL schedule's lms_scan_coeffs
        carry0 = (lat, old_denoised, m_prev2, last_sample)
        inputs = (ts, sig, sig_next, sig_prev, first, keys) + tuple(
            seg_extras) + (control_scales,)
    else:
        carry0 = (lat, old_denoised)
        inputs = (ts, sig, sig_next, sig_prev, first, keys, control_scales)
    return jax.lax.scan(step, carry0, inputs)[0]


def k_diffuse_latent_preview(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    latent: jnp.ndarray,  # sigma-space latent (x0 + sigma_max * eps)
    cond: Conditioning,
    guidance_scale: float,
    preview_every: int,
    preview_callback,
    method: str = "euler",
    step_start: int = 0,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    schedule: str = "linear",
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    preview_factors: Optional[np.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    step_keys: Optional[jnp.ndarray] = None,
    ip=None,
) -> jnp.ndarray:
    """k_diffuse_latent, segmented every `preview_every` steps: between
    segments, preview_callback(done, total, rgb_u8) receives a linear-map
    preview of the current latent scaled back to VP space
    (x / sqrt(sigma^2+1) — the same noisy-latent view the DDIM previews
    show). Step math identical to k_diffuse_latent; the final latent
    matches the unsegmented run (the DPM++ multistep history is carried
    across segment boundaries)."""
    if preview_every < 1:
        raise ValueError("preview_every must be >= 1")
    if method not in K_SAMPLERS:
        raise ValueError(
            f"unknown k-sampler {method!r} ({'|'.join(K_SAMPLERS)})"
        )
    ts, sigmas = k_schedule(alphas_cumprod, step_start, n_steps, schedule)
    ts = np.asarray(ts)
    sigmas = np.asarray(sigmas)
    sig, sig_next = sigmas[:-1], sigmas[1:]
    sig_prev = np.concatenate([sigmas[:1], sigmas[:-2]])
    first = np.arange(len(ts)) == 0
    total = len(ts)
    # identical key layout to k_diffuse_latent, so segmented previews are
    # bit-identical to the unsegmented run (incl. stochastic step noise)
    if step_keys is not None:
        keys = step_keys
    elif inpaint or method in K_STOCHASTIC:
        keys = jax.random.split(key, total)
    else:
        keys = jnp.zeros((total, 2), dtype=jnp.uint32)
    cscales = _control_window_scales(total, control_scale, control_window)

    lat = latent.astype(jnp.float32)
    old = jnp.zeros_like(lat)
    unipc = method == "unipc"
    heun = method == "heun"
    m3 = method == "dpmpp_3m_sde"
    if unipc:
        # FULL-schedule extras, sliced per segment below, so segment
        # boundaries don't reset the order masks / sig[i-2] history
        full_extras = unipc_scan_extras(jnp.asarray(sig))
        old2, last = jnp.zeros_like(lat), lat
    elif heun:
        # full next-timestep array, sliced per segment (a segment's last
        # step conditions its 2nd eval exactly like the unsegmented scan)
        full_extras = (jnp.asarray(np.concatenate([ts[1:], ts[-1:]])),)
    elif m3:
        # sig[i-2] + second-step flags over the FULL schedule, so segment
        # boundaries don't reset the 3rd-order history
        full_extras = m3_scan_extras(jnp.asarray(sig))
        old2 = jnp.zeros_like(lat)
    elif method in K_MID:
        # mid-sigma eval points over the full schedule (stateless rows)
        sigmas_full = jnp.sqrt(
            (1.0 - alphas_cumprod.astype(jnp.float32)) / alphas_cumprod)
        full_extras = mid_scan_extras(method, jnp.asarray(sigmas),
                                      sigmas_full)
    elif method == "lms":
        # FULL-schedule coefficient rows + the 4-deep derivative history
        # carried across segment boundaries (old/old2/last ride as
        # d1/d2/d3), so segmented == unsegmented bitwise
        full_extras = (lms_scan_coeffs(jnp.asarray(sigmas)),)
        old2, last = jnp.zeros_like(lat), jnp.zeros_like(lat)
    done = 0
    while done < total:
        end = min(done + preview_every, total)
        if unipc or method == "lms":
            seg = dict(m_prev2=old2, last_sample=last,
                       seg_extras=tuple(e[done:end] for e in full_extras))
        elif m3:
            seg = dict(m_prev2=old2,
                       seg_extras=tuple(e[done:end] for e in full_extras))
        elif heun or method in K_MID:
            seg = dict(seg_extras=tuple(e[done:end] for e in full_extras))
        else:
            seg = {}
        carry = _k_segment(
            unet_params, cfg, lat, old, cond, guidance_scale,
            jnp.asarray(ts[done:end]), jnp.asarray(sig[done:end]),
            jnp.asarray(sig_next[done:end]), jnp.asarray(sig_prev[done:end]),
            jnp.asarray(first[done:end]), keys[done:end],
            compute_dtype=compute_dtype, method=method, inpaint=inpaint,
            reference=reference, mask=mask, use_cfg=use_cfg,
            guidance_rescale=guidance_rescale,
            concat_channels=concat_channels,
            control_params=control_params, control_image=control_image,
            control_scales=cscales[done:end], control_cfg=control_cfg,
            **seg,
        )
        if unipc or method == "lms":
            lat, old, old2, last = carry
        elif m3:
            lat, old, old2 = carry
        else:
            lat, old = carry
        done = end
        if preview_callback is not None and done < total:
            vp = lat / np.sqrt(float(sig_next[done - 1]) ** 2 + 1.0)
            preview_callback(done, total,
                             latent_to_preview(vp, preview_factors))
    return lat


def euler_sample_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    method: str = "euler",
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    schedule: str = "linear",
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    initial_noise: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    step_keys: Optional[jnp.ndarray] = None,
    ip=None,
    deepcache: Optional[Tuple[int, int]] = None,
    pag_scale: float = 0.0,
    head_steps: int = 0,
    edit: bool = False,
    image_guidance_scale: float = 1.5,
) -> jnp.ndarray:
    """txt2img (+ optional inpainting) with a k-diffusion sampler.

    The scan key (inpaint pin + stochastic-method step noise) is the
    second split of `key`; step_keys overrides it with per-image keys.
    head_steps > 0: ensemble-of-experts base stage (see k_diffuse_latent)
    — returns the still-noisy sigma-space handoff latent.
    edit=True: InstructPix2Pix (see k_diffuse_latent)."""
    noise_key, inpaint_key = jax.random.split(key)
    sigma_max = k_sigma_max(alphas_cumprod, n_steps, schedule)
    latent = (initial_noise if initial_noise is not None
              else gen_noise(noise_key, cond)) * sigma_max
    ctl = dict(control_params=control_params, control_image=control_image,
               control_scale=control_scale, control_cfg=control_cfg,
               control_window=control_window, ip=ip, deepcache=deepcache,
               pag_scale=pag_scale, head_steps=head_steps, edit=edit,
               image_guidance_scale=image_guidance_scale)
    if reference is not None:
        return k_diffuse_latent(
            unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
            method, 0, n_steps, compute_dtype,
            inpaint=True, reference=reference, mask=mask, key=inpaint_key,
            schedule=schedule, use_cfg=use_cfg,
            guidance_rescale=guidance_rescale,
            concat_channels=concat_channels, step_keys=step_keys, **ctl,
        )
    return k_diffuse_latent(
        unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
        method, 0, n_steps, compute_dtype, schedule=schedule,
        key=inpaint_key, use_cfg=use_cfg, guidance_rescale=guidance_rescale,
        concat_channels=concat_channels, step_keys=step_keys, **ctl,
    )


def k_refine_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    latent: jnp.ndarray,  # clean (x0-space) latent
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    step_start: int = 800,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    method: str = "euler",
    schedule: str = "linear",
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    step_keys: Optional[jnp.ndarray] = None,
    ip=None,
    deepcache: Optional[Tuple[int, int]] = None,
    pag_scale: float = 0.0,
    renoise: bool = True,
    tail_from: int = 0,
) -> jnp.ndarray:
    """Refiner/img2img re-noise in sigma space: x = latent + σ_start·noise,
    then run the schedule tail (k-space analogue of mod.rs:355-376).

    noise overrides the key-derived re-noise (per-image seeds,
    refiner_noise_per_seed). renoise=False + tail_from=h
    (ensemble-of-experts tail, diffusers' denoising_start): `latent` is
    ALREADY the still-noisy sigma-space handoff from a head_steps=h base
    run — continue the full schedule's suffix directly (pass
    step_start=0; the suffix is sliced inside k_diffuse_latent)."""
    # re-noise to the schedule's ACTUAL first sigma: equals sigma(t0) for
    # linear/karras by construction, but the AYS window's top value is its
    # own published number — the scan must start where the noising ends
    if renoise:
        _, sig_sched = k_schedule(alphas_cumprod, step_start, n_steps,
                                  schedule)
        sigma_start = sig_sched[0]
        if noise is None:
            noise = jax.random.normal(key, latent.shape, jnp.float32)
        noised = latent.astype(jnp.float32) + sigma_start * noise
    else:
        noised = latent.astype(jnp.float32)
    return k_diffuse_latent(
        unet_params, cfg, alphas_cumprod, noised, cond, guidance_scale,
        method, step_start, n_steps, compute_dtype, schedule=schedule,
        # fold_in(1): the scan key for stochastic step noise, distinct
        # from the re-noise draw above (which uses `key` directly)
        key=jax.random.fold_in(key, 1),
        use_cfg=use_cfg, guidance_rescale=guidance_rescale,
        control_params=control_params, control_image=control_image,
        control_scale=control_scale, control_cfg=control_cfg,
        control_window=control_window, step_keys=step_keys, ip=ip,
        deepcache=deepcache, pag_scale=pag_scale, tail_from=tail_from,
    )


# ---------------------------------------------------------------------------
# LCM (Latent Consistency Models, arXiv:2310.04378 / LCM-LoRA
# arXiv:2311.05556) — capability extension; the reference ships only DDIM.
# Scheduler math follows diffusers' LCMScheduler exactly (set_timesteps'
# linspace index selection, discrete boundary-condition scalings with
# timestep_scaling=10 / sigma_data=0.5, per-step re-noising); pinned
# against a literal torch transcription in tests/test_lcm.py.
# ---------------------------------------------------------------------------

def lcm_timesteps(n_steps: int, original_steps: int = 50,
                  n_train: int = N_STEPS_TOTAL,
                  strength: float = 1.0) -> np.ndarray:
    """LCMScheduler.set_timesteps: the distilled model was trained on an
    `original_steps`-point DDIM grid (t = k*i - 1, k = n_train //
    original_steps); inference picks n_steps of those grid points with
    floor(linspace) indexing over the (strength-scaled) descending grid.
    """
    k = n_train // original_steps
    n_origin = int(original_steps * strength)
    if n_origin < 1:
        n_origin = 1
    origin = (np.arange(1, n_origin + 1, dtype=np.int64) * k - 1)[::-1]
    if n_steps > len(origin):
        raise ValueError(
            f"LCM: n_steps={n_steps} exceeds the trained grid "
            f"({len(origin)} points at original_steps={original_steps}, "
            f"strength={strength})"
        )
    idx = np.floor(
        np.linspace(0, len(origin), num=n_steps, endpoint=False)
    ).astype(np.int64)
    return origin[idx].astype(np.int32)


def lcm_step_update(lat, eps, alpha, alpha_prev, t, noise, is_last,
                    timestep_scaling: float = 10.0, sigma_data: float = 0.5):
    """One LCMScheduler.step (epsilon-prediction form, pure math).

    The consistency parameterization evaluates f(x,t) = c_skip(t)*x +
    c_out(t)*x0(x,t) with the discrete boundary scalings
    (get_scalings_for_boundary_condition_discrete), then — unless this is
    the final step — re-noises the denoised estimate to the next grid
    point: x = sqrt(a_prev)*f + sqrt(1-a_prev)*noise."""
    x0 = (lat - jnp.sqrt(1.0 - alpha) * eps) / jnp.sqrt(alpha)
    st = t.astype(jnp.float32) * timestep_scaling
    c_skip = sigma_data**2 / (st**2 + sigma_data**2)
    c_out = st / jnp.sqrt(st**2 + sigma_data**2)
    denoised = c_out * x0 + c_skip * lat
    nxt = (jnp.sqrt(alpha_prev) * denoised
           + jnp.sqrt(1.0 - alpha_prev) * noise)
    return jnp.where(is_last, denoised, nxt), denoised


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_steps", "original_steps", "strength", "compute_dtype",
        "inpaint", "use_cfg", "control_cfg", "control_window",
    ),
    donate_argnames=("latent",),
)
def lcm_diffuse_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod: jnp.ndarray,
    latent: jnp.ndarray,
    cond: Conditioning,
    guidance_scale: float,
    key: Optional[jax.Array] = None,
    n_steps: int = 4,
    original_steps: int = 50,
    strength: float = 1.0,
    compute_dtype=jnp.bfloat16,
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    use_cfg: bool = False,
    concat_channels: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    step_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LCM sampling loop as one lax.scan.

    Two model flavors share this loop:
      - LCM-distilled UNets (cfg.time_cond_proj_dim > 0): guidance is
        embedded via the cond_proj guidance-scale embedding (w =
        guidance_scale - 1); CFG must be off (use_cfg=False) — the
        distillation bakes it in.
      - LCM-LoRA over a standard UNet: optional true CFG at small scales
        (diffusers recommends 1.0-2.0).

    LCM is stochastic: each non-final step re-noises with a fresh normal
    (key / step_keys, stream semantics identical to the stochastic
    k-samplers). `strength` < 1 selects the img2img tail of the trained
    grid; the caller must pass a latent already noised to the first
    selected timestep."""
    n_train = alphas_cumprod.shape[0]
    if cfg.n_steps != n_train:
        raise ValueError(
            f"DiffuserConfig.n_steps={cfg.n_steps} does not match the "
            f"alphas_cumprod table length {n_train}"
        )
    if cfg.time_cond_proj_dim and use_cfg:
        raise ValueError(
            "LCM-distilled UNets (time_cond_proj_dim > 0) embed guidance; "
            "run them with use_cfg=False"
        )
    if cfg.is_refiner:
        raise ValueError("LCM sampling applies to the base/family UNets, "
                         "not the SDXL refiner")
    ts = jnp.asarray(lcm_timesteps(n_steps, original_steps, n_train,
                                   strength))
    n = int(ts.shape[0])
    a_t = alphas_cumprod[ts]
    # a_prev[i] = alpha at the NEXT grid point (unused on the final step)
    a_prev = jnp.concatenate([alphas_cumprod[ts[1:]], a_t[-1:]])
    is_last = jnp.arange(n) == n - 1

    latent = latent.astype(jnp.float32)
    if step_keys is not None:
        keys = step_keys  # [n, B, 2] per-image streams
    elif key is not None:
        keys = jax.random.split(key, n)
    else:
        raise ValueError("LCM needs a PRNG key (stochastic re-noising)")
    if inpaint:
        reference = reference.astype(jnp.float32)

    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype, use_cfg)
    cross_kv = precompute_cross_kv(unet_params, cfg.unet_config(), ctx2)
    cross_kv = _merge_ip(cross_kv, ip, cfg, cond, compute_dtype, use_cfg)
    cc = concat_channels
    if cc is not None and use_cfg:
        cc = jnp.concatenate([cc, cc], axis=0)
    ctrl, ctrl_kv = _control_setup(control_params, control_cfg, control_image,
                                   ctx2, compute_dtype, use_cfg, False)
    cscales = _control_window_scales(n, control_scale, control_window)

    # guidance-scale embedding, scan-invariant: project once ([1, mc])
    t_add = None
    if cfg.time_cond_proj_dim:
        from ..ops.embeddings import guidance_scale_embedding
        from ..ops.linear import linear_nobias

        w_emb = guidance_scale_embedding(
            jnp.asarray(guidance_scale, jnp.float32) - 1.0,
            cfg.time_cond_proj_dim,
        )
        t_add = linear_nobias(
            unet_params["time_embed"]["cond_proj"], w_emb.astype(compute_dtype)
        )

    def step(lat, inp):
        t, alpha, alpha_prev, k, last, cs = inp
        if inpaint:
            pin_noise = _scan_normal(_scan_fold(k, 1), lat.shape)
            noised_ref = (reference * jnp.sqrt(alpha)
                          + pin_noise * jnp.sqrt(1.0 - alpha))
            lat = inpaint_pin(mask, lat, noised_ref)
        eps = _cfg_eps(unet_params, cfg, lat, t, ctx2, ch2, guidance_scale,
                       compute_dtype, cross_kv, alpha,
                       use_cfg=use_cfg, concat=cc, control=ctrl,
                       control_cfg=control_cfg, control_kv=ctrl_kv,
                       control_scale=cs, t_add=t_add)
        noise = _scan_normal(_scan_fold(k, 0), lat.shape)
        lat, _ = lcm_step_update(lat, eps, alpha, alpha_prev, t, noise, last)
        return lat, None

    latent, _ = jax.lax.scan(step, latent,
                             (ts, a_t, a_prev, keys, is_last, cscales))
    return latent


def lcm_sample_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    n_steps: int = 4,
    original_steps: int = 50,
    compute_dtype=jnp.bfloat16,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    use_cfg: bool = False,
    concat_channels: Optional[jnp.ndarray] = None,
    initial_noise: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    step_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LCM txt2img (+ optional latent-mask inpainting).

    LCMScheduler's init_noise_sigma is 1.0: the starting latent is plain
    N(0,1), like the DDIM path (initial_noise overrides it for per-image
    seeds)."""
    noise_key, scan_key = jax.random.split(key)
    latent = (initial_noise if initial_noise is not None
              else gen_noise(noise_key, cond))
    return lcm_diffuse_latent(
        unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
        key=scan_key, n_steps=n_steps, original_steps=original_steps,
        compute_dtype=compute_dtype,
        inpaint=reference is not None and mask is not None,
        reference=reference, mask=mask, use_cfg=use_cfg,
        concat_channels=concat_channels, control_params=control_params,
        control_image=control_image, control_scale=control_scale,
        control_cfg=control_cfg, control_window=control_window, ip=ip,
        step_keys=step_keys,
    )


def lcm_refine_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    latent: jnp.ndarray,  # clean (x0-space) latent
    cond: Conditioning,
    key,
    guidance_scale: float = 7.5,
    strength: float = 0.3,
    n_steps: int = 4,
    original_steps: int = 50,
    compute_dtype=jnp.bfloat16,
    use_cfg: bool = False,
    concat_channels: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    step_keys: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LCM img2img: diffusers' LCM img2img pipeline windows the trained
    grid by `strength` (set_timesteps(..., strength)) and noises the
    clean latent to the FIRST selected grid point; the loop is then
    identical to txt2img. `noise` overrides the key-derived re-noise
    normal (per-image seeds)."""
    n_train = alphas_cumprod.shape[0]
    # number of steps actually run is n_steps over the strength window
    # (the grid the timesteps are drawn from is already windowed)
    eff_steps = min(n_steps, max(1, int(original_steps * strength)))
    ts = lcm_timesteps(eff_steps, original_steps, n_train, strength)
    noise_key, scan_key = jax.random.split(key)
    if noise is None:
        noise = jax.random.normal(noise_key, latent.shape, jnp.float32)
    a0 = alphas_cumprod[int(ts[0])]
    noised = (latent.astype(jnp.float32) * jnp.sqrt(a0)
              + noise * jnp.sqrt(1.0 - a0))
    return lcm_diffuse_latent(
        unet_params, cfg, alphas_cumprod, noised, cond, guidance_scale,
        key=scan_key, n_steps=eff_steps, original_steps=original_steps,
        strength=strength, compute_dtype=compute_dtype, use_cfg=use_cfg,
        concat_channels=concat_channels, control_params=control_params,
        control_image=control_image, control_scale=control_scale,
        control_cfg=control_cfg, control_window=control_window, ip=ip,
        step_keys=step_keys,
    )


def gen_noise(key, cond: Conditioning) -> jnp.ndarray:
    """Initial latent noise [B, h/8, w/8, 4] (gen_noise, mod.rs:378-388)."""
    h, w = cond.resolution
    return jax.random.normal(
        key, (cond.batch, h // 8, w // 8, 4), dtype=jnp.float32
    )


def gen_noise_per_seed(seeds, cond: Conditioning) -> jnp.ndarray:
    """Per-image initial noise: seeds[i] fully determines image i's noise
    regardless of its batch position — the batched-serving contract
    (requests fused into one batch keep their own seeds). Capability
    extension; the single-seed path draws the whole batch from one key
    (reference semantics) and is unchanged."""
    h, w = cond.resolution
    keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
    return jax.vmap(
        lambda k: jax.random.normal(k, (h // 8, w // 8, 4), jnp.float32)
    )(keys)


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
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    initial_noise: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    deepcache: Optional[Tuple[int, int]] = None,
    pag_scale: float = 0.0,
    head_steps: int = 0,
    edit: bool = False,
    image_guidance_scale: float = 1.5,
    ddim_eta: float = 0.0,
    step_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """txt2img (+ optional latent-mask inpainting) (mod.rs:316-353).

    initial_noise overrides the key-derived starting noise (per-image
    seeds, gen_noise_per_seed). head_steps > 0: ensemble-of-experts base
    stage (see diffuse_latent) — returns the still-noisy handoff latent.
    edit=True: InstructPix2Pix (see diffuse_latent). ddim_eta > 0:
    stochastic DDIM (see diffuse_latent); step_keys carries the
    per-image scan keys for it."""
    noise_key, inpaint_key = jax.random.split(key)
    latent = initial_noise if initial_noise is not None else gen_noise(
        noise_key, cond)
    ctl = dict(control_params=control_params, control_image=control_image,
               control_scale=control_scale, control_cfg=control_cfg,
               control_window=control_window, ip=ip, deepcache=deepcache,
               pag_scale=pag_scale, head_steps=head_steps, edit=edit,
               image_guidance_scale=image_guidance_scale,
               ddim_eta=ddim_eta, step_keys=step_keys, key=inpaint_key)
    if reference is not None:
        return diffuse_latent(
            unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
            0, n_steps, compute_dtype,
            inpaint=True, reference=reference, mask=mask,
            use_cfg=use_cfg, guidance_rescale=guidance_rescale,
            concat_channels=concat_channels, **ctl,
        )
    return diffuse_latent(
        unet_params, cfg, alphas_cumprod, latent, cond, guidance_scale,
        0, n_steps, compute_dtype,
        use_cfg=use_cfg, guidance_rescale=guidance_rescale,
        concat_channels=concat_channels, **ctl,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "compute_dtype", "use_cfg"),
    donate_argnames=("latent",),
)
def ddim_invert_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod: jnp.ndarray,
    latent: jnp.ndarray,  # clean VP latent (x0)
    cond: Conditioning,
    guidance_scale: float = 1.0,
    n_steps: int = 50,
    compute_dtype=jnp.bfloat16,
    use_cfg: bool = False,
) -> jnp.ndarray:
    """DDIM inversion: walk the deterministic DDIM chain BACKWARD from a
    clean latent to the noise that (approximately) generates it.

    The standard recipe (diffusers' DDIMInverseScheduler / the
    null-text-inversion `next_step` loop, arXiv:2211.09794): visit the
    sampling grid ASCENDING; at each grid point t evaluate the model at t
    and step from alpha(t - step_size) to alpha(t):

        eps = model(x, t)
        x0  = (x - sqrt(1 - a_src) * eps) / sqrt(a_src)
        x   = sqrt(a_dst) * x0 + sqrt(1 - a_dst) * eps

    — the exact inverse of the sampling update under the first-order
    approximation eps(x_t) ~= eps(x_{t+dt}) (exact when eps is constant
    in x, which tests/test_sampler.py exploits as an identity). Feeding
    the result to txt2img(initial_latent=...) with the SAME n_steps and
    sampler="ddim" reconstructs the input image; denoising with a
    DIFFERENT prompt is the classic inversion-editing workflow.

    guidance_scale is usually 1 for faithful inversion (use_cfg=False —
    CFG breaks the approximation badly at high scales); use_cfg=True
    inverts the guided field for prompt-aware editing experiments."""
    n_train = alphas_cumprod.shape[0]
    if cfg.n_steps != n_train:
        raise ValueError(
            f"DiffuserConfig.n_steps={cfg.n_steps} does not match the "
            f"alphas_cumprod table length {n_train}"
        )
    step_size = n_train // n_steps
    ts = jnp.asarray(ddim_timesteps(0, n_steps, n_train)[::-1].copy())
    a_dst = alphas_cumprod[ts]
    a_src = jnp.where(ts >= step_size, alphas_cumprod[ts - step_size], 1.0)

    latent = latent.astype(jnp.float32)
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype, use_cfg)
    cross_kv = precompute_cross_kv(unet_params, cfg.unet_config(), ctx2)

    def step(lat, inp):
        t, alpha_src, alpha_dst = inp
        eps = _cfg_eps(unet_params, cfg, lat, t, ctx2, ch2, guidance_scale,
                       compute_dtype, cross_kv, alpha_src, use_cfg=use_cfg)
        x0 = (lat - eps * jnp.sqrt(1.0 - alpha_src)) / jnp.sqrt(alpha_src)
        lat = x0 * jnp.sqrt(alpha_dst) + eps * jnp.sqrt(1.0 - alpha_dst)
        return lat, None

    latent, _ = jax.lax.scan(step, latent, (ts, a_src, a_dst))
    return latent


def refiner_noise_per_seed(seeds, latent_shape) -> jnp.ndarray:
    """Per-image refiner re-noise: image i's noise depends only on
    seeds[i] (fold_in stream 1 of its key; stream 0 is the initial noise
    via gen_noise_per_seed) — extends the per-image-seed contract to
    use_refiner=True batches."""
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(int(s)), 1) for s in seeds]
    )
    return jax.vmap(
        lambda k: jax.random.normal(k, tuple(latent_shape[1:]), jnp.float32)
    )(keys)


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
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    deepcache: Optional[Tuple[int, int]] = None,
    pag_scale: float = 0.0,
    renoise: bool = True,
    tail_from: int = 0,
    ddim_eta: float = 0.0,
    step_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Refiner stage: re-noise at t = n_train - step_start, run the schedule
    tail (refine_latent, mod.rs:355-376).

    noise overrides the key-derived re-noise (per-image seeds,
    refiner_noise_per_seed). pag_scale serves the img2img use of this
    wrapper; the actual SDXL refiner stage rejects it (is_refiner).
    renoise=False + tail_from=h (ensemble-of-experts tail): `latent` is
    ALREADY the still-noisy VP-space handoff from a head_steps=h base
    run — continue the full schedule's suffix directly (pass
    step_start=0; the suffix is sliced inside diffuse_latent).
    ddim_eta > 0: stochastic DDIM over the tail (see diffuse_latent);
    the scan key is fold_in(key, 1), distinct from the re-noise draw."""
    if renoise:
        t = alphas_cumprod.shape[0] - step_start
        start_alpha = alphas_cumprod[t]
        if noise is None:
            noise = jax.random.normal(key, latent.shape, jnp.float32)
        noised = (
            latent.astype(jnp.float32) * jnp.sqrt(start_alpha)
            + noise * jnp.sqrt(1.0 - start_alpha)
        )
    else:
        noised = latent.astype(jnp.float32)
    return diffuse_latent(
        unet_params, cfg, alphas_cumprod, noised, cond, guidance_scale,
        step_start, n_steps, compute_dtype,
        use_cfg=use_cfg, guidance_rescale=guidance_rescale,
        control_params=control_params, control_image=control_image,
        control_scale=control_scale, control_cfg=control_cfg,
        control_window=control_window, ip=ip, deepcache=deepcache,
        pag_scale=pag_scale, tail_from=tail_from,
        ddim_eta=ddim_eta, step_keys=step_keys,
        key=jax.random.fold_in(key, 1) if key is not None else None,
    )


# ---------------------------------------------------------------------------
# Segmented DDIM with step previews (capability extension)
# ---------------------------------------------------------------------------

# Cheap latent -> RGB approximations (the standard public preview factors
# used across SD tooling, e.g. ComfyUI's latent_rgb_factors); a real decode
# of intermediates would cost a VAE pass per preview.
SDXL_LATENT_RGB = np.array(
    [[0.3920, 0.4054, 0.4549],
     [-0.2634, -0.0196, 0.0653],
     [0.0568, 0.1687, -0.0755],
     [-0.3112, -0.2359, -0.2076]], np.float32)
SD1_LATENT_RGB = np.array(
    [[0.298, 0.207, 0.208],
     [0.187, 0.286, 0.173],
     [-0.158, 0.189, 0.264],
     [-0.184, -0.271, -0.473]], np.float32)


def latent_to_preview(latent, factors: Optional[np.ndarray] = None):
    """[B,h,w,4] latent -> [B,h,w,3] uint8 preview via a linear map."""
    f = jnp.asarray(SDXL_LATENT_RGB if factors is None else factors)
    rgb = latent.astype(jnp.float32) @ f
    return np.asarray(
        (jnp.clip((rgb + 1.0) * 127.5, 0, 255)).astype(jnp.uint8)
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "inpaint", "use_cfg",
                     "guidance_rescale", "control_cfg", "ddim_eta"),
    donate_argnames=("latent",),
)
def _ddim_segment(
    unet_params,
    cfg: DiffuserConfig,
    latent: jnp.ndarray,
    cond: Conditioning,
    guidance_scale,
    ts: jnp.ndarray,
    a_t: jnp.ndarray,
    a_prev: jnp.ndarray,
    keys: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scales: Optional[jnp.ndarray] = None,
    control_cfg=None,
    ip=None,
    ddim_eta: float = 0.0,
) -> jnp.ndarray:
    """One contiguous slice of the DDIM schedule (same step math as
    diffuse_latent; the schedule arrays are traced inputs so equal-length
    segments share one executable). Used by diffuse_latent_preview.
    control_scales: per-step ControlNet scale slice aligned with ts (the
    preview driver pre-applies the window). ddim_eta > 0: stochastic
    DDIM — the driver passes the FULL schedule's key slices, so
    segmented == unsegmented bitwise."""
    ctx2, ch2 = _cfg_contexts(cfg, cond, compute_dtype, use_cfg)
    cross_kv = precompute_cross_kv(unet_params, cfg.unet_config(), ctx2)
    cross_kv = _merge_ip(cross_kv, ip, cfg, cond, compute_dtype, use_cfg)
    cc = concat_channels
    if cc is not None and use_cfg and not cfg.is_refiner:
        cc = jnp.concatenate([cc, cc], axis=0)
    ctrl, ctrl_kv = _control_setup(control_params, control_cfg, control_image,
                                   ctx2, compute_dtype, use_cfg, cfg.is_refiner)
    if control_scales is None:
        control_scales = jnp.zeros(ts.shape, jnp.float32)
    if inpaint:
        reference = reference.astype(jnp.float32)

    def step(lat, inp):
        t, alpha, alpha_prev, k, cs = inp
        if inpaint:
            noise = _scan_normal(k, lat.shape)
            noised_ref = (reference * jnp.sqrt(alpha)
                          + noise * jnp.sqrt(1.0 - alpha))
            lat = inpaint_pin(mask, lat, noised_ref)
        eps = _cfg_eps(unet_params, cfg, lat, t, ctx2, ch2, guidance_scale,
                       compute_dtype, cross_kv, alpha,
                       use_cfg=use_cfg, guidance_rescale=guidance_rescale,
                       concat=cc, control=ctrl, control_cfg=control_cfg,
                       control_kv=ctrl_kv, control_scale=cs)
        sqrt_noise = jnp.sqrt(1.0 - alpha)
        x0 = (lat - eps * sqrt_noise) / jnp.sqrt(alpha)
        lat = _ddim_update(x0, eps, alpha, alpha_prev, ddim_eta, k,
                           lat.shape)
        return lat, None

    latent, _ = jax.lax.scan(
        step, latent.astype(jnp.float32), (ts, a_t, a_prev, keys, control_scales)
    )
    return latent


def diffuse_latent_preview(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod: jnp.ndarray,
    latent: jnp.ndarray,
    cond: Conditioning,
    guidance_scale: float,
    preview_every: int,
    preview_callback,
    step_start: int = 0,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    inpaint: bool = False,
    reference: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    concat_channels: Optional[jnp.ndarray] = None,
    preview_factors: Optional[np.ndarray] = None,
    control_params=None,
    control_image: Optional[jnp.ndarray] = None,
    control_scale: float = 1.0,
    control_cfg=None,
    control_window: Tuple[float, float] = (0.0, 1.0),
    ip=None,
    ddim_eta: float = 0.0,
    step_keys: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """diffuse_latent, segmented every `preview_every` steps: between
    segments, `preview_callback(done, total, rgb_u8 [B,h,w,3])` receives a
    cheap linear-map preview of the current latent. Identical step math
    and schedule to diffuse_latent — the final latent is bit-equal
    (incl. ddim_eta > 0 stochastic steps: same key layout)."""
    n_train = alphas_cumprod.shape[0]
    if cfg.n_steps != n_train:
        raise ValueError(
            f"DiffuserConfig.n_steps={cfg.n_steps} does not match the "
            f"alphas_cumprod table length {n_train}"
        )
    if preview_every < 1:
        raise ValueError("preview_every must be >= 1")
    step_size = n_train // n_steps
    ts = ddim_timesteps(step_start, n_steps, n_train)
    a_t = np.asarray(alphas_cumprod)[ts]
    a_prev = np.where(ts >= step_size,
                      np.asarray(alphas_cumprod)[np.maximum(ts - step_size, 0)],
                      1.0).astype(np.float32)
    total = len(ts)
    if step_keys is not None:
        keys = step_keys
    elif inpaint or ddim_eta > 0:
        keys = jax.random.split(key, total)
    else:
        keys = jnp.zeros((total, 2), dtype=jnp.uint32)
    cscales = _control_window_scales(total, control_scale, control_window)

    lat = latent.astype(jnp.float32)
    done = 0
    while done < total:
        end = min(done + preview_every, total)
        lat = _ddim_segment(
            unet_params, cfg, lat, cond, guidance_scale,
            jnp.asarray(ts[done:end]), jnp.asarray(a_t[done:end]),
            jnp.asarray(a_prev[done:end]), keys[done:end],
            compute_dtype=compute_dtype, inpaint=inpaint,
            reference=reference, mask=mask, use_cfg=use_cfg,
            guidance_rescale=guidance_rescale,
            concat_channels=concat_channels,
            control_params=control_params, control_image=control_image,
            control_scales=cscales[done:end], control_cfg=control_cfg,
            ip=ip, ddim_eta=ddim_eta,
        )
        done = end
        if preview_callback is not None and done < total:
            preview_callback(done, total,
                             latent_to_preview(lat, preview_factors))
    return lat


def scheduled_sample_latent(
    unet_params,
    cfg: DiffuserConfig,
    alphas_cumprod,
    conds,            # one Conditioning per segment
    seg_lens,         # steps per segment; sum == n_steps
    key,
    guidance_scale: float = 7.5,
    n_steps: int = 30,
    compute_dtype=jnp.bfloat16,
    method: str = "ddim",
    schedule: str = "linear",
    use_cfg: bool = True,
    guidance_rescale: float = 0.0,
    initial_noise: Optional[jnp.ndarray] = None,
    step_keys: Optional[jnp.ndarray] = None,
    ddim_eta: float = 0.0,
) -> jnp.ndarray:
    """Prompt-scheduled txt2img (A1111 prompt editing, see
    pipeline/prompt_schedule.py): the ONE schedule grid is split at the
    prompt switch points and each slice runs with its own conditioning —
    the same segmented scans the step previews use, so step math, noise
    keys, and (for the multistep k-samplers) the carried history are
    identical to an unscheduled run; a single segment reproduces
    sample_latent / euler_sample_latent bitwise.

    Capability extension (the reference's prompt is fixed for the whole
    run, mod.rs:660-696). The k multistep history crossing a prompt
    switch was computed under the previous prompt — exactly A1111's
    behavior (scheduler state persists across conditioning swaps)."""
    if sum(seg_lens) != n_steps or len(conds) != len(seg_lens):
        raise ValueError(f"segment lengths {seg_lens} must cover "
                         f"n_steps={n_steps} with one conditioning each")
    noise_key, scan_key = jax.random.split(key)
    noise0 = (initial_noise if initial_noise is not None
              else gen_noise(noise_key, conds[0]))

    if method == "ddim":
        n_train = alphas_cumprod.shape[0]
        if cfg.n_steps != n_train:
            raise ValueError(
                f"DiffuserConfig.n_steps={cfg.n_steps} does not match the "
                f"alphas_cumprod table length {n_train}")
        step_size = n_train // n_steps
        ts = ddim_timesteps(0, n_steps, n_train)
        a_t = np.asarray(alphas_cumprod)[ts]
        a_prev = np.where(
            ts >= step_size,
            np.asarray(alphas_cumprod)[np.maximum(ts - step_size, 0)],
            1.0).astype(np.float32)
        total = len(ts)
        if step_keys is not None:
            keys = step_keys
        elif ddim_eta > 0:
            keys = jax.random.split(scan_key, total)
        else:
            keys = jnp.zeros((total, 2), dtype=jnp.uint32)
        # the 31-iteration quirk (mod.rs:400-406): the grid can exceed
        # n_steps; the extra steps extend the LAST prompt's segment
        seg_lens = list(seg_lens[:-1]) + [seg_lens[-1] + (total - n_steps)]
        lat = noise0.astype(jnp.float32)
        done = 0
        for cond, n_seg in zip(conds, seg_lens):
            end = done + n_seg
            lat = _ddim_segment(
                unet_params, cfg, lat, cond, guidance_scale,
                jnp.asarray(ts[done:end]), jnp.asarray(a_t[done:end]),
                jnp.asarray(a_prev[done:end]), keys[done:end],
                compute_dtype=compute_dtype, use_cfg=use_cfg,
                guidance_rescale=guidance_rescale, ddim_eta=ddim_eta,
            )
            done = end
        return lat

    if method not in K_SAMPLERS:
        raise ValueError(f"unknown sampler {method!r}")
    ts, sigmas = k_schedule(alphas_cumprod, 0, n_steps, schedule)
    ts = np.asarray(ts)
    sigmas = np.asarray(sigmas)
    sig, sig_next = sigmas[:-1], sigmas[1:]
    sig_prev = np.concatenate([sigmas[:1], sigmas[:-2]])
    first = np.arange(len(ts)) == 0
    total = len(ts)
    seg_lens = list(seg_lens[:-1]) + [seg_lens[-1] + (total - n_steps)]
    if step_keys is not None:
        keys = step_keys
    elif method in K_STOCHASTIC:
        keys = jax.random.split(scan_key, total)
    else:
        keys = jnp.zeros((total, 2), dtype=jnp.uint32)
    zeros_cs = jnp.zeros((total,), jnp.float32)

    unipc = method == "unipc"
    heun = method == "heun"
    m3 = method == "dpmpp_3m_sde"
    lms_ = method == "lms"
    if unipc:
        full_extras = unipc_scan_extras(jnp.asarray(sig))
    elif heun:
        full_extras = (jnp.asarray(np.concatenate([ts[1:], ts[-1:]])),)
    elif m3:
        full_extras = m3_scan_extras(jnp.asarray(sig))
    elif method in K_MID:
        sigmas_full = jnp.sqrt(
            (1.0 - alphas_cumprod.astype(jnp.float32)) / alphas_cumprod)
        full_extras = mid_scan_extras(method, jnp.asarray(sigmas),
                                      sigmas_full)
    elif lms_:
        full_extras = (lms_scan_coeffs(jnp.asarray(sigmas)),)

    lat = (noise0 * float(sigmas[0])).astype(jnp.float32)
    old = jnp.zeros_like(lat)
    old2, last = jnp.zeros_like(lat), lat
    if lms_:
        last = jnp.zeros_like(lat)  # d3 history starts empty
    done = 0
    for cond, n_seg in zip(conds, seg_lens):
        end = done + n_seg
        if unipc or lms_:
            seg = dict(m_prev2=old2, last_sample=last,
                       seg_extras=tuple(e[done:end] for e in full_extras))
        elif m3:
            seg = dict(m_prev2=old2,
                       seg_extras=tuple(e[done:end] for e in full_extras))
        elif heun or method in K_MID:
            seg = dict(seg_extras=tuple(e[done:end] for e in full_extras))
        else:
            seg = {}
        carry = _k_segment(
            unet_params, cfg, lat, old, cond, guidance_scale,
            jnp.asarray(ts[done:end]), jnp.asarray(sig[done:end]),
            jnp.asarray(sig_next[done:end]), jnp.asarray(sig_prev[done:end]),
            jnp.asarray(first[done:end]), keys[done:end],
            compute_dtype=compute_dtype, method=method, use_cfg=use_cfg,
            guidance_rescale=guidance_rescale,
            control_scales=zeros_cs[done:end],
            **seg,
        )
        if unipc or lms_:
            lat, old, old2, last = carry
        elif m3:
            lat, old, old2 = carry
        else:
            lat, old = carry
        done = end
    return lat
