"""Generate golden arrays for the k-sampler surface from LITERAL
transcriptions of the public reference algorithms.

The transcriptions below reproduce, line by line, the published loops:
  - k-diffusion `get_sigmas_karras` (k_diffusion/sampling.py; identical
    formula to diffusers' `_convert_to_karras`): Karras et al. 2022
    arXiv:2206.00364 eq. 5, torch float32.
  - k-diffusion `sample_euler` with s_churn=0 (gamma=0 path) — also the
    math of diffusers EulerDiscreteScheduler.step.
  - k-diffusion `sample_dpmpp_2m` — DPM-Solver++(2M), Lu et al.
    arXiv:2211.01095.

They are deliberately written as sequential torch loops with the exact
operation order of the public code, INDEPENDENT of sdxl_tpu's vectorized
lax.scan implementation, so a schedule off-by-one or a mis-shifted
multistep history in the scan cannot reproduce these numbers by accident.

Run once; goldens are committed under goldens/k_samplers/ and asserted by
tests/test_k_goldens.py.
"""

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens" / "k_samplers"


def append_zero(x):
    return torch.cat([x, x.new_zeros([1])])


def get_sigmas_karras(n, sigma_min, sigma_max, rho=7.0):
    """k-diffusion sampling.get_sigmas_karras, verbatim math."""
    ramp = torch.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return append_zero(sigmas)


def to_d(x, sigma, denoised):
    return (x - denoised) / sigma


def sample_euler(model, x, sigmas):
    """k-diffusion sample_euler, s_churn=0 (gamma=0) path, verbatim."""
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = to_d(x, sigmas[i], denoised)
        dt = sigmas[i + 1] - sigmas[i]
        x = x + d * dt
        traj.append(x.clone())
    return x, torch.stack(traj)


def sample_dpmpp_2m(model, x, sigmas):
    """k-diffusion sample_dpmpp_2m, verbatim loop structure."""
    sigma_fn = lambda t: t.neg().exp()  # noqa: E731
    t_fn = lambda sigma: sigma.log().neg()  # noqa: E731
    old_denoised = None
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        t, t_next = t_fn(sigmas[i]), t_fn(sigmas[i + 1])
        h = t_next - t
        if old_denoised is None or sigmas[i + 1] == 0:
            x = (sigma_fn(t_next) / sigma_fn(t)) * x - (-h).expm1() * denoised
        else:
            h_last = t - t_fn(sigmas[i - 1])
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = (sigma_fn(t_next) / sigma_fn(t)) * x - (-h).expm1() * denoised_d
        old_denoised = denoised
        traj.append(x.clone())
    return x, torch.stack(traj)


def get_ancestral_step(sigma_from, sigma_to, eta=1.0):
    """k-diffusion sampling.get_ancestral_step, verbatim."""
    if not eta:
        return sigma_to, 0.0
    sigma_up = min(
        sigma_to,
        eta
        * (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


def sample_euler_ancestral(model, x, sigmas, noises, eta=1.0):
    """k-diffusion sample_euler_ancestral (s_noise=1), verbatim loop, with
    the per-step noise draws injected (noises[i] replaces torch.randn_like)
    so the golden is deterministic."""
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        sigma_down, sigma_up = get_ancestral_step(
            float(sigmas[i]), float(sigmas[i + 1]), eta
        )
        d = to_d(x, sigmas[i], denoised)
        dt = sigma_down - sigmas[i]
        x = x + d * dt
        if sigmas[i + 1] > 0:
            x = x + noises[i] * sigma_up
        traj.append(x.clone())
    return x, torch.stack(traj)


def sample_dpmpp_2m_sde(model, x, sigmas, noises, eta=1.0, solver_type="midpoint"):
    """k-diffusion sample_dpmpp_2m_sde (s_noise=1, solver_type='midpoint'),
    verbatim loop structure, with the noise sampler replaced by injected
    per-step draws (noises[i]) — the documented deviation: independent
    per-step normals instead of a Brownian tree (diffusers'
    DPMSolverMultistepScheduler algorithm_type='sde-dpmsolver++' makes the
    same substitution)."""
    old_denoised = None
    h_last = None
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -sigmas[i].log(), -sigmas[i + 1].log()
            h = s - t
            eta_h = eta * h
            x = (
                sigmas[i + 1] / sigmas[i] * (-eta_h).exp() * x
                + (-h - eta_h).expm1().neg() * denoised
            )
            if old_denoised is not None:
                r = h_last / h
                if solver_type == "heun":
                    x = x + (
                        (-h - eta_h).expm1().neg() / (-h - eta_h) + 1
                    ) * (1 / r) * (denoised - old_denoised)
                elif solver_type == "midpoint":
                    x = x + 0.5 * (-h - eta_h).expm1().neg() * (1 / r) * (
                        denoised - old_denoised
                    )
            if eta:
                x = (
                    x
                    + noises[i]
                    * sigmas[i + 1]
                    * (-2 * eta_h).expm1().neg().sqrt()
                )
        old_denoised = denoised
        h_last = h
        traj.append(x.clone())
    return x, torch.stack(traj)


def synth_model(x, sigma):
    """Synthetic 'denoised' model: smooth, nonlinear in x AND sigma, so a
    trajectory match is a strong fingerprint of the update rule."""
    return torch.sin(x) * 0.9 + 0.05 * x / (1.0 + sigma)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(0)

    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod

    alphas = torch.from_numpy(
        np.asarray(scaled_linear_alphas_cumprod(), np.float32)
    )
    sigmas_full = ((1 - alphas) / alphas).sqrt()
    sigma_min, sigma_max = float(sigmas_full[0]), float(sigmas_full[-1])

    # 1. Karras sigma schedules at the SD alpha-table endpoints
    kar10 = get_sigmas_karras(10, sigma_min, sigma_max)
    kar20 = get_sigmas_karras(20, sigma_min, sigma_max)

    # 2. 1-D trajectories over a karras schedule (n=8) with the synthetic
    # model; x0 is a fixed, seedless vector
    x0 = torch.tensor([-2.0, -0.7, -0.1, 0.0, 0.3, 0.9, 1.7, 2.5]) * sigma_max
    sig8 = get_sigmas_karras(8, sigma_min, sigma_max)
    eul_x, eul_traj = sample_euler(synth_model, x0.clone(), sig8)
    dpm_x, dpm_traj = sample_dpmpp_2m(synth_model, x0.clone(), sig8)

    # 3. stochastic samplers: fixed per-step noise draws (committed with
    # the goldens; sdxl_tpu's scan is driven with the same arrays)
    g8 = torch.Generator().manual_seed(1234)
    noises = torch.randn(len(sig8) - 1, len(x0), generator=g8)
    eua_x, eua_traj = sample_euler_ancestral(
        synth_model, x0.clone(), sig8, noises
    )
    sde_x, sde_traj = sample_dpmpp_2m_sde(
        synth_model, x0.clone(), sig8, noises
    )

    np.savez(
        OUT / "k_goldens.npz",
        sigma_min=np.float32(sigma_min),
        sigma_max=np.float32(sigma_max),
        karras_10=kar10.numpy(),
        karras_20=kar20.numpy(),
        x0=x0.numpy(),
        sigmas_8=sig8.numpy(),
        euler_final=eul_x.numpy(),
        euler_traj=eul_traj.numpy(),
        dpmpp_final=dpm_x.numpy(),
        dpmpp_traj=dpm_traj.numpy(),
        step_noises=noises.numpy(),
        euler_a_final=eua_x.numpy(),
        euler_a_traj=eua_traj.numpy(),
        dpmpp_sde_final=sde_x.numpy(),
        dpmpp_sde_traj=sde_traj.numpy(),
    )
    print(f"wrote {OUT / 'k_goldens.npz'}")
    print("sigma_min/max:", sigma_min, sigma_max)
    print("karras_10:", kar10.numpy())
    print("dpmpp_final:", dpm_x.numpy())


if __name__ == "__main__":
    main()
