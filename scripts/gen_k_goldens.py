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


def sample_heun(model, x, sigmas):
    """k-diffusion sample_heun, s_churn=0 (gamma=0) path, verbatim:
    Euler proposal, second model eval at (x_2, sigma_next), averaged
    derivative; plain Euler on the final (sigma_next == 0) step."""
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = to_d(x, sigmas[i], denoised)
        dt = sigmas[i + 1] - sigmas[i]
        if sigmas[i + 1] == 0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            denoised_2 = model(x_2, sigmas[i + 1])
            d_2 = to_d(x_2, sigmas[i + 1], denoised_2)
            d_prime = (d + d_2) / 2
            x = x + d_prime * dt
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


def sample_dpm_2(model, x, sigmas):
    """k-diffusion sample_dpm_2, s_churn=0 (gamma=0) path, verbatim:
    second model eval at the log-space midpoint sigma."""
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = to_d(x, sigmas[i], denoised)
        if sigmas[i + 1] == 0:
            dt = sigmas[i + 1] - sigmas[i]
            x = x + d * dt
        else:
            sigma_mid = sigmas[i].log().lerp(sigmas[i + 1].log(), 0.5).exp()
            dt_1 = sigma_mid - sigmas[i]
            dt_2 = sigmas[i + 1] - sigmas[i]
            x_2 = x + d * dt_1
            denoised_2 = model(x_2, sigma_mid)
            d_2 = to_d(x_2, sigma_mid, denoised_2)
            x = x + d_2 * dt_2
        traj.append(x.clone())
    return x, torch.stack(traj)


def sample_dpm_2_ancestral(model, x, sigmas, noises, eta=1.0):
    """k-diffusion sample_dpm_2_ancestral (s_noise=1), verbatim, with the
    per-step noise draws injected."""
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        sigma_down, sigma_up = get_ancestral_step(
            float(sigmas[i]), float(sigmas[i + 1]), eta)
        d = to_d(x, sigmas[i], denoised)
        if sigma_down == 0:
            dt = sigma_down - sigmas[i]
            x = x + d * dt
        else:
            sigma_mid = (
                sigmas[i].log().lerp(torch.tensor(sigma_down).log(), 0.5)
            ).exp()
            dt_1 = sigma_mid - sigmas[i]
            dt_2 = sigma_down - sigmas[i]
            x_2 = x + d * dt_1
            denoised_2 = model(x_2, sigma_mid)
            d_2 = to_d(x_2, sigma_mid, denoised_2)
            x = x + d_2 * dt_2
            x = x + noises[i] * sigma_up
        traj.append(x.clone())
    return x, torch.stack(traj)


def sample_dpmpp_2s_ancestral(model, x, sigmas, noises, eta=1.0):
    """k-diffusion sample_dpmpp_2s_ancestral (s_noise=1), verbatim, with
    the per-step noise draws injected."""
    sigma_fn = lambda t: t.neg().exp()  # noqa: E731
    t_fn = lambda sigma: sigma.log().neg()  # noqa: E731
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        sigma_down, sigma_up = get_ancestral_step(
            float(sigmas[i]), float(sigmas[i + 1]), eta)
        if sigma_down == 0:
            d = to_d(x, sigmas[i], denoised)
            dt = sigma_down - sigmas[i]
            x = x + d * dt
        else:
            t, t_next = t_fn(sigmas[i]), t_fn(torch.tensor(sigma_down))
            r = 1 / 2
            h = t_next - t
            s = t + r * h
            x_2 = (sigma_fn(s) / sigma_fn(t)) * x - (-h * r).expm1() * denoised
            denoised_2 = model(x_2, sigma_fn(s))
            x = (sigma_fn(t_next) / sigma_fn(t)) * x \
                - (-h).expm1() * denoised_2
        if sigmas[i + 1] > 0:
            x = x + noises[i] * sigma_up
        traj.append(x.clone())
    return x, torch.stack(traj)


def linear_multistep_coeff(order, t, i, j):
    """k-diffusion sampling.linear_multistep_coeff, verbatim (scipy
    quad)."""
    from scipy import integrate

    if order - 1 > i:
        raise ValueError(f"Order {order} too high for step {i}")

    def fn(tau):
        prod = 1.0
        for k in range(order):
            if j == k:
                continue
            prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
        return prod

    return integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]


def sample_lms(model, x, sigmas, order=4):
    """k-diffusion sample_lms, verbatim loop."""
    sigmas_cpu = sigmas.detach().cpu().numpy()
    ds = []
    traj = [x.clone()]
    coeff_rows = []
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        d = to_d(x, sigmas[i], denoised)
        ds.append(d)
        if len(ds) > order:
            ds.pop(0)
        cur_order = min(i + 1, order)
        coeffs = [
            linear_multistep_coeff(cur_order, sigmas_cpu, i, j)
            for j in range(cur_order)
        ]
        coeff_rows.append(coeffs + [0.0] * (order - cur_order))
        x = x + sum(
            coeff * d for coeff, d in zip(coeffs, reversed(ds))
        )
        traj.append(x.clone())
    return x, torch.stack(traj), np.asarray(coeff_rows, np.float64)


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


def sample_dpmpp_3m_sde(model, x, sigmas, noises, eta=1.0):
    """k-diffusion sample_dpmpp_3m_sde (s_noise=1), verbatim loop
    structure, with the Brownian-tree noise sampler replaced by injected
    per-step draws (noises[i]) — the same independent-normals
    substitution the 2M SDE transcription documents."""
    denoised_1, denoised_2 = None, None
    h, h_1, h_2 = None, None, None
    traj = [x.clone()]
    for i in range(len(sigmas) - 1):
        denoised = model(x, sigmas[i])
        if sigmas[i + 1] == 0:
            x = denoised
        else:
            t, s = -sigmas[i].log(), -sigmas[i + 1].log()
            h = s - t
            h_eta = h * (eta + 1)

            x = torch.exp(-h_eta) * x + (-h_eta).expm1().neg() * denoised

            if h_2 is not None:
                r0 = h_1 / h
                r1 = h_2 / h
                d1_0 = (denoised - denoised_1) / r0
                d1_1 = (denoised_1 - denoised_2) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                phi_2 = h_eta.neg().expm1() / h_eta + 1
                phi_3 = phi_2 / h_eta - 0.5
                x = x + phi_2 * d1 - phi_3 * d2
            elif h_1 is not None:
                r = h_1 / h
                d = (denoised - denoised_1) / r
                phi_2 = h_eta.neg().expm1() / h_eta + 1
                x = x + phi_2 * d

            if eta:
                x = x + noises[i] * sigmas[i + 1] * (
                    -2 * h * eta
                ).expm1().neg().sqrt()

        denoised_1, denoised_2 = denoised, denoised_1
        h_1, h_2 = h, h_1
        traj.append(x.clone())
    return x, torch.stack(traj)


class UniPCTranscription:
    """Literal transcription of diffusers' UniPCMultistepScheduler
    (predict_x0=True, solver_type='bh2', solver_order=2,
    lower_order_final=True, disable_corrector=[], final_sigmas_type='zero'),
    reproducing the published step() control flow verbatim: the
    convert_model_output x0 recovery, the UniC corrector applied from
    last_sample with the PREVIOUS step's this_order, the model-output /
    timestep shift registers, the lower_order_nums warmup, and the UniP
    predictor with the hardcoded rhos_p=[0.5] at order 2.

    Works in diffusers' VP sample space (x = alpha_t*x0 + sigma_t*eps); the
    driver converts to/from the k-diffusion sigma space the sdxl_tpu scan
    uses (x_kd = x_vp / alpha_t).
    """

    def __init__(self, sigmas, order=2):
        self.sigmas = sigmas  # n+1 entries, trailing 0
        self.order = order
        self.model_outputs = [None] * order
        self.sigma_list = [None] * order  # stands in for timestep_list
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None

    @staticmethod
    def _alpha_sigma(s):
        # _sigma_to_alpha_sigma_t: alpha_t = 1/sqrt(1+s^2), sigma_t = s*alpha_t
        alpha_t = 1.0 / (1.0 + s**2) ** 0.5
        return alpha_t, s * alpha_t

    @classmethod
    def _lam(cls, s):
        alpha_t, sigma_t = cls._alpha_sigma(s)
        return torch.log(alpha_t / sigma_t)

    def _coeffs(self, rks, hh, B_h, order):
        """The shared R/b construction loop of uni_p/uni_c, verbatim."""
        R, b = [], []
        h_phi_1 = torch.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        factorial_i = 1
        for j in range(1, order + 1):
            R.append(torch.pow(rks, j - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= j + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        b = torch.stack([torch.as_tensor(v, dtype=torch.float32) for v in b])
        return torch.stack(R), b, h_phi_1

    def uni_c(self, this_model_output, last_sample, order, i):
        """multistep_uni_c_bh_update: corrector at sigma[i] from
        last_sample (the sample at sigma[i-1])."""
        s0, t = self.sigmas[i - 1], self.sigmas[i]
        m0 = self.model_outputs[-1]
        x = last_sample
        lambda_t, lambda_s0 = self._lam(t), self._lam(s0)
        alpha_t, sigma_t = self._alpha_sigma(t)
        _, sigma_s0 = self._alpha_sigma(s0)
        h = lambda_t - lambda_s0
        rks, D1s = [], []
        for j in range(1, order):
            si = self.sigma_list[-(j + 1)]
            mi = self.model_outputs[-(j + 1)]
            rk = (self._lam(si) - lambda_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(torch.tensor(1.0))
        rks = torch.stack(rks)
        hh = -h  # predict_x0
        B_h = torch.expm1(hh)  # bh2
        R, b, h_phi_1 = self._coeffs(rks, hh, B_h, order)
        if order == 1:
            rhos_c = torch.tensor([0.5])
        else:
            rhos_c = torch.linalg.solve(R, b)
        x_t_ = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
        if D1s:
            D1s = torch.stack(D1s, dim=0)  # [K, ...]
            corr_res = torch.einsum("k,k...->...", rhos_c[:-1], D1s)
        else:
            corr_res = 0
        D1_t = this_model_output - m0
        return x_t_ - alpha_t * B_h * (corr_res + rhos_c[-1] * D1_t)

    def uni_p(self, sample, order, i):
        """multistep_uni_p_bh_update: predictor sigma[i] -> sigma[i+1]."""
        s0, t = self.sigmas[i], self.sigmas[i + 1]
        m0 = self.model_outputs[-1]
        x = sample
        lambda_t, lambda_s0 = self._lam(t), self._lam(s0)
        alpha_t, sigma_t = self._alpha_sigma(t)
        _, sigma_s0 = self._alpha_sigma(s0)
        h = lambda_t - lambda_s0
        rks, D1s = [], []
        for j in range(1, order):
            si = self.sigma_list[-(j + 1)]
            mi = self.model_outputs[-(j + 1)]
            rk = (self._lam(si) - lambda_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(torch.tensor(1.0))
        rks = torch.stack(rks)
        hh = -h  # predict_x0
        B_h = torch.expm1(hh)  # bh2
        R, b, h_phi_1 = self._coeffs(rks, hh, B_h, order)
        if D1s:
            D1s = torch.stack(D1s, dim=0)
            if order == 2:
                rhos_p = torch.tensor([0.5])  # diffusers hardcodes order 2
            else:
                rhos_p = torch.linalg.solve(R[:-1, :-1], b[:-1])
            pred_res = torch.einsum("k,k...->...", rhos_p, D1s)
        else:
            pred_res = 0
        x_t_ = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
        return x_t_ - alpha_t * B_h * pred_res

    def step(self, model_output, i, sample):
        """UniPCMultistepScheduler.step, verbatim control flow."""
        sigma = self.sigmas[i]
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        # convert_model_output, prediction_type='epsilon', predict_x0
        x0_pred = (sample - sigma_t * model_output) / alpha_t
        use_corrector = i > 0 and self.last_sample is not None
        if use_corrector:
            sample = self.uni_c(x0_pred, self.last_sample, self.this_order, i)
        for k in range(self.order - 1):
            self.model_outputs[k] = self.model_outputs[k + 1]
            self.sigma_list[k] = self.sigma_list[k + 1]
        self.model_outputs[-1] = x0_pred
        self.sigma_list[-1] = sigma
        n = len(self.sigmas) - 1
        this_order = min(self.order, n - i)  # lower_order_final
        self.this_order = min(this_order, self.lower_order_nums + 1)  # warmup
        self.last_sample = sample
        prev_sample = self.uni_p(sample, self.this_order, i)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        return prev_sample


def sample_unipc(model, x_kd, sigmas, order=2):
    """Drive the UniPC transcription with a k-space x0-model.

    `model(x_kd, sigma)` is the synthetic denoised predictor; the epsilon
    fed to step() is recovered so convert_model_output reproduces exactly
    that x0 (the literal diffusers input convention). The trajectory is
    recorded in k-diffusion sigma space (x_vp / alpha_t) — the space the
    sdxl_tpu scan carries."""
    sched = UniPCTranscription(sigmas, order=order)
    alpha0, _ = UniPCTranscription._alpha_sigma(sigmas[0])
    x = alpha0 * x_kd
    traj = [x_kd.clone()]
    for i in range(len(sigmas) - 1):
        alpha_t, sigma_t = UniPCTranscription._alpha_sigma(sigmas[i])
        denoised = model(x / alpha_t, sigmas[i])
        eps = (x - alpha_t * denoised) / sigma_t
        x = sched.step(eps, i, x)
        alpha_n, _ = UniPCTranscription._alpha_sigma(sigmas[i + 1])
        traj.append((x / alpha_n).clone())
    return traj[-1], torch.stack(traj)


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
    heu_x, heu_traj = sample_heun(synth_model, x0.clone(), sig8)

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
    sde3_x, sde3_traj = sample_dpmpp_3m_sde(
        synth_model, x0.clone(), sig8, noises
    )

    # 4. UniPC (bh2, order 2): n=8 exercises warmup order-1, steady order-2
    # predictor+corrector, and the lower_order_final order-1 tail; n=3 and
    # n=2 pin the degenerate order schedules
    upc_x, upc_traj = sample_unipc(synth_model, x0.clone(), sig8)
    sig3 = get_sigmas_karras(3, sigma_min, sigma_max)
    sig2 = get_sigmas_karras(2, sigma_min, sigma_max)
    upc3_x, upc3_traj = sample_unipc(synth_model, x0.clone(), sig3)
    upc2_x, upc2_traj = sample_unipc(synth_model, x0.clone(), sig2)

    # 5. mid-eval samplers (dpm2 / dpm2_a / dpmpp_2s_a) + LMS: the same
    # synthetic model is evaluated at the MID sigmas too, so the goldens
    # pin the midpoint construction (geometric-mean sigma) as well
    dp2_x, dp2_traj = sample_dpm_2(synth_model, x0.clone(), sig8)
    dp2a_x, dp2a_traj = sample_dpm_2_ancestral(
        synth_model, x0.clone(), sig8, noises
    )
    s2a_x, s2a_traj = sample_dpmpp_2s_ancestral(
        synth_model, x0.clone(), sig8, noises
    )
    lms_x, lms_traj, lms_coeffs = sample_lms(synth_model, x0.clone(), sig8)
    # a longer grid exercises the full order-4 steady state
    sig12 = get_sigmas_karras(12, sigma_min, sigma_max)
    lms12_x, lms12_traj, lms12_coeffs = sample_lms(
        synth_model, x0.clone(), sig12
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
        heun_final=heu_x.numpy(),
        heun_traj=heu_traj.numpy(),
        step_noises=noises.numpy(),
        euler_a_final=eua_x.numpy(),
        euler_a_traj=eua_traj.numpy(),
        dpmpp_sde_final=sde_x.numpy(),
        dpmpp_sde_traj=sde_traj.numpy(),
        dpmpp_3m_sde_final=sde3_x.numpy(),
        dpmpp_3m_sde_traj=sde3_traj.numpy(),
        unipc_final=upc_x.numpy(),
        unipc_traj=upc_traj.numpy(),
        sigmas_3=sig3.numpy(),
        unipc3_final=upc3_x.numpy(),
        unipc3_traj=upc3_traj.numpy(),
        sigmas_2=sig2.numpy(),
        unipc2_final=upc2_x.numpy(),
        unipc2_traj=upc2_traj.numpy(),
        dpm2_final=dp2_x.numpy(),
        dpm2_traj=dp2_traj.numpy(),
        dpm2_a_final=dp2a_x.numpy(),
        dpm2_a_traj=dp2a_traj.numpy(),
        dpmpp_2s_a_final=s2a_x.numpy(),
        dpmpp_2s_a_traj=s2a_traj.numpy(),
        lms_final=lms_x.numpy(),
        lms_traj=lms_traj.numpy(),
        lms_coeffs=lms_coeffs,
        sigmas_12=sig12.numpy(),
        lms12_final=lms12_x.numpy(),
        lms12_traj=lms12_traj.numpy(),
        lms12_coeffs=lms12_coeffs,
    )
    print(f"wrote {OUT / 'k_goldens.npz'}")
    print("sigma_min/max:", sigma_min, sigma_max)
    print("karras_10:", kar10.numpy())
    print("dpmpp_final:", dpm_x.numpy())


if __name__ == "__main__":
    main()
