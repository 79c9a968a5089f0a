"""Generate golden arrays for the flow-matching sampler from a LITERAL
transcription of diffusers' FlowMatchEulerDiscreteScheduler (the SD3
family's scheduler; rectified flow, arXiv:2403.03206).

The transcription reproduces, line by line, the public scheduler:
__init__'s shifted training grid, set_timesteps' t-space linspace between
the shifted endpoints with the shift applied a second time (a quirk of
the public code, preserved verbatim), the Euler step
x += (sigma_next - sigma) * v, and scale_noise's straight-path noising.

Written as a sequential torch loop INDEPENDENT of sdxl_tpu's lax.scan
implementation so an off-by-one or mis-shifted schedule cannot reproduce
these numbers by accident.

Run once; goldens are committed under goldens/k_samplers/ and asserted
by tests/test_sd3.py.
"""

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens" / "k_samplers"

NUM_TRAIN = 1000


class FlowMatchEulerTranscription:
    """diffusers FlowMatchEulerDiscreteScheduler, verbatim math."""

    def __init__(self, shift=3.0, num_train_timesteps=1000):
        self.shift = shift
        self.num_train_timesteps = num_train_timesteps
        timesteps = np.linspace(
            1, num_train_timesteps, num_train_timesteps, dtype=np.float32
        )[::-1].copy()
        sigmas = torch.from_numpy(timesteps).to(torch.float32) / num_train_timesteps
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.timesteps = sigmas * num_train_timesteps
        self.sigmas = sigmas
        self.sigma_min = self.sigmas[-1].item()
        self.sigma_max = self.sigmas[0].item()

    def _sigma_to_t(self, sigma):
        return sigma * self.num_train_timesteps

    def set_timesteps(self, num_inference_steps):
        timesteps = np.linspace(
            self._sigma_to_t(self.sigma_max),
            self._sigma_to_t(self.sigma_min),
            num_inference_steps,
        )
        sigmas = timesteps / self.num_train_timesteps
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        sigmas = torch.from_numpy(sigmas).to(dtype=torch.float32)
        self.timesteps = sigmas * self.num_train_timesteps
        self.sigmas = torch.cat([sigmas, torch.zeros(1)])

    def step(self, model_output, step_index, sample):
        sigma = self.sigmas[step_index]
        sigma_next = self.sigmas[step_index + 1]
        return sample + (sigma_next - sigma) * model_output

    def scale_noise(self, sample, sigma, noise):
        return sigma * noise + (1.0 - sigma) * sample


def synth_model(x, t):
    """Deterministic synthetic velocity model over (x, t in [0, 1000])."""
    return torch.cos(x * 1.3) * 0.7 - 0.2 * x * t / 1000.0


def main():
    sch = FlowMatchEulerTranscription(shift=3.0)
    sch.set_timesteps(8)
    ts8 = sch.timesteps.numpy().copy()
    sig8 = sch.sigmas.numpy().copy()

    x = torch.randn(11, generator=torch.Generator().manual_seed(5))
    x0 = x.clone()
    traj = [x.clone()]
    for i in range(8):
        v = synth_model(x, float(sch.timesteps[i]))
        x = sch.step(v, i, x)
        traj.append(x.clone())

    sch5 = FlowMatchEulerTranscription(shift=5.0)
    sch5.set_timesteps(4)
    ts4_s5 = sch5.timesteps.numpy().copy()
    sig4_s5 = sch5.sigmas.numpy().copy()

    clean = torch.randn(7, generator=torch.Generator().manual_seed(9))
    nz = torch.randn(7, generator=torch.Generator().manual_seed(11))
    noised = sch.scale_noise(clean, sch.sigmas[3], nz)

    OUT.mkdir(parents=True, exist_ok=True)
    np.savez(
        OUT / "fm_goldens.npz",
        ts8=ts8, sig8=sig8,
        ts4_s5=ts4_s5, sig4_s5=sig4_s5,
        x0=x0.numpy(), traj=torch.stack(traj).numpy(), final=x.numpy(),
        clean=clean.numpy(), nz=nz.numpy(), noised=noised.numpy(),
        noised_sigma=np.float32(sch.sigmas[3].item()),
    )
    print("wrote", OUT / "fm_goldens.npz")
    print("ts8:", ts8)
    print("sig8:", sig8)


if __name__ == "__main__":
    main()
