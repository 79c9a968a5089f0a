"""Generate golden arrays for the LCM sampler surface from a LITERAL
transcription of the public reference algorithm.

The transcription below reproduces, line by line, diffusers'
`LCMScheduler` (Luo et al., Latent Consistency Models, arXiv:2310.04378;
scheduling_lcm.py as of diffusers >= 0.24):

  - `set_timesteps`: the distilled model's original_inference_steps DDIM
    grid (t = k*i - 1), strength-windowed, floor(linspace(0, len, n,
    endpoint=False)) index selection over the descending grid.
  - `get_scalings_for_boundary_condition_discrete`: sigma_data = 0.5,
    scaled_timestep = t * timestep_scaling (10.0).
  - `step` (epsilon prediction, thresholding/clipping off — the SD
    defaults): predicted x0, consistency output c_out*x0 + c_skip*x,
    re-noise to the next grid point on every non-final step.
  - the pipeline's `get_guidance_scale_embedding` (w = gs - 1, scaled by
    1000, sin-first sinusoid with /(half-1) frequency spacing).

Deliberately written as a sequential torch loop with the exact operation
order of the public code, INDEPENDENT of sdxl_tpu's vectorized lax.scan
implementation, so a schedule off-by-one or a mis-ordered re-noise in the
scan cannot reproduce these numbers by accident.

Run once; goldens are committed under goldens/k_samplers/lcm_goldens.npz
and asserted by tests/test_lcm.py.
"""

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

OUT = pathlib.Path(__file__).resolve().parent.parent / "goldens" / "k_samplers"


def alphas_cumprod_sd(n_train=1000):
    """SD scaled-linear beta schedule (same table the repo uses)."""
    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, n_train, dtype=torch.float64)
        ** 2
    )
    return torch.cumprod(1.0 - betas, dim=0).to(torch.float32)


def lcm_set_timesteps(num_inference_steps, original_inference_steps=50,
                      num_train_timesteps=1000, strength=1.0):
    """LCMScheduler.set_timesteps, verbatim math."""
    k = num_train_timesteps // original_inference_steps
    lcm_origin_timesteps = (
        np.asarray(list(range(1, int(original_inference_steps * strength) + 1)))
        * k
        - 1
    )
    lcm_origin_timesteps = lcm_origin_timesteps[::-1].copy()
    inference_indices = np.linspace(
        0, len(lcm_origin_timesteps), num=num_inference_steps, endpoint=False
    )
    inference_indices = np.floor(inference_indices).astype(np.int64)
    return lcm_origin_timesteps[inference_indices]


def get_scalings_for_boundary_condition_discrete(timestep,
                                                 timestep_scaling=10.0,
                                                 sigma_data=0.5):
    """LCMScheduler.get_scalings_for_boundary_condition_discrete, verbatim."""
    scaled_timestep = timestep * timestep_scaling
    c_skip = sigma_data**2 / (scaled_timestep**2 + sigma_data**2)
    c_out = scaled_timestep / (scaled_timestep**2 + sigma_data**2) ** 0.5
    return c_skip, c_out


def lcm_sample(model, x, timesteps, alphas_cumprod, noises):
    """The LCMScheduler.step loop (eps prediction), verbatim order.

    `noises[i]` is the re-noise normal injected after step i (the last
    entry is unused)."""
    timesteps = torch.as_tensor(np.ascontiguousarray(timesteps),
                                dtype=torch.long)
    traj = [x.clone()]
    denoised_traj = []
    n = len(timesteps)
    for i in range(n):
        t = timesteps[i]
        prev_t = timesteps[i + 1] if i + 1 < n else t
        alpha_prod_t = alphas_cumprod[t]
        alpha_prod_t_prev = alphas_cumprod[prev_t]
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        c_skip, c_out = get_scalings_for_boundary_condition_discrete(
            float(t)
        )
        model_output = model(x, float(t))
        predicted_original_sample = (
            x - beta_prod_t.sqrt() * model_output
        ) / alpha_prod_t.sqrt()
        denoised = c_out * predicted_original_sample + c_skip * x
        if i != n - 1:
            x = (alpha_prod_t_prev.sqrt() * denoised
                 + beta_prod_t_prev.sqrt() * noises[i])
        else:
            x = denoised
        traj.append(x.clone())
        denoised_traj.append(denoised.clone())
    return x, torch.stack(traj), torch.stack(denoised_traj)


def get_guidance_scale_embedding(w, embedding_dim=256):
    """LatentConsistencyModelPipeline.get_guidance_scale_embedding,
    verbatim (w is already guidance_scale - 1)."""
    w = w * 1000.0
    half_dim = embedding_dim // 2
    emb = torch.log(torch.tensor(10000.0)) / (half_dim - 1)
    emb = torch.exp(torch.arange(half_dim, dtype=torch.float32) * -emb)
    emb = w.to(torch.float32)[:, None] * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
    if embedding_dim % 2 == 1:
        emb = torch.nn.functional.pad(emb, (0, 1))
    return emb


def synth_model(x, t):
    """Deterministic synthetic eps model over (x, integer timestep)."""
    return torch.sin(x * 1.7) * 0.8 + 0.1 * x * t / 1000.0


def main():
    torch.manual_seed(0)
    alphas = alphas_cumprod_sd()

    ts4 = lcm_set_timesteps(4)
    ts8 = lcm_set_timesteps(8)
    ts6_s05 = lcm_set_timesteps(6, strength=0.5)
    ts4_o25 = lcm_set_timesteps(4, original_inference_steps=25)

    t_grid = np.asarray([19.0, 279.0, 519.0, 759.0, 999.0])
    c_skip = np.asarray(
        [get_scalings_for_boundary_condition_discrete(t)[0] for t in t_grid],
        dtype=np.float32,
    )
    c_out = np.asarray(
        [get_scalings_for_boundary_condition_discrete(t)[1] for t in t_grid],
        dtype=np.float32,
    )

    x0 = torch.randn(11, generator=torch.Generator().manual_seed(7))
    noises = torch.randn(
        (len(ts4), 11), generator=torch.Generator().manual_seed(13)
    )
    xT, traj, denoised_traj = lcm_sample(synth_model, x0.clone(), ts4,
                                         alphas, noises)

    w_emb = get_guidance_scale_embedding(
        torch.tensor([7.5 - 1.0, 1.0 - 1.0, 0.0 - 1.0]), 256
    )
    w_emb_odd = get_guidance_scale_embedding(torch.tensor([4.0]), 9)

    OUT.mkdir(parents=True, exist_ok=True)
    np.savez(
        OUT / "lcm_goldens.npz",
        ts4=ts4,
        ts8=ts8,
        ts6_s05=ts6_s05,
        ts4_o25=ts4_o25,
        t_grid=t_grid,
        c_skip=c_skip,
        c_out=c_out,
        x0=x0.numpy(),
        noises=noises.numpy(),
        final=xT.numpy(),
        traj=traj.numpy(),
        denoised_traj=denoised_traj.numpy(),
        w_emb=w_emb.numpy(),
        w_emb_odd=w_emb_odd.numpy(),
    )
    print("wrote", OUT / "lcm_goldens.npz")
    print("ts4:", ts4, "ts8:", ts8)
    print("ts6_s05:", ts6_s05, "ts4_o25:", ts4_o25)


if __name__ == "__main__":
    main()
