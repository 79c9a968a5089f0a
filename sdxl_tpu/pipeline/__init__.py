from .conditioning import Conditioning, text_to_conditioning
from .sampler import (
    cosine_schedule,
    euler_sample_latent,
    ddim_timesteps,
    diffuse_latent,
    offset_cosine_schedule,
    offset_cosine_schedule_cumprod,
    refine_latent,
    sample_latent,
    scaled_linear_alphas_cumprod,
)
from .latent import decode_latent_to_images, encode_images_to_latent
from .sd1 import SD1Pipeline, load_sd1_pipeline, random_sd1_pipeline
from .resolutions import RESOLUTIONS, validate_resolution

__all__ = [
    "Conditioning",
    "text_to_conditioning",
    "ddim_timesteps",
    "euler_sample_latent",
    "diffuse_latent",
    "refine_latent",
    "sample_latent",
    "scaled_linear_alphas_cumprod",
    "SD1Pipeline",
    "load_sd1_pipeline",
    "random_sd1_pipeline",
    "decode_latent_to_images",
    "encode_images_to_latent",
    "RESOLUTIONS",
    "validate_resolution",
]
