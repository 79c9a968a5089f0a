"""Manual smoke harness — the reference's `test` binary equivalent.

Mirrors /root/reference/src/bin/test/main.rs: run the real (tiny-config)
pipeline end to end with a hardcoded prompt on whatever backend is active,
plus per-module micro-checks on deterministic sin(arange) fixtures (the
reference's arb_tensor, test/main.rs:51-54), printing tensor summaries for
eyeball comparison.

Usage: python scripts/smoke.py [--full]   (--full uses real SDXL configs)
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def arb_tensor(shape, dtype=None):
    """Deterministic fixture: sin(arange(prod)).reshape(shape)."""
    import jax.numpy as jnp

    n = int(np.prod(shape))
    return jnp.sin(jnp.arange(n, dtype=jnp.float32)).reshape(shape).astype(
        dtype or jnp.float32
    )


def summary(name, x):
    a = np.asarray(x, np.float32)
    print(f"  {name}: shape={a.shape} mean={a.mean():+.5f} std={a.std():.5f} "
          f"min={a.min():+.4f} max={a.max():+.4f}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true", help="full SDXL configs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    from sdxl_tpu.configs import (
        AutoencoderConfig,
        CLIPConfig,
        DiffuserConfig,
        EmbedderConfig,
        SDXL_BASE_DIFFUSER,
        SDXL_EMBEDDER,
    )
    from sdxl_tpu.models.clip import clip_hidden_pooled, init_clip
    from sdxl_tpu.models.unet import init_unet, unet_forward
    from sdxl_tpu.models.vae import decode_latent, encode_image, init_autoencoder
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    if args.full:
        embedder_cfg, diffuser_cfg = SDXL_EMBEDDER, SDXL_BASE_DIFFUSER
        vae_cfg = AutoencoderConfig()
        res = (1024, 1024)
    else:
        embedder_cfg = EmbedderConfig(
            clip_config=CLIPConfig(n_state=32, embed_dim=32, n_head=4, n_layer=2),
            open_clip_config=CLIPConfig(
                n_state=32, embed_dim=32, n_head=4, n_layer=3, quick_gelu=False
            ),
        )
        diffuser_cfg = DiffuserConfig(
            adm_in_channels=32 + 6 * 256, model_channels=32,
            channel_mults=(1, 2, 4), num_head_channels=8,
            transformer_depths=(1, 1, 2), context_dim=64,
        )
        vae_cfg = AutoencoderConfig(
            encoder_channels=((16, 16), (16, 32), (32, 32), (32, 32)),
            decoder_channels=((32, 32), (32, 32), (32, 16), (16, 16)),
            n_group=4,
        )
        res = (64, 64)

    # --- per-module micro-checks on deterministic fixtures ---
    print("[clip]")
    clip_params = init_clip(jax.random.PRNGKey(0), embedder_cfg.clip_config)
    tokens = jnp.arange(8, dtype=jnp.int32)[None, :] % embedder_cfg.clip_config.n_vocab
    h, pooled = clip_hidden_pooled(
        clip_params, embedder_cfg.clip_config, tokens,
        embedder_cfg.clip_config.n_layer - 1,
    )
    summary("hidden", h)
    summary("pooled", pooled)

    print("[unet]")
    ucfg = diffuser_cfg.unet_config()
    unet_params = init_unet(jax.random.PRNGKey(1), ucfg, jnp.float32)
    eps = unet_forward(
        unet_params, ucfg,
        arb_tensor((1, 16, 16, 4)),
        jnp.array([500]),
        arb_tensor((1, 7, ucfg.context_dim)),
        arb_tensor((1, ucfg.adm_in_channels)),
    )
    summary("eps", eps)

    print("[vae]")
    vae_params = init_autoencoder(jax.random.PRNGKey(2), vae_cfg)
    img = arb_tensor((1, 32, 32, 3))
    lat = encode_image(vae_params, vae_cfg, img)
    summary("latent", lat)
    summary("recon", decode_latent(vae_params, vae_cfg, lat))

    # --- end-to-end with a hardcoded prompt (test/main.rs:184-236) ---
    print("[pipeline]")
    pipe = random_pipeline(
        embedder_cfg=embedder_cfg, diffuser_cfg=diffuser_cfg, vae_cfg=vae_cfg,
        compute_dtype=jnp.float32 if not args.full else jnp.bfloat16,
        param_dtype_unet=jnp.float32 if not args.full else jnp.bfloat16,
    )
    imgs = pipe.txt2img(
        "An elegant bedroom with a large bed", resolution=res, n_steps=2, seed=7
    )
    summary("image_u8", imgs)
    print("smoke OK")


if __name__ == "__main__":
    main()
