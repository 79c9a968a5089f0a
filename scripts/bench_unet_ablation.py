"""Ablate UNet hot ops to find where the remaining time goes."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import sdxl_tpu.ops.norms as norms
import sdxl_tpu.ops.attention as attention
from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
from sdxl_tpu.models.unet import init_unet, unet_forward


def timed(f, args, iters=20):
    _ = float(jnp.sum(f(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = SDXL_BASE_DIFFUSER.unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    x = jnp.zeros((2, 128, 128, 4), jnp.bfloat16)
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
    label = jnp.zeros((2, 2816), jnp.bfloat16)
    args = (params, x, t, ctx, label)

    def run(tag):
        f = jax.jit(lambda p, a, b, c, d: unet_forward(p, cfg, a, b, c, d))
        dt = timed(f, args)
        print(f"{tag}: {dt*1000:.1f} ms", flush=True)
        return dt

    base = run("baseline")

    # --- flash on/off: route all attention to plain XLA ----------------------
    import sdxl_tpu.ops.flash_attention as fa

    fa.FLASH_DISABLED = True
    run("flash disabled (all-XLA attention)")
    fa.FLASH_DISABLED = False

    # --- fused self-attn qkv + precomputed cross-kv (the sampler's config) ---
    from sdxl_tpu.models.unet import fuse_unet_qkv, precompute_cross_kv

    fused = fuse_unet_qkv(params)
    kv = precompute_cross_kv(fused, cfg, ctx)
    f2 = jax.jit(
        lambda p, a, b, c, d: unet_forward(p, cfg, a, b, c, d, cross_kv=kv)
    )
    dt = timed(f2, (fused, x, t, ctx, label))
    print(f"fused qkv + precomputed cross-kv: {dt*1000:.1f} ms", flush=True)

    # --- A2: lane-preserving GN (no (g,c/g) reshape; one-hot group matmul) ---
    import numpy as np

    orig_gn = norms.groupnorm_nhwc
    import sdxl_tpu.models.unet as unet_mod

    def gn_lanes(x, gamma, beta, n_group=32, eps=1e-5):
        b = x.shape[0]
        c = x.shape[-1]
        cg = c // n_group
        onehot = jnp.asarray(
            (np.arange(c)[:, None] // cg) == np.arange(n_group)[None, :],
            jnp.float32,
        )
        xf = x.astype(jnp.float32).reshape(b, -1, c)
        n = xf.shape[1] * cg
        s1 = jnp.sum(xf, axis=1) @ onehot
        s2 = jnp.sum(jnp.square(xf), axis=1) @ onehot
        mean_g = s1 / n
        var_g = s2 / n - jnp.square(mean_g)
        scale_g = jax.lax.rsqrt(var_g + eps)
        mean_c = mean_g @ onehot.T
        scale_c = scale_g @ onehot.T
        a = scale_c * gamma.astype(jnp.float32)
        d = beta.astype(jnp.float32) - mean_c * a
        y = xf * a[:, None, :] + d[:, None, :]
        return y.astype(x.dtype).reshape(x.shape)

    norms.groupnorm_nhwc = gn_lanes
    unet_mod.groupnorm_nhwc = gn_lanes
    run("gn lane-preserving (one-hot group matmul)")
    norms.groupnorm_nhwc = orig_gn
    unet_mod.groupnorm_nhwc = orig_gn

    # --- A: groupnorm fully in compute dtype (stats still f32-reduced) ------

    def gn_bf16(x, gamma, beta, n_group=32, eps=1e-5):
        b = x.shape[0]
        c = x.shape[-1]
        spatial = x.shape[1:-1]
        xr = x.reshape(b, -1, n_group, c // n_group)
        mean = jnp.mean(xr, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(xr.astype(jnp.float32)), axis=(1, 3), keepdims=True
        ) - jnp.square(mean)
        scale = jax.lax.rsqrt(var + eps)
        y = (xr.astype(jnp.float32) - mean) * scale
        y = y.astype(x.dtype).reshape(b, *spatial, c)
        return y * gamma + beta

    norms.groupnorm_nhwc = gn_bf16
    import sdxl_tpu.models.unet as unet_mod
    unet_mod.groupnorm_nhwc = gn_bf16
    run("gn one-pass var (E[x^2]-E[x]^2)")
    norms.groupnorm_nhwc = orig_gn
    unet_mod.groupnorm_nhwc = orig_gn

    # --- B: attention via single einsum path, no explicit transposes --------
    orig_attn = attention.qkv_attention

    def attn_btHD(q, k, v, mask=None, n_head=1):
        b, tq, c = q.shape
        d = c // n_head
        scale = d ** -0.5
        qh = q.reshape(b, tq, n_head, d)
        kh = k.reshape(b, -1, n_head, d)
        vh = v.reshape(b, -1, n_head, d)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32
        )
        if mask is not None:
            logits = logits + mask[: logits.shape[2], : logits.shape[3]]
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, tq, c)

    attention.qkv_attention = attn_btHD
    unet_mod.qkv_attention = attn_btHD
    run("attn no-transpose einsum")

    # --- C: both ---
    norms.groupnorm_nhwc = gn_bf16
    unet_mod.groupnorm_nhwc = gn_bf16
    run("both")
    attention.qkv_attention = orig_attn
    unet_mod.qkv_attention = orig_attn
    norms.groupnorm_nhwc = orig_gn
    unet_mod.groupnorm_nhwc = orig_gn

    # --- D: bf16 softmax (quality risk — measurement only) ------------------
    def attn_bf16sm(q, k, v, mask=None, n_head=1):
        b, tq, c = q.shape
        d = c // n_head
        qh = q.reshape(b, tq, n_head, d)
        kh = k.reshape(b, -1, n_head, d)
        vh = v.reshape(b, -1, n_head, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * (d**-0.5), kh)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, tq, c)

    attention.qkv_attention = attn_bf16sm
    unet_mod.qkv_attention = attn_bf16sm
    run("attn bf16 softmax (measurement only)")
    attention.qkv_attention = orig_attn
    unet_mod.qkv_attention = orig_attn


if __name__ == "__main__":
    main()
