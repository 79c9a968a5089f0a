"""Weight-only quantization (ops/quant.py + io/quantize.py).

Covers: the int8/int4 quantize/dequant math (exact round-trip for
representable weights, bounded error for random ones), the linear()
use-site dequant, the tree walker's structural rules (scoping, mod
clamp, norms untouched), bit-exact equivalence of a quantized
flux_forward against the same weights dequantized ahead of time, the
HLO guarantee that the int8 weight — not a hoisted bf16 copy — is what
lives in the sampling scan's while carry, and TP sharding of the
quantized layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import FluxConfig
from sdxl_tpu.io.quantize import (
    parse_quantize_spec,
    quantize_tree,
    random_quantized_like,
)
from sdxl_tpu.models.flux import flux_forward, init_flux
from sdxl_tpu.ops.linear import linear
from sdxl_tpu.ops.quant import (
    dequant_weight,
    quantize_int4,
    quantize_int8,
)

TINY = FluxConfig(
    in_channels=16, num_layers=2, num_single_layers=2, n_heads=2,
    head_dim=8, joint_attention_dim=32, pooled_projection_dim=24,
    guidance_embeds=True, axes_dims=(4, 2, 2), time_sinusoid_dim=32,
)


def _representable_int8(rng, d_in, d_out):
    """A weight that int8 per-channel quantization reproduces exactly."""
    q = rng.integers(-127, 128, (d_in, d_out)).astype(np.float32)
    q[np.argmax(np.abs(q), axis=0), np.arange(d_out)] = 127  # pin the max
    # power-of-two scales survive the quantizer's max/127 round-trip
    s = np.exp2(rng.integers(-13, -7, (d_out,))).astype(np.float32)
    return (q * s).astype(np.float32)


def _representable_int4(rng, d_in, d_out, group):
    q = rng.integers(-7, 8, (d_in, d_out)).astype(np.float32)
    qg = q.reshape(d_in // group, group, d_out)
    idx = np.argmax(np.abs(qg), axis=1)
    for g in range(qg.shape[0]):
        qg[g, idx[g], np.arange(d_out)] = 7
    s = np.exp2(rng.integers(-13, -7, (d_in // group, d_out))
                ).astype(np.float32)
    return (qg * s[:, None, :]).reshape(d_in, d_out).astype(np.float32)


def test_int8_roundtrip_exact():
    rng = np.random.default_rng(0)
    w = _representable_int8(rng, 64, 48)
    q = quantize_int8(w)
    assert q["qw"].dtype == np.int8 and q["qs"].shape == (48,)
    back = np.asarray(dequant_weight(q, jnp.float32))
    np.testing.assert_array_equal(back, w)


def test_int4_roundtrip_exact():
    rng = np.random.default_rng(1)
    w = _representable_int4(rng, 64, 48, group=16)
    q = quantize_int4(w, group=16)
    assert q["qw4"].dtype == np.uint8
    assert q["qw4"].shape == (32, 48) and q["qs"].shape == (4, 48)
    back = np.asarray(dequant_weight(q, jnp.float32))
    np.testing.assert_array_equal(back, w)


def test_random_weight_error_bounds():
    rng = np.random.default_rng(2)
    w = rng.normal(0, 0.02, (256, 128)).astype(np.float32)
    err8 = np.abs(np.asarray(dequant_weight(quantize_int8(w),
                                            jnp.float32)) - w)
    # per-channel int8: error <= scale/2 = max|w_col| / 254
    assert (err8 <= np.abs(w).max(0) / 254 + 1e-9).all()
    err4 = np.abs(np.asarray(dequant_weight(quantize_int4(w, 64),
                                            jnp.float32)) - w)
    assert (err4 <= np.abs(w).reshape(4, 64, 128).max(1)
            .repeat(64, 0).reshape(256, 128) / 14 + 1e-9).all()


def test_device_quantize_matches_host():
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.02, (128, 64)).astype(np.float32)
    h8 = quantize_int8(w)
    d8 = jax.jit(quantize_int8)(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(d8["qw"]), h8["qw"])
    np.testing.assert_allclose(np.asarray(d8["qs"]), h8["qs"], rtol=1e-6)
    h4 = quantize_int4(w, 32)
    d4 = jax.jit(lambda a: quantize_int4(a, 32))(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(d4["qw4"]), h4["qw4"])


def test_linear_use_site_dequant_bitexact():
    """linear() on a quantized dict == linear() on the pre-dequantized
    weight, bitwise (same values enter the same matmul)."""
    rng = np.random.default_rng(4)
    w = _representable_int8(rng, 64, 32)
    b = rng.normal(0, 1, (32,)).astype(np.float32)
    q = dict(quantize_int8(w), b=jnp.asarray(b, jnp.bfloat16))
    q = {k: jnp.asarray(v) for k, v in q.items()}
    x = jnp.asarray(rng.normal(0, 1, (4, 64)), jnp.bfloat16)
    full = {"w": jnp.asarray(w, jnp.bfloat16),
            "b": jnp.asarray(b, jnp.bfloat16)}
    # dequant computes in f32 then casts — mirror that for the reference
    ref_w = jnp.asarray(w, jnp.float32).astype(jnp.bfloat16)
    got = jax.jit(linear)(q, x)
    want = jax.jit(linear)({"w": ref_w, "b": full["b"]}, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_parse_spec():
    assert parse_quantize_spec(None) is None
    assert parse_quantize_spec("int8") == 8
    assert parse_quantize_spec("int4") == 4
    with pytest.raises(ValueError):
        parse_quantize_spec("fp8")


def _tiny_params():
    return init_flux(jax.random.PRNGKey(0), TINY, jnp.float32)


def test_tree_walker_structure():
    params = _tiny_params()
    q = quantize_tree(params, bits=4, min_dim=8, group=8)
    blk = q["blocks"][0]
    # attention/MLP linears -> packed int4
    assert "qw4" in blk["attn"]["to_q"] and "w" not in blk["attn"]["to_q"]
    assert "qw4" in blk["mlp"]["in"]
    # modulation linears clamp to int8 even in int4 mode
    assert "qw" in blk["norm1"]["mod"] and "qw4" not in blk["norm1"]["mod"]
    # biases survive beside the quantized weight
    assert "b" in blk["attn"]["to_q"]
    # norms (1-D) untouched
    assert "w" in blk["attn"]["norm_q"]
    # outside the block scope: untouched
    assert "w" in q["x_embedder"] and "w" in q["proj_out"]
    sq = q["single_blocks"][0]
    assert "qw4" in sq["proj_mlp"] and "qw4" in sq["proj_out"]


def test_flux_forward_quantized_bitexact_vs_dequantized():
    """Running the quantized tree == running a tree whose weights were
    dequantized ahead of time — the in-graph dequant changes WHERE the
    conversion happens, not the numbers."""
    params = _tiny_params()
    qtree = quantize_tree(params, bits=8, min_dim=8)

    def host_dequant(node):
        if isinstance(node, dict):
            if "qw" in node or "qw4" in node:
                out = {k: v for k, v in node.items()
                       if k not in ("qw", "qw4", "qs")}
                out["w"] = dequant_weight(node, jnp.float32)
                return out
            return {k: host_dequant(v) for k, v in node.items()}
        if isinstance(node, list):
            return [host_dequant(v) for v in node]
        return node

    ref_params = host_dequant(qtree)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4),
                            jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 32), jnp.float32)
    pld = jax.random.normal(jax.random.PRNGKey(3), (1, 24), jnp.float32)
    ts = jnp.asarray([500.0])
    g = jnp.asarray([3500.0])
    out_q = jax.jit(flux_forward, static_argnums=(1,))(
        qtree, TINY, lat, ts, ctx, pld, guidance=g)
    out_ref = jax.jit(flux_forward, static_argnums=(1,))(
        ref_params, TINY, lat, ts, ctx, pld, guidance=g)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_ref))


def test_dequant_stays_inside_scan_carry():
    """The while carry holds the int8 weight; no full-size bf16 copy is
    hoisted out of the loop (the whole point of quantized storage).

    TPU-backend property: XLA:TPU fuses the dequant into the consuming
    matmul inside the while body (verified through the tunnel; also
    asserted on the real chip every bench run, bench.py). XLA:CPU
    instead hoists the dequantized f32 weight into the carry, so this
    test only runs when a TPU backend is present."""
    if jax.default_backend() == "cpu":
        pytest.skip("XLA:CPU hoists the dequant (TPU-only guarantee)")
    d = 256
    rng = np.random.default_rng(5)
    q = {k: jnp.asarray(v)
         for k, v in quantize_int8(
             rng.normal(0, 0.02, (d, d)).astype(np.float32)).items()}

    @jax.jit
    def run(p, x):
        def step(h, _):
            return jnp.tanh(linear(p, h)), None
        y, _ = jax.lax.scan(step, x, None, length=8)
        return y

    x = jnp.zeros((8, d), jnp.bfloat16)
    txt = run.lower(q, x).compile().as_text()
    while_lines = [ln for ln in txt.splitlines()
                   if " while(" in ln or "= while(" in ln]
    assert while_lines, "scan did not lower to a while loop"
    carry = while_lines[0]
    assert f"s8[{d},{d}]" in carry, carry
    assert f"bf16[{d},{d}]" not in carry, (
        "full-precision weight hoisted into the while carry:\n" + carry)


def test_random_quantized_like_builds_without_full_precision():
    abstract = jax.eval_shape(
        lambda k: init_flux(k, TINY, jnp.bfloat16), jax.random.PRNGKey(0))
    q = random_quantized_like(jax.random.PRNGKey(0), abstract, bits=4,
                              min_dim=8, group=8)
    blk = q["blocks"][0]
    assert blk["attn"]["to_q"]["qw4"].dtype == jnp.uint8
    assert blk["norm1"]["mod"]["qw"].dtype == jnp.int8
    lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
    ctx = jnp.zeros((1, 6, 32), jnp.float32)
    pld = jnp.zeros((1, 24), jnp.float32)
    out = jax.jit(flux_forward, static_argnums=(1,))(
        q, TINY, lat, jnp.asarray([500.0]), ctx, pld,
        guidance=jnp.asarray([3500.0]))
    assert out.shape == (1, 8, 8, 4) and np.isfinite(np.asarray(out)).all()


def test_quantized_pipeline_txt2img():
    from sdxl_tpu.pipeline.flux import random_flux_pipeline
    from tests.test_flux_loader import (
        TINY_CLIP_L,
        TINY_FLUX_PIPE,
        TINY_FLUX_VAE,
        TINY_T5,
    )

    pipe = random_flux_pipeline(
        flux_cfg=TINY_FLUX_PIPE, clip_cfg=TINY_CLIP_L,
        vae_cfg=TINY_FLUX_VAE, t5_cfg=TINY_T5, t5_tokens=16,
        compute_dtype=jnp.float32)
    ref = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2, seed=7)
    pipe.flux_params = jax.jit(
        lambda t: quantize_tree(t, 8, min_dim=8))(pipe.flux_params)
    imgs = pipe.txt2img(["a crab"], resolution=(64, 64), n_steps=2, seed=7)
    assert imgs.shape == (1, 64, 64, 3) and imgs.dtype == np.uint8
    # int8 on a 2-layer random model: same image up to quantization noise
    assert np.mean(np.abs(imgs.astype(np.int32)
                          - ref.astype(np.int32))) < 16.0


def test_shard_quantized_tree():
    """TP rules place qw like w and qs with the output axis; a 2x4 mesh
    runs the quantized forward to the same values as one device."""
    from sdxl_tpu.parallel.mesh import make_mesh, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = FluxConfig(
        in_channels=16, num_layers=1, num_single_layers=1, n_heads=4,
        head_dim=8, joint_attention_dim=32, pooled_projection_dim=24,
        guidance_embeds=False, axes_dims=(4, 2, 2), time_sinusoid_dim=32,
    )
    params = init_flux(jax.random.PRNGKey(0), cfg, jnp.float32)
    qtree = quantize_tree(params, bits=8, min_dim=8)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4),
                            jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 32), jnp.float32)
    pld = jax.random.normal(jax.random.PRNGKey(3), (2, 24), jnp.float32)
    ts = jnp.asarray([500.0, 500.0])
    ref = np.asarray(jax.jit(flux_forward, static_argnums=(1,))(
        qtree, cfg, lat, ts, ctx, pld))

    mesh = make_mesh(2, 4)
    sharded = shard_params(qtree, mesh, True, head_channels=cfg.head_dim,
                           fixed_heads=cfg.n_heads)
    spec = sharded["blocks"][0]["attn"]["to_q"]["qw"].sharding.spec
    assert tuple(spec) == (None, "model"), spec
    got = np.asarray(jax.jit(flux_forward, static_argnums=(1,))(
        sharded, cfg, lat, ts, ctx, pld))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    # packed int4: qw4 has no TP rule (replicates), but its 2-D qs [ng,
    # d_out] DOES match the expanded qs rules — GSPMD must still compose
    # them into the replicated-correct result
    q4 = quantize_tree(params, bits=4, min_dim=8, group=8)
    ref4 = np.asarray(jax.jit(flux_forward, static_argnums=(1,))(
        q4, cfg, lat, ts, ctx, pld))
    sharded4 = shard_params(q4, mesh, True, head_channels=cfg.head_dim,
                            fixed_heads=cfg.n_heads)
    got4 = np.asarray(jax.jit(flux_forward, static_argnums=(1,))(
        sharded4, cfg, lat, ts, ctx, pld))
    np.testing.assert_allclose(got4, ref4, atol=2e-5, rtol=1e-5)


def test_host_staged_build_quantizes_like_device():
    """The real-weights path: build_flux_from_diffusers(host=True) keeps
    numpy (nothing touches HBM), quantize_tree runs in numpy, and the
    result matches quantizing the device-built tree bit-for-bit."""
    from sdxl_tpu.io.flux import build_flux_from_diffusers
    from tests.test_flux_loader import make_diffusers_flux_dict

    params = _tiny_params()
    tensors = {k: np.asarray(v)
               for k, v in make_diffusers_flux_dict(TINY, params).items()}
    host_tree = build_flux_from_diffusers(tensors, TINY, jnp.bfloat16,
                                          host=True)
    dev_tree = build_flux_from_diffusers(tensors, TINY, jnp.bfloat16,
                                         host=False)
    assert isinstance(host_tree["blocks"][0]["attn"]["to_q"]["w"],
                      np.ndarray)
    qh = quantize_tree(host_tree, bits=8, min_dim=8)
    qd = quantize_tree(dev_tree, bits=8, min_dim=8)
    a = qh["blocks"][1]["mlp"]["in"]
    b = qd["blocks"][1]["mlp"]["in"]
    np.testing.assert_array_equal(np.asarray(a["qw"]), np.asarray(b["qw"]))
    np.testing.assert_allclose(np.asarray(a["qs"]), np.asarray(b["qs"]),
                               rtol=0, atol=0)


def test_t5_offload_conditioning_matches_resident():
    """t5_offload parks T5 on the host and ships it per conditioning
    call — same values as resident (the single-chip fit mode that
    load_flux_pipeline enables when transformer + T5 exceed the HBM
    budget)."""
    from sdxl_tpu.pipeline.flux import random_flux_pipeline
    from sdxl_tpu.utils.memory import tree_to_host
    from tests.test_flux_loader import (
        TINY_CLIP_L,
        TINY_FLUX_PIPE,
        TINY_FLUX_VAE,
        TINY_T5,
    )

    pipe = random_flux_pipeline(
        flux_cfg=TINY_FLUX_PIPE, clip_cfg=TINY_CLIP_L,
        vae_cfg=TINY_FLUX_VAE, t5_cfg=TINY_T5, t5_tokens=16,
        compute_dtype=jnp.float32)
    ctx_a, pooled_a = pipe.conditioning(["a crab"])
    pipe.t5_params = tree_to_host(pipe.t5_params)
    pipe.t5_offload = True
    assert isinstance(
        jax.tree_util.tree_leaves(pipe.t5_params)[0], np.ndarray)
    ctx_b, pooled_b = pipe.conditioning(["a crab"])
    np.testing.assert_array_equal(np.asarray(ctx_a), np.asarray(ctx_b))
    np.testing.assert_array_equal(np.asarray(pooled_a),
                                  np.asarray(pooled_b))
    # the parked copy is still host-side after the call
    assert isinstance(
        jax.tree_util.tree_leaves(pipe.t5_params)[0], np.ndarray)


# ---------------------------------------------------------------------------
# UNet families (SDXL/SD1/SD2): quantized block linears
# ---------------------------------------------------------------------------

from sdxl_tpu.io.quantize import UNET_KEEP8, UNET_WITHIN  # noqa: E402
from sdxl_tpu.models.unet import (  # noqa: E402
    fuse_unet_qkv,
    init_unet,
    stack_unet_transformers,
    unet_forward,
)
from tests.test_unet import TINY as TINY_UNET  # noqa: E402


def _tiny_unet_params():
    return fuse_unet_qkv(
        init_unet(jax.random.PRNGKey(0), TINY_UNET, jnp.float32))


def _unet_inputs(batch=1):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((batch, 16, 16, 4)), jnp.float32)
    t = jnp.full((batch,), 321, jnp.int32)
    ctx = jnp.asarray(
        rng.standard_normal((batch, 7, TINY_UNET.context_dim)), jnp.float32)
    label = jnp.asarray(
        rng.standard_normal((batch, TINY_UNET.adm_in_channels)), jnp.float32)
    return x, t, ctx, label


def _host_dequant(node):
    if isinstance(node, dict):
        if "qw" in node or "qw4" in node:
            out = {k: v for k, v in node.items()
                   if k not in ("qw", "qw4", "qs")}
            out["w"] = dequant_weight(node, jnp.float32)
            return out
        return {k: _host_dequant(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_host_dequant(v) for v in node]
    return node


def test_unet_quantize_scoping():
    """Only block linears quantize; embed MLPs and convs stay bf16/f32."""
    params = _tiny_unet_params()
    q = quantize_tree(params, bits=8, min_dim=8,
                      within=UNET_WITHIN, keep8=UNET_KEEP8)
    # middle-block transformer (depth 2) fused qkv is quantized
    mid = q["middle_block"]["transformer"]["blocks"][0]
    assert mid["attn1"]["qkv"]["qw"].dtype == jnp.int8
    assert "w" not in mid["attn1"]["qkv"]
    # the top-level timestep/label MLPs are OUTSIDE the block scope
    assert q["time_embed"]["lin1"]["w"].dtype == jnp.float32
    assert q["label_embed"]["lin1"]["w"].dtype == jnp.float32
    # convs (4-D) pass through untouched inside the scope
    assert q["input_blocks"][0]["conv"]["w"].ndim == 4
    # resblock lin_embed quantizes (int8 mode: same as everything)
    rb = q["input_blocks"][1]["res"]
    assert rb["lin_embed"]["qw"].dtype == jnp.int8


def test_unet_quantize_int4_keep8_lin_embed():
    """int4 mode clamps lin_embed (timestep-emb projection) to int8,
    like Flux's modulation linears; GEGLU/attention linears go int4."""
    params = _tiny_unet_params()
    q = quantize_tree(params, bits=4, min_dim=8, group=8,
                      within=UNET_WITHIN, keep8=UNET_KEEP8)
    mid = q["middle_block"]["transformer"]["blocks"][0]
    assert mid["attn1"]["qkv"]["qw4"].dtype == jnp.uint8
    assert mid["mlp"]["proj"]["qw4"].dtype == jnp.uint8
    rb = q["input_blocks"][1]["res"]
    assert rb["lin_embed"]["qw"].dtype == jnp.int8
    assert "qw4" not in rb["lin_embed"]


def test_unet_forward_quantized_bitexact_vs_dequantized():
    """Quantized-tree forward == forward of the same tree dequantized
    ahead of time: in-graph dequant changes WHERE the conversion runs,
    not the numbers (mirror of the Flux equivalence test)."""
    params = _tiny_unet_params()
    q = quantize_tree(params, bits=8, min_dim=8,
                      within=UNET_WITHIN, keep8=UNET_KEEP8)
    ref_params = _host_dequant(q)
    x, t, ctx, label = _unet_inputs()
    fwd = jax.jit(unet_forward, static_argnums=(1,))
    out_q = fwd(q, TINY_UNET, x, t, ctx, label)
    out_ref = fwd(ref_params, TINY_UNET, x, t, ctx, label)
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_ref))


def test_unet_quantized_then_stacked_matches_unstacked():
    """loader._maybe_stack order (fuse -> quantize -> stack): stacking
    the quantized dicts (int8 qw/qs get a leading depth axis, the scan
    slices them back) must not change the forward."""
    params = _tiny_unet_params()
    q = quantize_tree(params, bits=8, min_dim=8,
                      within=UNET_WITHIN, keep8=UNET_KEEP8)
    stacked = stack_unet_transformers(q, min_depth=2)
    mid = stacked["middle_block"]["transformer"]["blocks"]
    assert isinstance(mid, dict)  # stacked
    assert mid["attn1"]["qkv"]["qw"].shape[0] == 2  # depth axis
    assert mid["attn1"]["qkv"]["qw"].dtype == jnp.int8
    x, t, ctx, label = _unet_inputs()
    fwd = jax.jit(unet_forward, static_argnums=(1,))
    ref = fwd(q, TINY_UNET, x, t, ctx, label)
    got = fwd(stacked, TINY_UNET, x, t, ctx, label)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sdxl_pipeline_quantized_txt2img(tokenizer_dir, monkeypatch):
    """--quantize int8 end to end on the UNet family: the tiny SDXL
    pipeline produces a finite image through the quantized sampling
    scan (covers the CLI helper the random-weights path uses)."""
    from sdxl_tpu.cli.sample import _quantize_unet_inplace
    from tests.test_pipeline_e2e import (
        TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE,
    )
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    monkeypatch.setenv("SDXL_TPU_QUANT_MIN_DIM", "8")
    pipe = random_pipeline(
        embedder_cfg=TINY_EMBEDDER, diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    _quantize_unet_inplace(pipe, "int8")
    mid = pipe.unet_params["middle_block"]["transformer"]["blocks"][0]
    assert mid["attn1"]["qkv"]["qw"].dtype == jnp.int8
    imgs = pipe.txt2img("a cat", resolution=(64, 64), n_steps=2, seed=3)
    assert imgs.shape == (1, 64, 64, 3)
    assert np.isfinite(imgs.astype(np.float64)).all()
    assert imgs.std() > 0
