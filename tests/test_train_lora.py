"""Runtime (unmerged) LoRA: injection, identity at init, equivalence with
the load-time merge path, export round-trip through io/lora.py, and the
QLoRA composition with the quantized base layout (train/lora.py +
ops/linear.py)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import CLIPConfig, UNetConfig
from sdxl_tpu.io.lora import apply_lora, load_lora_file, parse_lora_tensors
from sdxl_tpu.models.clip import init_clip
from sdxl_tpu.models.unet import init_unet, unet_forward
from sdxl_tpu.train.lora import (
    export_lora,
    init_lora,
    lora_state_dict,
    lora_target_paths,
    parse_path,
    set_leaves,
    strip_lora,
)

TINY = UNetConfig(
    adm_in_channels=24,
    in_channels=4,
    out_channels=4,
    model_channels=32,
    channel_mults=(1, 2, 4),
    n_head_channels=8,
    transformer_depths=(1, 1, 2),
    context_dim=16,
)


@pytest.fixture(scope="module")
def tiny_unet():
    params = init_unet(jax.random.PRNGKey(0), TINY, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16), jnp.float32)
    label = jax.random.normal(jax.random.PRNGKey(3), (1, 24), jnp.float32)
    return params, (x, t, ctx, label)


def _fwd(params, args):
    x, t, ctx, label = args
    return unet_forward(params, TINY, x, t, ctx, label)


def _randomize_ups(flat, key, scale=0.05):
    out = dict(flat)
    for k in flat:
        if k.endswith(".lora_up"):
            key, sub = jax.random.split(key)
            out[k] = scale * jax.random.normal(
                sub, flat[k].shape, flat[k].dtype
            )
    return out


def test_init_is_identity(tiny_unet):
    """up == 0 at init -> injected forward is BITWISE the base forward."""
    params, args = tiny_unet
    flat = init_lora(params, rank=4, key=jax.random.PRNGKey(7))
    assert flat and all(
        k.endswith(".lora_down") or k.endswith(".lora_up") for k in flat
    )
    y0 = _fwd(params, args)
    y1 = _fwd(set_leaves(params, flat), args)
    assert jnp.array_equal(y0, y1)


def test_set_leaves_does_not_mutate_base(tiny_unet):
    params, _ = tiny_unet
    flat = init_lora(params, rank=2, key=jax.random.PRNGKey(8))
    before = jax.tree.leaves(params)
    tree2 = set_leaves(params, flat)
    after = jax.tree.leaves(params)
    assert len(before) == len(after)
    assert all(a is b for a, b in zip(before, after))
    # untouched subtrees are shared, not copied
    assert tree2["time_embed"] is params["time_embed"]
    # every factor landed
    any_path = parse_path(next(iter(flat)))
    node = tree2
    for p in any_path:
        node = node[p]
    assert node is flat[next(iter(flat))]


def test_runtime_equals_manual_merge(tiny_unet):
    """y += (x@down)@up at the use site == merging w += down@up ahead."""
    params, args = tiny_unet
    flat = _randomize_ups(
        init_lora(params, rank=4, key=jax.random.PRNGKey(9)),
        jax.random.PRNGKey(10),
    )
    y_runtime = _fwd(set_leaves(params, flat), args)

    merged = copy.deepcopy(jax.tree.map(lambda a: a, params))
    for k in flat:
        if not k.endswith(".lora_down"):
            continue
        base = k[: -len(".lora_down")]
        path = parse_path(base)
        node = merged
        for p in path:
            node = node[p]
        node["w"] = node["w"] + flat[k] @ flat[base + ".lora_up"]
    y_merged = _fwd(merged, args)
    assert float(jnp.max(jnp.abs(y_runtime - y_merged))) < 2e-5


@pytest.mark.parametrize("fmt", ["kohya", "peft"])
def test_export_roundtrip_through_inference_merge(tiny_unet, tmp_path, fmt):
    """export_lora -> load_lora_file -> apply_lora (the inference --lora
    path) reproduces the runtime-applied forward."""
    params, args = tiny_unet
    flat = _randomize_ups(
        init_lora(params, rank=4, key=jax.random.PRNGKey(11)),
        jax.random.PRNGKey(12),
    )
    y_runtime = _fwd(set_leaves(params, flat), args)

    path = str(tmp_path / f"adapter_{fmt}.safetensors")
    export_lora(path, flat, {"unet": params}, fmt=fmt)
    entries = load_lora_file(path)
    assert len(entries) == len(flat) // 2

    merged = copy.deepcopy(jax.tree.map(lambda a: a, params))
    res = apply_lora(entries, unet=merged)
    assert not res["skipped"], res["skipped"]
    assert len(res["applied"]) == len(entries)
    y_merged = _fwd(merged, args)
    assert float(jnp.max(jnp.abs(y_runtime - y_merged))) < 2e-5


def test_target_presets(tiny_unet):
    params, _ = tiny_unet
    attn = lora_target_paths(params, "attn")
    alllin = lora_target_paths(params, "all-linear")
    assert attn and set(map(tuple, attn)) < set(map(tuple, alllin))
    # attn preset = exactly q/k/v/out of attn1+attn2 per transformer block
    assert all(p[-1] in ("q", "k", "v", "out") for p in attn)
    extra = set(map(tuple, alllin)) - set(map(tuple, attn))
    assert any(p[-1] in ("proj", "lin") for p in extra)  # GEGLU mlp
    assert any(p[-1] in ("proj_in", "proj_out") for p in extra)


def test_strip_lora(tiny_unet):
    params, args = tiny_unet
    flat = _randomize_ups(
        init_lora(params, rank=2, key=jax.random.PRNGKey(13)),
        jax.random.PRNGKey(14),
    )
    stripped = strip_lora(set_leaves(params, flat))
    assert jnp.array_equal(_fwd(stripped, args), _fwd(params, args))


def test_qlora_quantized_base(tiny_unet):
    """LoRA on an int8-quantized base: the runtime delta applies on top of
    the dequantized weight — bitwise equal to running the same LoRA over
    a base whose weights were dequantized ahead of time."""
    from sdxl_tpu.io.quantize import quantize_tree
    from sdxl_tpu.ops.quant import dequant_weight

    params, args = tiny_unet
    qtree = quantize_tree(
        copy.deepcopy(jax.tree.map(lambda a: a, params)), bits=8, min_dim=8
    )
    flat = _randomize_ups(
        init_lora(qtree, rank=4, key=jax.random.PRNGKey(15)),
        jax.random.PRNGKey(16),
    )
    assert flat, "no QLoRA targets found on the quantized tree"

    def deq(node):
        if isinstance(node, dict):
            if "qw" in node or "qw4" in node:
                out = {
                    k: v for k, v in node.items()
                    if k not in ("qw", "qw4", "qs")
                }
                out["w"] = dequant_weight(node, jnp.float32)
                return out
            return {k: deq(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [deq(v) for v in node]
        return node

    y_q = _fwd(set_leaves(qtree, flat), args)
    y_deq = _fwd(set_leaves(deq(qtree), flat), args)
    assert jnp.array_equal(y_q, y_deq)


def test_clip_tower_injection_and_export(tmp_path):
    from sdxl_tpu.models.clip import clip_hidden_pooled

    cfg = CLIPConfig(n_state=32, embed_dim=32, n_head=4, n_layer=2)
    params = init_clip(jax.random.PRNGKey(0), cfg, jnp.float32)
    flat = _randomize_ups(
        init_lora(params, rank=2, key=jax.random.PRNGKey(1)),
        jax.random.PRNGKey(2),
    )
    sd = lora_state_dict(flat, {"te1": params}, fmt="kohya")
    assert any(k.startswith("lora_te1_text_model_encoder_layers_0_self_attn_")
               for k in sd)
    entries, bad = parse_lora_tensors(sd)
    assert not bad
    merged = copy.deepcopy(jax.tree.map(lambda a: a, params))
    res = apply_lora(entries, te1=merged)
    assert not res["skipped"]

    toks = jnp.array([[49406, 320, 49407] + [0] * 4])
    h_rt, _ = clip_hidden_pooled(set_leaves(params, flat), cfg, toks, 1)
    h_mg, _ = clip_hidden_pooled(merged, cfg, toks, 1)
    assert float(jnp.max(jnp.abs(h_rt - h_mg))) < 2e-5


@pytest.mark.parametrize("fmt", ["peft", "kohya"])
def test_flux_injection_and_export(tmp_path, fmt):
    from sdxl_tpu.configs import FluxConfig
    from sdxl_tpu.models.flux import flux_forward, init_flux

    cfg = FluxConfig(in_channels=16, num_layers=1, num_single_layers=1,
                     n_heads=2, head_dim=8, joint_attention_dim=24,
                     pooled_projection_dim=16, axes_dims=(4, 2, 2),
                     time_sinusoid_dim=32)
    params = init_flux(jax.random.PRNGKey(0), cfg, jnp.float32)
    flat = _randomize_ups(
        init_lora(params, rank=2, key=jax.random.PRNGKey(1)),
        jax.random.PRNGKey(2),
    )
    # double-stream attn + single-stream attn both targeted
    assert any(".attn.to_q.lora_down" in k for k in flat)
    assert any(k.startswith("single_blocks.") for k in flat)

    path = str(tmp_path / f"flux_lora_{fmt}.safetensors")
    export_lora(path, flat, {"transformer": params}, fmt=fmt)
    entries = load_lora_file(path)
    merged = copy.deepcopy(jax.tree.map(lambda a: a, params))
    res = apply_lora(entries, transformer=merged)
    assert not res["skipped"], res["skipped"]

    b = 1
    lat = jax.random.normal(jax.random.PRNGKey(3), (b, 4, 4, 4), jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(4), (b, 3, 24), jnp.float32)
    pooled = jax.random.normal(jax.random.PRNGKey(5), (b, 16), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    g = jnp.full((b,), 3.5, jnp.float32)
    y_rt = flux_forward(set_leaves(params, flat), cfg, lat, t, txt, pooled, g)
    y_mg = flux_forward(merged, cfg, lat, t, txt, pooled, g)
    assert float(jnp.max(jnp.abs(y_rt - y_mg))) < 2e-5
