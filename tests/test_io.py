"""Checkpoint reader tests.

Synthetic checkpoints are written in both reference formats — the .npy dump
tree (python/save.py conventions) and a burn NamedMpk-style MessagePack
record — from known parameter pytrees, then read back through the format
readers and compared. The writers in this file double as an executable spec
of the reference layouts.
"""

import os

import jax
import jax.numpy as jnp
import msgpack
import numpy as np
import pytest

from sdxl_tpu.configs import AutoencoderConfig, CLIPConfig, UNetConfig
from sdxl_tpu.io.burn_mpk import MpkSource, parse_mpk_file
from sdxl_tpu.io.checkpoint import (
    flatten_pytree,
    load_native,
    save_native,
    unflatten_pytree,
)
from sdxl_tpu.io.npy_tree import (
    NpyTreeSource,
    write_scalar,
    write_shape_prefixed,
)
from sdxl_tpu.io.params_builder import build_autoencoder, build_clip, build_unet
from sdxl_tpu.models.clip import init_clip
from sdxl_tpu.models.unet import init_unet, unet_block_plan
from sdxl_tpu.models.vae import init_autoencoder

TINY_CLIP = CLIPConfig(
    n_vocab=32, n_state=16, embed_dim=12, n_head=2, n_ctx=8, n_layer=2,
    quick_gelu=True,
)
TINY_UNET = UNetConfig(
    adm_in_channels=20, in_channels=4, out_channels=4, model_channels=16,
    channel_mults=(1, 2, 4), n_head_channels=8, transformer_depths=(1, 1, 2),
    context_dim=24,
)
TINY_VAE = AutoencoderConfig(
    encoder_channels=((8, 8), (8, 16)),
    decoder_channels=((16, 16), (16, 8)),
    n_group=4,
)

KIND_TO_NPY = {
    "conv": "conv",
    "res": "resnet",
    "down": "downsample",
    "res_t": "resnet_transformer",
    "res_t_up": "resnet_transformer_upsample",
    "res_up": "resnet_upsample",
}


# ---------------------------------------------------------------------------
# npy-tree writers (reference dump layout)
# ---------------------------------------------------------------------------

def w_tensor(d, name, arr):
    os.makedirs(d, exist_ok=True)
    write_shape_prefixed(os.path.join(d, f"{name}.npy"), arr)


def w_linear(d, p):
    w_tensor(d, "weight", p["w"])
    if "b" in p:
        w_tensor(d, "bias", p["b"])


def w_conv(d, p):
    # dump stores OIHW; our pytree holds HWIO
    w_tensor(d, "weight", np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    if "b" in p:
        w_tensor(d, "bias", p["b"])


def w_norm(d, p):
    w_tensor(d, "weight", p["gamma"])
    w_tensor(d, "bias", p["beta"])
    write_scalar(os.path.join(d, "eps.npy"), 1e-5)


def write_clip_npy(root, params):
    w_tensor(root, "n_layer", np.array([len(params["blocks"])]))
    os.makedirs(os.path.join(root, "token_embedding"), exist_ok=True)
    w_tensor(os.path.join(root, "token_embedding"), "weight", params["token_embedding"])
    w_tensor(os.path.join(root, "position_embedding"), "weight", params["position_embedding"])
    for i, b in enumerate(params["blocks"]):
        bd = os.path.join(root, "blocks", str(i))
        attn = os.path.join(bd, "attn")
        for name, key in [("query", "q"), ("key", "k"), ("value", "v"), ("out", "out")]:
            w_linear(os.path.join(attn, name), b["attn"][key])
        write_scalar(os.path.join(attn, "n_head.npy"), 2)
        w_norm(os.path.join(bd, "attn_ln"), b["attn_ln"])
        w_linear(os.path.join(bd, "mlp", "fc1"), b["mlp"]["fc1"])
        w_linear(os.path.join(bd, "mlp", "fc2"), b["mlp"]["fc2"])
        w_norm(os.path.join(bd, "mlp_ln"), b["mlp_ln"])
    w_norm(os.path.join(root, "layer_norm"), params["layer_norm"])
    if params.get("text_projection") is not None:
        w_tensor(root, "text_projection", params["text_projection"])


def w_res(d, p):
    w_norm(os.path.join(d, "norm_in"), p["norm_in"])
    w_conv(os.path.join(d, "conv_in"), p["conv_in"])
    w_linear(os.path.join(d, "lin_embed"), p["lin_embed"])
    w_norm(os.path.join(d, "norm_out"), p["norm_out"])
    w_conv(os.path.join(d, "conv_out"), p["conv_out"])
    if "skip" in p:
        w_conv(os.path.join(d, "skip_connection"), p["skip"])


def w_tblock(d, p):
    for norm in ("norm1", "norm2", "norm3"):
        w_norm(os.path.join(d, norm), p[norm])
    for attn in ("attn1", "attn2"):
        ad = os.path.join(d, attn)
        for name, key in [("query", "q"), ("key", "k"), ("value", "v"), ("out", "out")]:
            w_linear(os.path.join(ad, name), p[attn][key])
        write_scalar(os.path.join(ad, "n_head.npy"), 2)
    w_linear(os.path.join(d, "mlp", "geglu", "proj"), p["mlp"]["proj"])
    w_linear(os.path.join(d, "mlp", "lin"), p["mlp"]["lin"])


def w_spatial(d, p):
    w_norm(os.path.join(d, "norm"), p["norm"])
    w_linear(os.path.join(d, "proj_in"), p["proj_in"])
    write_scalar(os.path.join(d, "n_blocks.npy"), len(p["blocks"]))
    for i, b in enumerate(p["blocks"]):
        w_tblock(os.path.join(d, f"transformer_{i}"), b)
    w_linear(os.path.join(d, "proj_out"), p["proj_out"])


def w_unet_block(d, kind, p):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "type.txt"), "w") as f:
        f.write(KIND_TO_NPY[kind])
    if kind in ("conv", "down"):
        w_conv(d, p["conv"])
        return
    if kind == "res":
        w_res(d, p["res"])
        return
    w_res(os.path.join(d, "res"), p["res"])
    if kind in ("res_t", "res_t_up"):
        w_spatial(os.path.join(d, "transformer"), p["transformer"])
    if kind in ("res_up", "res_t_up"):
        w_conv(os.path.join(d, "upsample", "conv"), p["upsample"])


def write_unet_npy(root, cfg, params):
    in_plan, _, out_plan = unet_block_plan(cfg)
    w_linear(os.path.join(root, "lin1_time_embed"), params["time_embed"]["lin1"])
    w_linear(os.path.join(root, "lin2_time_embed"), params["time_embed"]["lin2"])
    w_linear(os.path.join(root, "lin1_label_embed"), params["label_embed"]["lin1"])
    w_linear(os.path.join(root, "lin2_label_embed"), params["label_embed"]["lin2"])
    write_scalar(os.path.join(root, "model_channels.npy"), cfg.model_channels)
    for name, plan, plist in [
        ("input_blocks", in_plan, params["input_blocks"]),
        ("output_blocks", out_plan, params["output_blocks"]),
    ]:
        bd = os.path.join(root, name)
        os.makedirs(bd, exist_ok=True)
        write_scalar(os.path.join(bd, "n_blocks.npy"), len(plan))
        for i, (spec, p) in enumerate(zip(plan, plist)):
            w_unet_block(os.path.join(bd, str(i)), spec.kind, p)
    mid = os.path.join(root, "middle_block")
    w_res(os.path.join(mid, "res1"), params["middle_block"]["res1"])
    w_spatial(os.path.join(mid, "transformer"), params["middle_block"]["transformer"])
    w_res(os.path.join(mid, "res2"), params["middle_block"]["res2"])
    w_norm(os.path.join(root, "norm_out"), params["norm_out"])
    w_conv(os.path.join(root, "conv_out"), params["conv_out"])


def w_vae_res(d, p):
    w_norm(os.path.join(d, "norm1"), p["norm1"])
    w_conv(os.path.join(d, "conv1"), p["conv1"])
    w_norm(os.path.join(d, "norm2"), p["norm2"])
    w_conv(os.path.join(d, "conv2"), p["conv2"])
    if "nin_shortcut" in p:
        w_conv(os.path.join(d, "nin_shortcut"), p["nin_shortcut"])


def w_vae_mid(d, p):
    w_vae_res(os.path.join(d, "block_1"), p["block_1"])
    ad = os.path.join(d, "attn")
    w_norm(os.path.join(ad, "norm"), p["attn"]["norm"])
    for k in ("q", "k", "v", "proj_out"):
        w_conv(os.path.join(ad, k), p["attn"][k])
    w_vae_res(os.path.join(d, "block_2"), p["block_2"])


def write_vae_npy(root, params):
    enc = os.path.join(root, "encoder")
    w_conv(os.path.join(enc, "conv_in"), params["encoder"]["conv_in"])
    w_vae_mid(os.path.join(enc, "mid"), params["encoder"]["mid"])
    write_scalar(os.path.join(enc, "n_block.npy"), len(params["encoder"]["blocks"]))
    for i, b in enumerate(params["encoder"]["blocks"]):
        bd = os.path.join(enc, "blocks", str(i))
        w_vae_res(os.path.join(bd, "res1"), b["res1"])
        w_vae_res(os.path.join(bd, "res2"), b["res2"])
        if "downsampler" in b:
            w_conv(os.path.join(bd, "downsampler", "conv"), b["downsampler"])
    w_norm(os.path.join(enc, "norm_out"), params["encoder"]["norm_out"])
    w_conv(os.path.join(enc, "conv_out"), params["encoder"]["conv_out"])

    dec = os.path.join(root, "decoder")
    w_conv(os.path.join(dec, "conv_in"), params["decoder"]["conv_in"])
    w_vae_mid(os.path.join(dec, "mid"), params["decoder"]["mid"])
    write_scalar(os.path.join(dec, "n_block.npy"), len(params["decoder"]["blocks"]))
    for i, b in enumerate(params["decoder"]["blocks"]):
        bd = os.path.join(dec, "blocks", str(i))
        for r in ("res1", "res2", "res3"):
            w_vae_res(os.path.join(bd, r), b[r])
        if "upsampler" in b:
            w_conv(os.path.join(bd, "upsampler"), b["upsampler"])
    w_norm(os.path.join(dec, "norm_out"), params["decoder"]["norm_out"])
    w_conv(os.path.join(dec, "conv_out"), params["decoder"]["conv_out"])

    w_conv(os.path.join(root, "quant_conv"), params["quant_conv"])
    w_conv(os.path.join(root, "post_quant_conv"), params["post_quant_conv"])


def assert_trees_close(a, b, atol=1e-6):
    fa, fb = flatten_pytree(a), flatten_pytree(b)
    assert set(fa) == set(fb), (
        f"missing: {set(fa) ^ set(fb)}"
    )
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            atol=atol, err_msg=k,
        )


# ---------------------------------------------------------------------------
# npy round-trips
# ---------------------------------------------------------------------------

def test_clip_npy_roundtrip(tmp_path):
    params = init_clip(jax.random.PRNGKey(0), TINY_CLIP)
    write_clip_npy(str(tmp_path), params)
    loaded = build_clip(NpyTreeSource(str(tmp_path)), TINY_CLIP)
    assert_trees_close(params, loaded)


def test_unet_npy_roundtrip(tmp_path):
    params = init_unet(jax.random.PRNGKey(1), TINY_UNET, jnp.float32)
    write_unet_npy(str(tmp_path), TINY_UNET, params)
    loaded = build_unet(NpyTreeSource(str(tmp_path)), TINY_UNET, jnp.float32)
    assert_trees_close(params, loaded)


def test_vae_npy_roundtrip(tmp_path):
    params = init_autoencoder(jax.random.PRNGKey(2), TINY_VAE)
    write_vae_npy(str(tmp_path), params)
    loaded = build_autoencoder(NpyTreeSource(str(tmp_path)), TINY_VAE)
    assert_trees_close(params, loaded)


# ---------------------------------------------------------------------------
# burn-mpk round-trip (synthetic record following burn's serde layout)
# ---------------------------------------------------------------------------

def m_param(arr, f16=True):
    a = np.asarray(arr, np.float32)
    if f16:
        value = a.astype(np.float16).view(np.uint16).reshape(-1).tolist()
    else:
        value = a.reshape(-1).tolist()
    return {
        "id": "someid",
        "param": {"value": value, "shape": list(a.shape)},
    }


def m_linear(p):
    d = {"weight": m_param(p["w"])}
    d["bias"] = m_param(p["b"]) if "b" in p else None
    return d


def m_conv(p):
    return {
        "weight": m_param(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))),
        "bias": m_param(p["b"]) if "b" in p else None,
    }


def m_norm(p):
    return {"gamma": m_param(p["gamma"]), "beta": m_param(p["beta"])}


def m_clip(params):
    return {
        "token_embedding": {"weight": m_param(params["token_embedding"])},
        "position_embedding": m_param(params["position_embedding"]),
        "blocks": [
            {
                "attn": {
                    "query": m_linear(b["attn"]["q"]),
                    "key": m_linear(b["attn"]["k"]),
                    "value": m_linear(b["attn"]["v"]),
                    "out": m_linear(b["attn"]["out"]),
                },
                "attn_ln": m_norm(b["attn_ln"]),
                "mlp": {
                    "fc1": m_linear(b["mlp"]["fc1"]),
                    "fc2": m_linear(b["mlp"]["fc2"]),
                },
                "mlp_ln": m_norm(b["mlp_ln"]),
            }
            for b in params["blocks"]
        ],
        "layer_norm": m_norm(params["layer_norm"]),
        "text_projection": m_param(params["text_projection"]),
    }


def test_clip_mpk_roundtrip(tmp_path):
    params = init_clip(jax.random.PRNGKey(3), TINY_CLIP)
    record = {"item": {"clip": m_clip(params)}, "metadata": {"format": "test"}}
    path = str(tmp_path / "embedder.mpk")
    with open(path, "wb") as f:
        f.write(msgpack.packb(record))
    src = parse_mpk_file(path)
    loaded = build_clip(src.child("clip"), TINY_CLIP)
    # f16 storage: compare at half precision tolerance
    assert_trees_close(params, loaded, atol=2e-3)


def test_mpk_enum_blocks_and_bytes_tensor():
    # enum-tagged UNet block entry + raw f16 bytes payload variant
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    node = {
        "Res": {
            "x": {
                "id": "i",
                "param": {
                    "bytes": arr.astype(np.float16).tobytes(),
                    "shape": [2, 3],
                },
            }
        }
    }
    src = MpkSource(node)
    assert src.block_type() == "resnet"
    inner = src.enum_inner()
    np.testing.assert_allclose(inner.tensor("x", 2), arr, atol=1e-3)


# ---------------------------------------------------------------------------
# native format
# ---------------------------------------------------------------------------

def test_native_roundtrip(tmp_path):
    params = init_unet(jax.random.PRNGKey(4), TINY_UNET, jnp.float32)
    path = str(tmp_path / "unet.safetensors")
    save_native(path, params, metadata={"model": "unet-tiny"})
    loaded = load_native(path)
    assert_trees_close(params, loaded)


def test_flatten_unflatten_identity():
    tree = {"a": {"b": [np.zeros(2), np.ones(3)]}, "c": np.arange(4)}
    flat = flatten_pytree(tree)
    assert set(flat) == {"a.b.0", "a.b.1", "c"}
    back = unflatten_pytree(flat)
    assert isinstance(back["a"]["b"], list)
    np.testing.assert_array_equal(back["a"]["b"][1], np.ones(3))


# ---------------------------------------------------------------------------
# burn-mpk layout-variant fuzz matrix (VERDICT r1 item 5)
#
# burn 0.13's serde degrees of freedom, enumerated as encoder knobs; the
# reader must accept every combination and give path-qualified errors for
# malformed records.
# ---------------------------------------------------------------------------

import itertools

import pytest

from sdxl_tpu.io.burn_mpk import MpkParseError


def _enc_tensor(a, layout):
    a = np.asarray(a, np.float32)
    enc = layout["leaf"]
    if enc == "f16_bits":
        leaf = {"value": a.astype(np.float16).view(np.uint16).reshape(-1).tolist(),
                "shape": list(a.shape)}
    elif enc == "f32_values":
        leaf = {"value": a.reshape(-1).tolist(), "shape": list(a.shape)}
    elif enc == "f16_bytes":
        leaf = {"bytes": a.astype(np.float16).tobytes(), "shape": list(a.shape)}
    elif enc == "f32_bytes_tagged":
        leaf = {"bytes": a.tobytes(), "shape": list(a.shape), "dtype": "F32"}
    elif enc == "bf16_bits_tagged":
        bits = (a.view(np.uint32) >> 16).astype(np.uint16)
        leaf = {"value": bits.reshape(-1).tolist(), "shape": list(a.shape),
                "dtype": "BF16"}
    else:
        raise AssertionError(enc)
    if layout["data_nest"]:
        leaf = {"data": leaf}  # FloatTensorSerde field nesting
    if layout["param_wrap"]:
        leaf = ({"id": "p0", "param": leaf} if layout["param_order_id_first"]
                else {"param": leaf, "id": "p0"})
    return leaf


def _enc_clip(params, layout):
    def lin(p):
        d = {"weight": _enc_tensor(p["w"], layout)}
        d["bias"] = _enc_tensor(p["b"], layout) if "b" in p else None
        return d

    def norm(p):
        return {"gamma": _enc_tensor(p["gamma"], layout),
                "beta": _enc_tensor(p["beta"], layout)}

    item = {
        "clip": {
            "token_embedding": {"weight": _enc_tensor(params["token_embedding"], layout)},
            "position_embedding": _enc_tensor(params["position_embedding"], layout),
            "blocks": [
                {
                    "attn": {
                        "query": lin(b["attn"]["q"]),
                        "key": lin(b["attn"]["k"]),
                        "value": lin(b["attn"]["v"]),
                        "out": lin(b["attn"]["out"]),
                    },
                    "attn_ln": norm(b["attn_ln"]),
                    "mlp": {"fc1": lin(b["mlp"]["fc1"]), "fc2": lin(b["mlp"]["fc2"])},
                    "mlp_ln": norm(b["mlp_ln"]),
                    "n_head": {},  # ConstantRecord (module usize field)
                }
                for b in params["blocks"]
            ],
            "layer_norm": norm(params["layer_norm"]),
            "text_projection": _enc_tensor(params["text_projection"], layout),
            "unused_constant": None,  # ConstantRecord as nil
        }
    }
    if layout["wrapper"] == "bare":
        return item
    meta = {"format": "NamedMpkFileRecorder", "float": "f16", "version": "0.13.0"}
    if layout["wrapper"] == "item_first":
        return {"item": item, "metadata": meta}
    return {"metadata": meta, "item": item}


_FUZZ_MATRIX = [
    dict(wrapper=w, param_wrap=pw, param_order_id_first=po, data_nest=dn, leaf=lf)
    for w, pw, po, dn, lf in itertools.product(
        ["bare", "item_first", "meta_first"],
        [True, False],
        [True],
        [False, True],
        ["f16_bits", "f32_values", "f16_bytes", "f32_bytes_tagged", "bf16_bits_tagged"],
    )
] + [
    # param key order flipped (serde field order is not guaranteed stable)
    dict(wrapper="item_first", param_wrap=True, param_order_id_first=False,
         data_nest=False, leaf="f16_bits"),
]


@pytest.mark.parametrize("layout", _FUZZ_MATRIX,
                         ids=lambda d: "-".join(str(v) for v in d.values()))
def test_mpk_layout_fuzz_matrix(tmp_path, layout):
    params = init_clip(jax.random.PRNGKey(3), TINY_CLIP)
    path = str(tmp_path / "embedder.mpk")
    with open(path, "wb") as f:
        f.write(msgpack.packb(_enc_clip(params, layout)))
    loaded = build_clip(parse_mpk_file(path).child("clip"), TINY_CLIP)
    tol = 0.0 if layout["leaf"] in ("f32_values", "f32_bytes_tagged") else 2e-2
    assert_trees_close(params, loaded, atol=max(tol, 1e-6))


def test_mpk_missing_field_names_path():
    src = MpkSource({"outer": {"inner": {"weight": None}}})
    with pytest.raises(KeyError, match=r"\$\.outer\.inner\.weight"):
        src.child("outer").child("inner").tensor("weight", 2)
    with pytest.raises(KeyError, match=r"\$\.outer\.missing"):
        src.child("outer").child("missing")


def test_mpk_ndim_mismatch_is_an_error():
    node = {"w": {"value": [1.0, 2.0, 3.0, 4.0], "shape": [2, 2]}}
    src = MpkSource(node)
    with pytest.raises(MpkParseError, match=r"\$\.w: expected a 1-d tensor"):
        src.tensor("w", 1)


def test_mpk_payload_shape_mismatch_is_an_error():
    node = {"w": {"value": [1.0, 2.0, 3.0], "shape": [2, 2]}}
    src = MpkSource(node)
    with pytest.raises(MpkParseError, match=r"\$\.w: tensor payload has 3"):
        src.tensor("w", 2)


def test_mpk_bad_bytes_length_is_an_error():
    node = {"w": {"bytes": b"\x00" * 7, "shape": [2, 2]}}
    src = MpkSource(node)
    with pytest.raises(MpkParseError, match=r"\$\.w: raw tensor buffer of 7"):
        src.tensor("w", 2)


def test_mpk_non_enum_block_names_path():
    src = MpkSource({"blocks": [{"not_a_variant": {}}]})
    blk = src.seq("blocks")[0]
    with pytest.raises(MpkParseError, match=r"\$\.blocks\[0\]"):
        blk.block_type()


# ---------------------------------------------------------------------------
# burn-mpk WRITER round-trips (export path: sdxl_tpu -> reference layout)
# ---------------------------------------------------------------------------

from sdxl_tpu.io import burn_mpk_write as mpkw


def test_mpk_writer_clip_roundtrip(tmp_path):
    params = init_clip(jax.random.PRNGKey(11), TINY_CLIP)
    path = str(tmp_path / "embedder.mpk")
    mpkw.write_embedder_mpk(path, {"clip": params, "open_clip": params})
    src = parse_mpk_file(path)
    loaded = build_clip(src.child("clip"), TINY_CLIP)
    assert_trees_close(params, loaded, atol=2e-3)  # f16 storage


def test_mpk_writer_unet_roundtrip_and_alphas(tmp_path):
    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod

    params = init_unet(jax.random.PRNGKey(12), TINY_UNET, jnp.float32)
    alphas = scaled_linear_alphas_cumprod(100)
    path = str(tmp_path / "diffuser.mpk")
    mpkw.write_diffuser_mpk(path, TINY_UNET, params, alphas)
    src = parse_mpk_file(path)
    loaded = build_unet(src.child("diffusion"), TINY_UNET, jnp.float32)
    assert_trees_close(params, loaded, atol=2e-3)
    # alphas ride f32 (stablediffusion/load.rs:56-57)
    np.testing.assert_allclose(
        src.tensor("alpha_cumulative_products", 1), alphas, atol=1e-7
    )


def test_mpk_writer_unet_handles_fused_and_stacked(tmp_path):
    """Export must transparently un-fuse qkv and un-stack scan stacks."""
    from sdxl_tpu.models.unet import fuse_unet_qkv, stack_unet_transformers

    params = init_unet(jax.random.PRNGKey(13), TINY_UNET, jnp.float32)
    prepped = stack_unet_transformers(fuse_unet_qkv(params), min_depth=2)
    path = str(tmp_path / "diffuser.mpk")
    mpkw.write_diffuser_mpk(path, TINY_UNET, prepped, np.ones(4, np.float32))
    loaded = build_unet(
        parse_mpk_file(path).child("diffusion"), TINY_UNET, jnp.float32
    )
    assert_trees_close(params, loaded, atol=2e-3)


def test_mpk_writer_vae_roundtrip(tmp_path):
    params = init_autoencoder(jax.random.PRNGKey(14), TINY_VAE)
    path = str(tmp_path / "latent_decoder.mpk")
    mpkw.write_latent_decoder_mpk(path, params)
    loaded = build_autoencoder(
        parse_mpk_file(path).child("autoencoder"), TINY_VAE, jnp.float32
    )
    assert_trees_close(params, loaded, atol=2e-3)


def test_mpk_inspect_dumps_record_tree(tmp_path, capsys):
    """--inspect field-diagnosis tool (VERDICT r2 #5): a full record-tree
    dump with wrappers, tensor shapes/encodings and enum variants, without
    building params."""
    from sdxl_tpu.io.burn_mpk import inspect_mpk

    layout = dict(wrapper="meta_first", param_wrap=True,
                  param_order_id_first=True, data_nest=True, leaf="f16_bits")
    params = init_clip(jax.random.PRNGKey(3), TINY_CLIP)
    path = str(tmp_path / "embedder.mpk")
    with open(path, "wb") as f:
        f.write(msgpack.packb(_enc_clip(params, layout)))
    out = inspect_mpk(path)
    assert "<BurnRecord" in out                      # wrapper detected
    assert "$.clip.token_embedding.weight" in out    # full record paths
    assert "Param(id=p0)" in out                     # ParamSerde detected
    assert "u16-bit list" in out                     # f16-bits encoding named
    assert "nil (Option::None / ConstantRecord)" in out  # optional bias

    # enum-tagged UNet block entries resolve to their type.txt name
    blk = {"blocks": [{"ResT": {"x": {"value": [0.0], "shape": [1]}}}]}
    p2 = str(tmp_path / "d.mpk")
    with open(p2, "wb") as f:
        f.write(msgpack.packb(blk))
    out2 = inspect_mpk(p2)
    assert "block enum ResT" in out2 and "resnet_transformer" in out2

    # CLI entry: --inspect needs no --output-dir
    from sdxl_tpu.cli.convert import main as convert_main

    assert convert_main(["--inspect", path]) == 0
    assert "$.clip" in capsys.readouterr().out
