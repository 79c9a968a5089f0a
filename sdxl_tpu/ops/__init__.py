from .norms import layernorm, layernorm_affine, groupnorm_nhwc
from .attention import qkv_attention, causal_mask
from .embeddings import timestep_embedding, conditioning_embedding
from .linear import linear, linear_nobias

__all__ = [
    "layernorm",
    "layernorm_affine",
    "groupnorm_nhwc",
    "qkv_attention",
    "causal_mask",
    "timestep_embedding",
    "conditioning_embedding",
    "linear",
    "linear_nobias",
]
