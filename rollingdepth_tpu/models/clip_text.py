"""CLIP text encoder — functional JAX implementation.

Behavioral reference: the reference uses HF ``CLIPTextModel`` (external pip
dep, SURVEY.md D14) to produce text embeddings: the empty-prompt [1, 2, 1024]
embed for the depth path (/root/reference/rollingdepth/
rollingdepth_pipeline.py:178-191) and 77-token chunked prompt encodings for
relighting (/root/reference/rollingdepth/rollingimg_pipeline.py:239-279).

Standard CLIPTextTransformer: token+position embeddings, pre-LN transformer
with causal self-attention, final layer norm.  ``last_hidden_state`` is the
output the pipelines consume (``text_encoder(ids)[0]``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # SD2: gelu; SD1.5 CLIP ViT-L: quick_gelu
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "CLIPTextConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def sd15(cls) -> "CLIPTextConfig":
        return cls(hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
                   num_attention_heads=12, hidden_act="quick_gelu")

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=99, hidden_size=16, intermediate_size=32,
                   num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=24)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=(name == "gelu_new"))
    raise ValueError(f"hidden_act {name!r}")


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8 + cfg.num_hidden_layers * 8))
    d = cfg.hidden_size
    p: Params = {
        "embeddings": {
            "token_embedding": {
                "embedding": jax.random.normal(next(keys), (cfg.vocab_size, d), jnp.float32).astype(dtype) * 0.02
            },
            "position_embedding": {
                "embedding": jax.random.normal(next(keys), (cfg.max_position_embeddings, d), jnp.float32).astype(dtype) * 0.02
            },
        },
        "encoder": {"layers": []},
        "final_layer_norm": L.layer_norm_init(d, dtype),
    }
    for _ in range(cfg.num_hidden_layers):
        layer = {
            "layer_norm1": L.layer_norm_init(d, dtype),
            "self_attn": {
                "q_proj": L.linear_init(next(keys), d, d, dtype=dtype),
                "k_proj": L.linear_init(next(keys), d, d, dtype=dtype),
                "v_proj": L.linear_init(next(keys), d, d, dtype=dtype),
                "out_proj": L.linear_init(next(keys), d, d, dtype=dtype),
            },
            "layer_norm2": L.layer_norm_init(d, dtype),
            "mlp": {
                "fc1": L.linear_init(next(keys), d, cfg.intermediate_size, dtype=dtype),
                "fc2": L.linear_init(next(keys), cfg.intermediate_size, d, dtype=dtype),
            },
        }
        p["encoder"]["layers"].append(layer)
    return p


def clip_text_apply(params: Params, cfg: CLIPTextConfig, input_ids: jnp.ndarray) -> jnp.ndarray:
    """[B, L] token ids -> last_hidden_state [B, L, D]."""
    b, l = input_ids.shape
    tok = params["embeddings"]["token_embedding"]["embedding"][input_ids]
    pos = params["embeddings"]["position_embedding"]["embedding"][:l]
    x = tok + pos[None]

    heads = cfg.num_attention_heads
    head_dim = cfg.hidden_size // heads
    scale = head_dim**-0.5
    causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)

    act = _act(cfg.hidden_act)
    for layer in params["encoder"]["layers"]:
        h = L.layer_norm(layer["layer_norm1"], x, eps=cfg.layer_norm_eps)
        a = layer["self_attn"]
        q = L.linear(a["q_proj"], h).reshape(b, l, heads, head_dim)
        k = L.linear(a["k_proj"], h).reshape(b, l, heads, head_dim)
        v = L.linear(a["v_proj"], h).reshape(b, l, heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        probs = jax.nn.softmax(logits + causal, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, cfg.hidden_size)
        x = x + L.linear(a["out_proj"], out)

        h = L.layer_norm(layer["layer_norm2"], x, eps=cfg.layer_norm_eps)
        h = L.linear(layer["mlp"]["fc1"], h)
        h = act(h)
        x = x + L.linear(layer["mlp"]["fc2"], h)

    return L.layer_norm(params["final_layer_norm"], x, eps=cfg.layer_norm_eps)


class CLIPTextModel:
    def __init__(self, config: CLIPTextConfig = CLIPTextConfig()):
        self.config = config

    def init(self, key, dtype=jnp.float32) -> Params:
        return init_clip_text(key, self.config, dtype)

    def apply(self, params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
        return clip_text_apply(params, self.config, input_ids)
