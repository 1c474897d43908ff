"""AutoencoderKL (SD VAE) — functional NHWC implementation.

Behavioral reference: vendored diffusers
(/root/reference/diffusers/src/diffusers/models/autoencoders/
autoencoder_kl.py, vae.py:47-320).  The pipelines bypass ``encode``/``decode``
wrappers and use the pieces directly — encoder + quant_conv + mean-chunk on
encode, post_quant_conv + decoder on decode
(/root/reference/rollingdepth/rollingdepth_pipeline.py:690-692, 731-732) —
so those pieces are the public surface here too.

TPU-first: NHWC layout, fp32 GroupNorm, one jitted function per direction,
frame micro-batching handled by the caller with ``lax.map`` (static chunk
shapes) instead of a Python loop over ``max_vae_bs`` slices.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    mid_block_add_attention: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "VAEConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in known}
        return cls(**d)

    @classmethod
    def tiny(cls) -> "VAEConfig":
        """Diffusers-test-style tiny config for fast unit tests."""
        return cls(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _mid_block_init(key, ch: int, cfg: VAEConfig, dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "resnets": [
            L.resnet_block_init(k1, ch, ch, None, dtype),
            L.resnet_block_init(k2, ch, ch, None, dtype),
        ]
    }
    if cfg.mid_block_add_attention:
        # single-head spatial attention with qkv bias + group norm
        # (vae mid block: UNetMidBlock2D -> Attention with
        #  _from_deprecated_attn_block=True, heads=1, bias=True)
        p["attentions"] = [
            L.attention_init(
                k3, ch, heads=1, dim_head=ch, qkv_bias=True,
                norm_groups=cfg.norm_num_groups, dtype=dtype,
            )
        ]
    return p


def _mid_block_apply(p: Params, x: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    g = cfg.norm_num_groups
    x = L.resnet_block(p["resnets"][0], x, num_groups=g, eps=1e-6)
    if "attentions" in p:
        attn = p["attentions"][0]
        n, h, w, c = x.shape
        residual = x
        hs = L.group_norm(attn["group_norm"], x, g, eps=1e-6)
        hs = hs.reshape(n, h * w, c)
        # auto-dispatch: Pallas flash kernel on TPU (single head, d=512 at
        # 768p decode — the dense path materializes a [bs, hw, hw] fp32
        # logits tensor inside the hottest phase), XLA path elsewhere
        hs = L.attention(attn, hs, heads=1, use_flash=None)
        x = residual + hs.reshape(n, h, w, c)
    x = L.resnet_block(p["resnets"][1], x, num_groups=g, eps=1e-6)
    return x


def init_vae(key, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    bo = cfg.block_out_channels
    enc: Params = {"conv_in": L.conv2d_init(next(keys), cfg.in_channels, bo[0], 3, dtype=dtype)}
    down_blocks = []
    out_ch = bo[0]
    for i in range(len(bo)):
        in_ch, out_ch = out_ch, bo[i]
        block: Params = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                L.resnet_block_init(next(keys), in_ch if j == 0 else out_ch, out_ch, None, dtype)
            )
        if i != len(bo) - 1:
            block["downsamplers"] = [{"conv": L.conv2d_init(next(keys), out_ch, out_ch, 3, dtype=dtype)}]
        down_blocks.append(block)
    enc["down_blocks"] = down_blocks
    enc["mid_block"] = _mid_block_init(next(keys), bo[-1], cfg, dtype)
    enc["conv_norm_out"] = L.group_norm_init(bo[-1], dtype)
    enc["conv_out"] = L.conv2d_init(next(keys), bo[-1], 2 * cfg.latent_channels, 3, dtype=dtype)

    dec: Params = {"conv_in": L.conv2d_init(next(keys), cfg.latent_channels, bo[-1], 3, dtype=dtype)}
    dec["mid_block"] = _mid_block_init(next(keys), bo[-1], cfg, dtype)
    up_blocks = []
    rev = list(reversed(bo))
    out_ch = rev[0]
    for i in range(len(rev)):
        in_ch, out_ch = out_ch, rev[i]
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(
                L.resnet_block_init(next(keys), in_ch if j == 0 else out_ch, out_ch, None, dtype)
            )
        if i != len(rev) - 1:
            block["upsamplers"] = [{"conv": L.conv2d_init(next(keys), out_ch, out_ch, 3, dtype=dtype)}]
        up_blocks.append(block)
    dec["up_blocks"] = up_blocks
    dec["conv_norm_out"] = L.group_norm_init(bo[0], dtype)
    dec["conv_out"] = L.conv2d_init(next(keys), bo[0], cfg.out_channels, 3, dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": L.conv2d_init(next(keys), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, dtype=dtype),
        "post_quant_conv": L.conv2d_init(next(keys), cfg.latent_channels, cfg.latent_channels, 1, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def encoder_apply(p: Params, x: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """vae.py Encoder.forward: [N,H,W,3] -> [N,h,w,2*latent] moments."""
    g = cfg.norm_num_groups
    h = L.conv2d(p["conv_in"], x, padding=1)
    for i, block in enumerate(p["down_blocks"]):
        for r in block["resnets"]:
            h = L.resnet_block(r, h, num_groups=g, eps=1e-6)
        if "downsamplers" in block:
            h = L.downsample_conv(block["downsamplers"][0]["conv"], h, asymmetric_pad=True)
    h = _mid_block_apply(p["mid_block"], h, cfg)
    h = L.group_norm(p["conv_norm_out"], h, g, eps=1e-6)
    h = L.silu(h)
    return L.conv2d(p["conv_out"], h, padding=1)


def decoder_apply(p: Params, z: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """vae.py Decoder.forward: [N,h,w,latent] -> [N,H,W,3]."""
    g = cfg.norm_num_groups
    h = L.conv2d(p["conv_in"], z, padding=1)
    h = _mid_block_apply(p["mid_block"], h, cfg)
    for block in p["up_blocks"]:
        for r in block["resnets"]:
            h = L.resnet_block(r, h, num_groups=g, eps=1e-6)
        if "upsamplers" in block:
            h = L.upsample_nearest_conv(block["upsamplers"][0]["conv"], h)
    h = L.group_norm(p["conv_norm_out"], h, g, eps=1e-6)
    h = L.silu(h)
    return L.conv2d(p["conv_out"], h, padding=1)


class AutoencoderKL:
    """Thin stateless wrapper bundling config + pure functions."""

    def __init__(self, config: VAEConfig = VAEConfig()):
        self.config = config

    def init(self, key, dtype=jnp.float32) -> Params:
        return init_vae(key, self.config, dtype)

    def encode_moments(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = encoder_apply(params["encoder"], x, self.config)
        return L.conv2d(params["quant_conv"], h, padding=0)

    def encode_mean(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic latent: mean of the posterior, scaled.

        Matches the pipeline's piecewise encode — encoder, quant_conv, chunk
        and keep the mean, then * scaling_factor
        (/root/reference/rollingdepth/rollingdepth_pipeline.py:688-699)."""
        moments = self.encode_moments(params, x)
        mean, _logvar = jnp.split(moments, 2, axis=-1)
        return mean * self.config.scaling_factor

    def decode(self, params: Params, z: jnp.ndarray) -> jnp.ndarray:
        """Pipeline's piecewise decode: / scaling_factor, post_quant_conv,
        decoder (/root/reference/rollingdepth/rollingdepth_pipeline.py:716-733)."""
        z = z / self.config.scaling_factor
        z = L.conv2d(params["post_quant_conv"], z, padding=0)
        return decoder_apply(params["decoder"], z, self.config)
