"""UNet2DCondition with a native snippet axis — functional NHWC implementation.

Behavioral reference: vendored diffusers fork
(/root/reference/diffusers/src/diffusers/models/unets/unet_2d_condition.py
:1039-1324, unet_2d_blocks.py, transformers/transformer_2d.py,
attention.py), including the fork's RollingDepth modification — the
``num_view`` argument threaded to every attention processor so self-attention
runs jointly over all snippet frames
(attention_processor.py:1989-2050, "Modified in RollingDepth").

TPU-first design: instead of threading a ``num_view`` integer through every
layer and rearranging inside attention processors, the snippet axis is part
of the input shape ``[S, n, h, w, C]``.  Convolutions run on the folded
``(S*n)`` batch; every transformer block reshapes (for free — it is a view)
to ``[S, n*hw, C]`` so self-attention is *natively* cross-frame and runs in
the Pallas flash kernel.  Cross-attention to the text embedding is
mathematically identical over ``n*hw`` tokens, so the whole block stays in
the joint layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 96
    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    # number of attention heads per level (diffusers' misnamed
    # `attention_head_dim`; head dim = channels // heads)
    attention_head_dim: Union[int, Tuple[int, ...]] = (5, 10, 20, 20)
    norm_num_groups: int = 32
    use_linear_projection: bool = True
    flip_sin_to_cos: bool = True
    freq_shift: int = 0

    @classmethod
    def from_dict(cls, d: dict) -> "UNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items() if k in known}
        return cls(**d)

    @classmethod
    def sd21(cls, in_channels: int = 8) -> "UNetConfig":
        """SD2-based rollingdepth-v1-0 shape (8-ch input: rgb+depth latents)."""
        return cls(in_channels=in_channels)

    @classmethod
    def sd15(cls, in_channels: int = 4) -> "UNetConfig":
        """SD1.5 shape (RealisticVision / IC-Light relighting family)."""
        return cls(
            in_channels=in_channels,
            cross_attention_dim=768,
            attention_head_dim=8,
            use_linear_projection=False,
        )

    @classmethod
    def tiny(cls, in_channels: int = 8) -> "UNetConfig":
        return cls(
            sample_size=8,
            in_channels=in_channels,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            block_out_channels=(8, 16),
            layers_per_block=1,
            cross_attention_dim=8,
            attention_head_dim=2,
            norm_num_groups=4,
            use_linear_projection=True,
        )

    def heads_at(self, level: int) -> int:
        if isinstance(self.attention_head_dim, int):
            return self.attention_head_dim
        return self.attention_head_dim[level]


# ---------------------------------------------------------------------------
# Transformer2DModel (continuous) — norm, proj_in, blocks, proj_out, residual
# ---------------------------------------------------------------------------


def _transformer2d_init(key, cfg: UNetConfig, channels: int, heads: int, dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    dim_head = channels // heads
    p: Params = {
        "norm": L.group_norm_init(channels, dtype),
        "transformer_blocks": [
            L.transformer_block_init(k3, channels, heads, dim_head, cfg.cross_attention_dim, dtype)
        ],
    }
    if cfg.use_linear_projection:
        p["proj_in"] = L.linear_init(k1, channels, channels, dtype=dtype)
        p["proj_out"] = L.linear_init(k2, channels, channels, dtype=dtype)
    else:
        p["proj_in"] = L.conv2d_init(k1, channels, channels, 1, dtype=dtype)
        p["proj_out"] = L.conv2d_init(k2, channels, channels, 1, dtype=dtype)
    return p


def _transformer2d_apply(
    p: Params,
    x: jnp.ndarray,  # [(S n), h, w, C]
    context: jnp.ndarray,  # [S, L, D]
    snippet: int,
    cfg: UNetConfig,
    heads: int,
    use_flash: Optional[bool],
) -> jnp.ndarray:
    sn, h, w, c = x.shape
    s = sn // snippet
    residual = x
    hidden = L.group_norm(p["norm"], x, cfg.norm_num_groups, eps=1e-6)
    if cfg.use_linear_projection:
        hidden = hidden.reshape(s, snippet * h * w, c)  # joint snippet tokens
        hidden = L.linear(p["proj_in"], hidden)
    else:
        hidden = L.conv2d(p["proj_in"], hidden, padding=0)
        hidden = hidden.reshape(s, snippet * h * w, c)
    for block in p["transformer_blocks"]:
        hidden = L.transformer_block(block, hidden, context, heads, use_flash=use_flash)
    if cfg.use_linear_projection:
        hidden = L.linear(p["proj_out"], hidden)
        hidden = hidden.reshape(sn, h, w, c)
    else:
        hidden = hidden.reshape(sn, h, w, c)
        hidden = L.conv2d(p["proj_out"], hidden, padding=0)
    return hidden + residual


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 256))
    bo = cfg.block_out_channels
    temb_ch = bo[0] * 4

    p: Params = {
        "conv_in": L.conv2d_init(next(keys), cfg.in_channels, bo[0], 3, dtype=dtype),
        "time_embedding": {
            "linear_1": L.linear_init(next(keys), bo[0], temb_ch, dtype=dtype),
            "linear_2": L.linear_init(next(keys), temb_ch, temb_ch, dtype=dtype),
        },
    }

    down_blocks = []
    out_ch = bo[0]
    for i, block_type in enumerate(cfg.down_block_types):
        in_ch, out_ch = out_ch, bo[i]
        is_final = i == len(bo) - 1
        block: Params = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                L.resnet_block_init(next(keys), in_ch if j == 0 else out_ch, out_ch, temb_ch, dtype)
            )
            if block_type == "CrossAttnDownBlock2D":
                block["attentions"].append(
                    _transformer2d_init(next(keys), cfg, out_ch, cfg.heads_at(i), dtype)
                )
        if not is_final:
            block["downsamplers"] = [{"conv": L.conv2d_init(next(keys), out_ch, out_ch, 3, dtype=dtype)}]
        down_blocks.append(block)
    p["down_blocks"] = down_blocks

    mid_ch = bo[-1]
    p["mid_block"] = {
        "resnets": [
            L.resnet_block_init(next(keys), mid_ch, mid_ch, temb_ch, dtype),
            L.resnet_block_init(next(keys), mid_ch, mid_ch, temb_ch, dtype),
        ],
        "attentions": [_transformer2d_init(next(keys), cfg, mid_ch, cfg.heads_at(len(bo) - 1), dtype)],
    }

    up_blocks = []
    rev = list(reversed(bo))
    out_ch = rev[0]
    for i, block_type in enumerate(cfg.up_block_types):
        prev_out, out_ch = out_ch, rev[i]
        skip_ch = rev[min(i + 1, len(bo) - 1)]
        is_final = i == len(bo) - 1
        level = len(bo) - 1 - i
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            res_skip = skip_ch if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            block["resnets"].append(
                L.resnet_block_init(next(keys), res_in + res_skip, out_ch, temb_ch, dtype)
            )
            if block_type == "CrossAttnUpBlock2D":
                block["attentions"].append(
                    _transformer2d_init(next(keys), cfg, out_ch, cfg.heads_at(level), dtype)
                )
        if not is_final:
            block["upsamplers"] = [{"conv": L.conv2d_init(next(keys), out_ch, out_ch, 3, dtype=dtype)}]
        up_blocks.append(block)
    p["up_blocks"] = up_blocks

    p["conv_norm_out"] = L.group_norm_init(bo[0], dtype)
    p["conv_out"] = L.conv2d_init(next(keys), bo[0], cfg.out_channels, 3, dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def unet_apply(
    params: Params,
    cfg: UNetConfig,
    x: jnp.ndarray,  # [S, n, h, w, C_in]  — snippet axis native
    timesteps: jnp.ndarray,  # [S] or scalar
    context: jnp.ndarray,  # [S, L, D] or [1, L, D] text embedding
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Epsilon prediction per frame: returns [S, n, h, w, out_channels].

    Mirrors UNet2DConditionModel.forward (unet_2d_condition.py:1039-1324)
    with the RollingDepth cross-frame attention realized natively via the
    snippet axis (reference rearranges at attention_processor.py:1989-2002).
    """
    s, n, h, w, _ = x.shape
    bo = cfg.block_out_channels
    g = cfg.norm_num_groups

    timesteps = jnp.broadcast_to(jnp.asarray(timesteps), (s,))
    if context.shape[0] == 1 and s > 1:
        context = jnp.broadcast_to(context, (s,) + context.shape[1:])
    context = context.astype(x.dtype)

    # time embedding: identical for every frame of a snippet
    t_emb = L.timestep_embedding(timesteps, bo[0], cfg.flip_sin_to_cos, cfg.freq_shift)
    t_emb = t_emb.astype(x.dtype)
    temb = L.linear(params["time_embedding"]["linear_1"], t_emb)
    temb = L.silu(temb)
    temb = L.linear(params["time_embedding"]["linear_2"], temb)  # [S, 4*bo0]
    temb_frames = jnp.repeat(temb, n, axis=0)  # [(S n), 4*bo0]

    hidden = x.reshape(s * n, h, w, x.shape[-1])
    hidden = L.conv2d(params["conv_in"], hidden, padding=1)

    # ---- down path
    res_stack = [hidden]
    for i, block in enumerate(params["down_blocks"]):
        attns = block.get("attentions") or []
        for j, resnet in enumerate(block["resnets"]):
            hidden = L.resnet_block(resnet, hidden, temb_frames, num_groups=g, eps=1e-5)
            if attns:
                hidden = _transformer2d_apply(
                    attns[j], hidden, context, n, cfg, cfg.heads_at(i), use_flash
                )
            res_stack.append(hidden)
        if "downsamplers" in block:
            hidden = L.downsample_conv(block["downsamplers"][0]["conv"], hidden, asymmetric_pad=False)
            res_stack.append(hidden)

    # ---- mid
    mid = params["mid_block"]
    hidden = L.resnet_block(mid["resnets"][0], hidden, temb_frames, num_groups=g, eps=1e-5)
    hidden = _transformer2d_apply(
        mid["attentions"][0], hidden, context, n, cfg, cfg.heads_at(len(bo) - 1), use_flash
    )
    hidden = L.resnet_block(mid["resnets"][1], hidden, temb_frames, num_groups=g, eps=1e-5)

    # ---- up path
    for i, block in enumerate(params["up_blocks"]):
        attns = block.get("attentions") or []
        level = len(bo) - 1 - i
        for j, resnet in enumerate(block["resnets"]):
            skip = res_stack.pop()
            hidden = jnp.concatenate([hidden, skip], axis=-1)
            hidden = L.resnet_block(resnet, hidden, temb_frames, num_groups=g, eps=1e-5)
            if attns:
                hidden = _transformer2d_apply(
                    attns[j], hidden, context, n, cfg, cfg.heads_at(level), use_flash
                )
        if "upsamplers" in block:
            # match the next skip's spatial size (odd-dim latents;
            # unet_2d_condition.py forward_upsample_size)
            target = res_stack[-1].shape[1:3] if res_stack else None
            hidden = L.upsample_nearest_conv(block["upsamplers"][0]["conv"], hidden, target)

    hidden = L.group_norm(params["conv_norm_out"], hidden, g, eps=1e-5)
    hidden = L.silu(hidden)
    hidden = L.conv2d(params["conv_out"], hidden, padding=1)
    return hidden.reshape(s, n, h, w, cfg.out_channels)


class UNet2DCondition:
    """Stateless wrapper bundling config + pure functions."""

    def __init__(self, config: UNetConfig = UNetConfig()):
        self.config = config

    def init(self, key, dtype=jnp.float32) -> Params:
        return init_unet(key, self.config, dtype)

    def apply(self, params, x, timesteps, context, use_flash=None) -> jnp.ndarray:
        return unet_apply(params, self.config, x, timesteps, context, use_flash=use_flash)
