"""Functional NHWC building blocks for the SD model family.

Behavioral references (vendored diffusers fork):
- ResnetBlock2D: /root/reference/diffusers/src/diffusers/models/resnet.py:189-390
- Down/Upsample2D: models/downsampling.py, models/upsampling.py
- Attention: models/attention_processor.py (AttnProcessor2_0 math)
- BasicTransformerBlock/GEGLU: models/attention.py
- timestep embedding: models/embeddings.py:27-75

TPU-first design decisions:
- activations are NHWC (TPU conv layout), conv kernels HWIO
- params are plain nested dicts (pytrees); every module is an
  ``init(key, ...) -> params`` / ``apply(params, x, ...) -> y`` pair
- GroupNorm/LayerNorm/softmax compute in fp32 regardless of param dtype
- self-attention runs through ops.dot_product_attention (Pallas flash on TPU)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _uniform(key, shape, scale, dtype):
    # host-side numpy init (seeded from the JAX key): initializing ~10^3
    # parameters as separate device programs would mean ~10^3 tiny XLA
    # compiles — numpy keeps init instant and the first device transfer
    # happens in one batch at first use
    import numpy as np

    seed = np.asarray(jax.random.key_data(key)).ravel()
    rng = np.random.default_rng([int(s) for s in seed])
    arr = rng.uniform(-scale, scale, size=shape).astype(np.float32)
    return jnp.asarray(arr, dtype=dtype)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": _uniform(kw, (in_dim, out_dim), scale, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (out_dim,), scale, dtype)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:  # W8A8 serving mode (ops/quant.py)
        from ..ops.quant import quantize_activation

        xq, sx = quantize_activation(x)
        acc = jax.lax.dot_general(
            xq, p["kernel_q"],
            (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * (sx * p["w_scale"])).astype(x.dtype)
    else:
        y = jnp.dot(x, p["kernel"])
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv2d_init(
    key, in_ch: int, out_ch: int, kernel_size: int = 3, bias: bool = True, dtype=jnp.float32
) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_size * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    p = {"kernel": _uniform(kw, (kernel_size, kernel_size, in_ch, out_ch), scale, dtype)}
    if bias:
        p["bias"] = _uniform(kb, (out_ch,), scale, dtype)
    return p


def conv2d(
    p: Params,
    x: jnp.ndarray,  # [N, H, W, C]
    stride: int = 1,
    padding="SAME",
) -> jnp.ndarray:
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    if "kernel_q" in p:  # W8A8 serving mode (ops/quant.py)
        from ..ops.quant import quantize_activation

        xq, sx = quantize_activation(x)
        acc = jax.lax.conv_general_dilated(
            xq,
            p["kernel_q"],
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * (sx * p["w_scale"])).astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x,
            p["kernel"].astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def group_norm_init(channels: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(p: Params, x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over NHWC (groups are contiguous channel slices, torch order).

    Statistics always accumulate in fp32.  For fp32 inputs the whole op runs
    in fp32 (reference parity); for bf16 inputs the normalization itself
    stays bf16 — halving HBM traffic on the memory-bound norm, with fp32
    mean/variance so accuracy is preserved.
    """
    n = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    if x.dtype == jnp.float32:
        xf = x.reshape(n, -1, g, c // g)  # [N, HW, G, C/G]
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + eps)
        return xf.reshape(x.shape) * p["scale"] + p["bias"]
    xg = x.reshape(n, -1, g, c // g)
    mean32 = xg.mean(axis=(1, 3), keepdims=True, dtype=jnp.float32)
    diff = xg.astype(jnp.float32) - mean32
    var32 = (diff * diff).mean(axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var32 + eps)
    out = ((xg - mean32.astype(x.dtype)) * inv.astype(x.dtype)).reshape(x.shape)
    return out * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def layer_norm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def gelu_tanh_free(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.functional.gelu default (erf formulation)
    return jax.nn.gelu(x, approximate=False)


def timestep_embedding(
    timesteps: jnp.ndarray,  # [N] (may be fractional)
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding (embeddings.py:27-75); UNet2DCondition uses
    flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


# ---------------------------------------------------------------------------
# attention (diffusers `Attention` module semantics)
# ---------------------------------------------------------------------------


def attention_init(
    key,
    query_dim: int,
    heads: int,
    dim_head: int,
    cross_dim: Optional[int] = None,
    qkv_bias: bool = False,
    norm_groups: Optional[int] = None,
    dtype=jnp.float32,
) -> Params:
    inner = heads * dim_head
    kv_dim = cross_dim if cross_dim is not None else query_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p: Params = {
        "to_q": linear_init(k1, query_dim, inner, bias=qkv_bias, dtype=dtype),
        "to_k": linear_init(k2, kv_dim, inner, bias=qkv_bias, dtype=dtype),
        "to_v": linear_init(k3, kv_dim, inner, bias=qkv_bias, dtype=dtype),
        "to_out": linear_init(k4, inner, query_dim, bias=True, dtype=dtype),
    }
    if norm_groups is not None:
        p["group_norm"] = group_norm_init(query_dim, dtype)
    return p


def attention(
    p: Params,
    hidden_states: jnp.ndarray,  # [B, L, C]
    heads: int,
    encoder_hidden_states: Optional[jnp.ndarray] = None,  # [B, L_kv, D]
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Projection + multi-head attention + out-projection.

    Equivalent to AttnProcessor2_0.__call__ without the RollingDepth
    rearranges — the caller owns the (snippet) token layout.
    """
    context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
    b, lq, _ = hidden_states.shape
    q = linear(p["to_q"], hidden_states)
    k = linear(p["to_k"], context)
    v = linear(p["to_v"], context)
    inner = q.shape[-1]
    d = inner // heads
    q = q.reshape(b, lq, heads, d)
    k = k.reshape(b, context.shape[1], heads, d)
    v = v.reshape(b, context.shape[1], heads, d)
    out = dot_product_attention(q, k, v, use_flash=use_flash)
    out = out.reshape(b, lq, inner)
    return linear(p["to_out"], out)


# ---------------------------------------------------------------------------
# resnet block (ResnetBlock2D)
# ---------------------------------------------------------------------------


def resnet_block_init(
    key, in_ch: int, out_ch: int, temb_ch: Optional[int], dtype=jnp.float32
) -> Params:
    keys = jax.random.split(key, 4)
    p: Params = {
        "norm1": group_norm_init(in_ch, dtype),
        "conv1": conv2d_init(keys[0], in_ch, out_ch, 3, dtype=dtype),
        "norm2": group_norm_init(out_ch, dtype),
        "conv2": conv2d_init(keys[1], out_ch, out_ch, 3, dtype=dtype),
    }
    if temb_ch is not None:
        p["time_emb_proj"] = linear_init(keys[2], temb_ch, out_ch, dtype=dtype)
    if in_ch != out_ch:
        p["conv_shortcut"] = conv2d_init(keys[3], in_ch, out_ch, 1, dtype=dtype)
    return p


def resnet_block(
    p: Params,
    x: jnp.ndarray,  # [N, H, W, C_in]
    temb: Optional[jnp.ndarray] = None,  # [N, temb_ch]
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """resnet.py:330-390: norm-silu-conv ×2 with additive time bias."""
    h = group_norm(p["norm1"], x, num_groups, eps)
    h = silu(h)
    h = conv2d(p["conv1"], h, padding=1)
    if temb is not None and "time_emb_proj" in p:
        t = linear(p["time_emb_proj"], silu(temb))
        h = h + t[:, None, None, :].astype(h.dtype)
    h = group_norm(p["norm2"], h, num_groups, eps)
    h = silu(h)
    h = conv2d(p["conv2"], h, padding=1)
    skip = x
    if "conv_shortcut" in p:
        skip = conv2d(p["conv_shortcut"], x, padding=0)
    return skip + h


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


def downsample_conv(p: Params, x: jnp.ndarray, asymmetric_pad: bool) -> jnp.ndarray:
    """Downsample2D: stride-2 conv.  VAE encoder uses padding=0 with manual
    (0,1,0,1) pad (downsampling.py); UNet uses symmetric padding=1."""
    if asymmetric_pad:
        pad = [(0, 1), (0, 1)]
    else:
        pad = [(1, 1), (1, 1)]
    return conv2d(p, x, stride=2, padding=pad)


def _fold_upsample_kernel(w: jnp.ndarray):
    """Fold a nearest-2x upsample into the following 3x3 conv.

    For output parity a (row), conv3x3 over the duplicated rows reduces to a
    2-tap conv over the ORIGINAL rows: a=0 hits rows (i-1, i) with weights
    (w0, w1+w2); a=1 hits (i, i+1) with (w0+w1, w2) — and likewise for
    columns.  Exact algebraic rewrite: 4 MACs/output instead of 9, and the
    2x-resolution input tensor never materializes."""
    r0 = jnp.stack([w[0], w[1] + w[2]])  # [2, 3, Ci, Co]
    r1 = jnp.stack([w[0] + w[1], w[2]])
    out = {}
    for a, r in ((0, r0), (1, r1)):
        out[(a, 0)] = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)  # [2,2,Ci,Co]
        out[(a, 1)] = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
    return out


def upsample_nearest_conv(p: Params, x: jnp.ndarray, output_size=None) -> jnp.ndarray:
    """Upsample2D: nearest 2x (or to an explicit size, for odd skip shapes —
    diffusers' forward_upsample_size path) + conv3x3 (upsampling.py).

    The 2x path computes conv3x3(nearest_2x(x)) via four parity-decomposed
    2x2 convs on the original grid — mathematically identical (fp32-accum
    even slightly more accurate), 2.25x fewer MACs, and no 4x-size
    intermediate activation in HBM.  This upsample+conv stack is ~28% of the
    SD VAE decoder's FLOPs, the hottest block of the fast preset."""
    n, h, w, c = x.shape
    if "kernel_q" in p:
        # W8A8 correctness fallback: the parity-fold rewrite needs the fp
        # kernel, so materialize the nearest-2x input and run the
        # dispatching int8 conv.  This both re-creates the 4x intermediate
        # the fold exists to avoid AND (measured, scripts/bench_int8.py
        # 2026-08-18) runs on an XLA build where shallow int8 convs are
        # 3.2x SLOWER than bf16 — consistent with W8A8 being opt-in
        # (ops/quant.py); do not expect a speedup here
        if output_size is None:
            output_size = (2 * h, 2 * w)
        th, tw = output_size
        rows = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
        cols = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
        return conv2d(p, x[:, rows][:, :, cols], padding=1)
    if output_size is None or output_size == (2 * h, 2 * w):
        kernel = p["kernel"].astype(x.dtype)
        folded = _fold_upsample_kernel(kernel)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = {}
        for (a, b), k in folded.items():
            # output (2i+a, 2j+b) reads padded rows (i+a, i+a+1), cols likewise
            sl = xp[:, a : a + h + 1, b : b + w + 1, :]
            outs[(a, b)] = jax.lax.conv_general_dilated(
                sl, k, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # interleave parities: [2a, 2b, N, H, W, C] -> [N, 2H, 2W, C]
        y = jnp.stack([outs[(0, 0)], outs[(0, 1)], outs[(1, 0)], outs[(1, 1)]])
        y = y.reshape(2, 2, n, h, w, -1).transpose(2, 3, 0, 4, 1, 5)
        y = y.reshape(n, 2 * h, 2 * w, -1)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y
    th, tw = output_size
    # torch F.interpolate nearest: out[i] = in[floor(i * in/out)]
    rows = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    x = x[:, rows][:, :, cols]
    return conv2d(p, x, padding=1)


# ---------------------------------------------------------------------------
# transformer blocks (BasicTransformerBlock with GEGLU feed-forward)
# ---------------------------------------------------------------------------


def geglu_init(key, dim: int, inner_dim: int, dtype=jnp.float32) -> Params:
    # the value/gate projections are SEPARATE params (diffusers fuses them
    # into one [dim, 2*inner] GEGLU kernel split at the midpoint; the weight
    # converter splits it at load).  Keeping them separate makes each a plain
    # column-parallel matmul under tp sharding — the elementwise gating stays
    # shard-local instead of fighting the fused kernel's midpoint split.
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "proj_h": linear_init(k1, dim, inner_dim, dtype=dtype),
        "proj_gate": linear_init(k2, dim, inner_dim, dtype=dtype),
        "out": linear_init(k3, inner_dim, dim, dtype=dtype),
    }


def geglu_ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["proj_h"], x)
    gate = linear(p["proj_gate"], x)
    h = h * gelu_tanh_free(gate)
    return linear(p["out"], h)


def transformer_block_init(
    key, dim: int, heads: int, dim_head: int, cross_dim: int, dtype=jnp.float32
) -> Params:
    keys = jax.random.split(key, 3)
    return {
        "norm1": layer_norm_init(dim, dtype),
        "attn1": attention_init(keys[0], dim, heads, dim_head, dtype=dtype),
        "norm2": layer_norm_init(dim, dtype),
        "attn2": attention_init(keys[1], dim, heads, dim_head, cross_dim=cross_dim, dtype=dtype),
        "norm3": layer_norm_init(dim, dtype),
        "ff": geglu_init(keys[2], dim, dim * 4, dtype=dtype),
    }


def transformer_block(
    p: Params,
    x: jnp.ndarray,  # [B, L, C]  (L = n*hw: snippet-joint token axis)
    context: jnp.ndarray,  # [B, L_txt, D]
    heads: int,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """attention.py BasicTransformerBlock: self-attn -> cross-attn -> GEGLU FF.

    The RollingDepth cross-frame behavior (attention_processor.py:1989-2050)
    is realized by the caller passing L = n*hw — self-attention is then
    natively joint over all snippet frames.
    """
    h = layer_norm(p["norm1"], x)
    x = x + attention(p["attn1"], h, heads, use_flash=use_flash)
    h = layer_norm(p["norm2"], x)
    x = x + attention(p["attn2"], h, heads, encoder_hidden_states=context, use_flash=use_flash)
    h = layer_norm(p["norm3"], x)
    x = x + geglu_ff(p["ff"], h)
    return x
