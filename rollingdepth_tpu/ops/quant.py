"""W8A8 dynamic quantization for the UNet serving path.

The fast-preset wall is the UNet's convs+matmuls (BASELINE.md: whole-UNet
~112 TF/s bf16 with attention at its kernel ceiling).  TPU v5e advertises a
2x int8 MXU path (394 TOPS vs 197 bf16 TFLOP/s); when s8xs8->s32 convs/dots
lower to it (probed on-chip by scripts/bench_int8.py), a weight+activation
int8 mode roughly halves the UNet conv/projection time.

MEASURED on this environment's XLA build (2026-08-18, bench_int8.py):
the 2x path does NOT materialize — large s8 dots reach 1.39x bf16, deep
convs 1.08x, and shallow convs (where SD-UNet FLOPs concentrate) run 3.2x
SLOWER.  W8A8 is therefore net-negative here and remains strictly opt-in;
the implementation is kept (correctness-tested, tests/test_quant.py) for
toolchains that lower s8xs8->s32 convolutions natively.

Scheme (standard W8A8, chosen for zero calibration data — no real
checkpoints exist in this environment, and dynamic ranges make the mode
checkpoint-agnostic):

- weights: per-OUTPUT-CHANNEL symmetric int8, quantized once at load time
  (``quantize_unet_params``);
- activations: per-TENSOR symmetric int8 with a dynamic abs-max scale
  computed inside the program (one VPU reduce over an activation the conv
  reads anyway);
- accumulation in int32, dequantized in fp32, bias added, cast back to the
  activation dtype.

The quantized tensors ride the normal param pytree: ``layers.linear`` /
``layers.conv2d`` dispatch on the presence of ``kernel_q``, so no model code
changes and jit caches key naturally on the quantized pytree structure.

What gets quantized: resnet conv1/conv2/shortcut, down/upsampler convs,
transformer proj_in/out, attention q/k/v/out projections, GEGLU ff.  What
stays bf16: conv_in (12-ch conditioning reads), conv_out (epsilon head),
time embedding MLP (tiny), all norms, the attention kernel itself.

This is an opt-in serving mode (CLI ``--quantize w8a8``); the reference has
no quantized path, so there is no parity target — accuracy is bounded by
tests/test_quant.py against the bf16 UNet on tiny and SD-shaped configs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]

# symmetric int8 range; 127 (not 128) keeps the grid symmetric so
# -x quantizes to -q(x)
_QMAX = 127.0


def quantize_weight(kernel: jnp.ndarray, reduce_axes) -> tuple:
    """Per-output-channel symmetric int8: returns (q, scale[out_ch])."""
    k32 = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k32), axis=reduce_axes)
    scale = jnp.maximum(absmax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(k32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def quantize_linear_params(p: Params) -> Params:
    """[in, out] kernel -> int8 + per-out-column scale."""
    q, scale = quantize_weight(p["kernel"], reduce_axes=(0,))
    out: Params = {"kernel_q": q, "w_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_conv_params(p: Params) -> Params:
    """[kh, kw, ci, co] kernel -> int8 + per-co scale."""
    q, scale = quantize_weight(p["kernel"], reduce_axes=(0, 1, 2))
    out: Params = {"kernel_q": q, "w_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_activation(x: jnp.ndarray) -> tuple:
    """Dynamic per-tensor symmetric int8: returns (q, fp32 scalar scale)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(absmax, 1e-12) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return q.astype(jnp.int8), scale


def _quantize_attention(p: Params) -> Params:
    out = dict(p)
    for k in ("to_q", "to_k", "to_v", "to_out"):
        out[k] = quantize_linear_params(p[k])
    return out


def _quantize_transformer_block(p: Params) -> Params:
    out = dict(p)
    out["attn1"] = _quantize_attention(p["attn1"])
    out["attn2"] = _quantize_attention(p["attn2"])
    out["ff"] = {
        "proj_h": quantize_linear_params(p["ff"]["proj_h"]),
        "proj_gate": quantize_linear_params(p["ff"]["proj_gate"]),
        "out": quantize_linear_params(p["ff"]["out"]),
    }
    return out


def _quantize_transformer2d(p: Params) -> Params:
    out = dict(p)
    # proj_in/proj_out are linear ([in,out] kernel) for SD2's
    # use_linear_projection=True and 1x1 convs for SD1.5
    for k in ("proj_in", "proj_out"):
        if p[k]["kernel"].ndim == 2:
            out[k] = quantize_linear_params(p[k])
        else:
            out[k] = quantize_conv_params(p[k])
    out["transformer_blocks"] = [
        _quantize_transformer_block(b) for b in p["transformer_blocks"]
    ]
    return out


def _quantize_resnet(p: Params) -> Params:
    out = dict(p)
    out["conv1"] = quantize_conv_params(p["conv1"])
    out["conv2"] = quantize_conv_params(p["conv2"])
    if "conv_shortcut" in p:
        out["conv_shortcut"] = quantize_conv_params(p["conv_shortcut"])
    return out


def _quantize_updown_block(block: Params) -> Params:
    out = dict(block)
    out["resnets"] = [_quantize_resnet(r) for r in block["resnets"]]
    if block.get("attentions"):
        out["attentions"] = [_quantize_transformer2d(a) for a in block["attentions"]]
    if "downsamplers" in block:
        out["downsamplers"] = [
            {"conv": quantize_conv_params(d["conv"])} for d in block["downsamplers"]
        ]
    if "upsamplers" in block:
        out["upsamplers"] = [
            {"conv": quantize_conv_params(u["conv"])} for u in block["upsamplers"]
        ]
    return out


def quantize_unet_params(params: Params) -> Params:
    """One-time load transform: bf16/fp32 UNet pytree -> W8A8 pytree.

    conv_in, conv_out, and the time-embedding MLP stay in the original
    dtype (small FLOP share; input-conditioning and the epsilon head are
    the most quantization-sensitive layers).
    """
    out = dict(params)
    out["down_blocks"] = [_quantize_updown_block(b) for b in params["down_blocks"]]
    out["up_blocks"] = [_quantize_updown_block(b) for b in params["up_blocks"]]
    mid = dict(params["mid_block"])
    mid["resnets"] = [_quantize_resnet(r) for r in mid["resnets"]]
    mid["attentions"] = [_quantize_transformer2d(a) for a in mid["attentions"]]
    out["mid_block"] = mid
    return out
