"""BRIA RMBG-1.4 background matting (U²-Net) — functional NHWC JAX.

Behavioral reference: /root/reference/briarmbg.py — REBNCONV (:11-25),
_upsample_like (:28-30), RSU7/6/5/4 (:34-319, generic depth-N residual
U-blocks), RSU4F (dilated, no pooling), BriaRMBG (:350-462): 6-stage
encoder-decoder over a stride-2 conv_in, six sigmoid side outputs upsampled
to input resolution.  The relight pipeline consumes ``sigmoid(d1)`` as the
alpha matte (/root/reference/rollingdepth/rollingimg_pipeline.py:330-389).

Param naming mirrors the torch module tree so the generic state-dict
converter (io/weights.py) loads the released checkpoint directly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _rebnconv_init(key, in_ch: int, out_ch: int, dtype=jnp.float32) -> Params:
    return {
        "conv_s1": L.conv2d_init(key, in_ch, out_ch, 3, dtype=dtype),
        "bn_s1": {
            "scale": jnp.ones((out_ch,), dtype),
            "bias": jnp.zeros((out_ch,), dtype),
            "running_mean": jnp.zeros((out_ch,), dtype),
            "running_var": jnp.ones((out_ch,), dtype),
        },
    }


def _batch_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _rebnconv(p: Params, x: jnp.ndarray, dirate: int = 1, stride: int = 1) -> jnp.ndarray:
    """conv3x3(dilation=dirate, pad=dirate) + BN + ReLU (briarmbg.py:11-25)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["conv_s1"]["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(dirate, dirate), (dirate, dirate)],
        rhs_dilation=(dirate, dirate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["conv_s1"]["bias"].astype(y.dtype)
    return jax.nn.relu(_batch_norm(p["bn_s1"], y))


def _maxpool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(2, stride=2, ceil_mode=True)."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _upsample_like(src: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """F.interpolate(size=..., mode='bilinear', align_corners=False)."""
    n, h, w, c = src.shape
    th, tw = target_hw
    if (h, w) == (th, tw):
        return src
    return jax.image.resize(src, (n, th, tw, c), method="bilinear").astype(src.dtype)


# ---------------------------------------------------------------------------
# RSU blocks
# ---------------------------------------------------------------------------


def _rsu_init(key, depth: int, in_ch: int, mid_ch: int, out_ch: int, dtype=jnp.float32) -> Params:
    """Generic RSU-N (briarmbg.py RSU7/RSU6/RSU5/RSU4 share this shape)."""
    keys = iter(jax.random.split(key, 2 * depth + 2))
    p: Params = {"rebnconvin": _rebnconv_init(next(keys), in_ch, out_ch, dtype)}
    p["rebnconv1"] = _rebnconv_init(next(keys), out_ch, mid_ch, dtype)
    for i in range(2, depth):
        p[f"rebnconv{i}"] = _rebnconv_init(next(keys), mid_ch, mid_ch, dtype)
    p[f"rebnconv{depth}"] = _rebnconv_init(next(keys), mid_ch, mid_ch, dtype)  # dirate=2
    for i in range(depth - 1, 1, -1):
        p[f"rebnconv{i}d"] = _rebnconv_init(next(keys), mid_ch * 2, mid_ch, dtype)
    p["rebnconv1d"] = _rebnconv_init(next(keys), mid_ch * 2, out_ch, dtype)
    return p


def _rsu_apply(p: Params, x: jnp.ndarray, depth: int) -> jnp.ndarray:
    hxin = _rebnconv(p["rebnconvin"], x)
    encs: List[jnp.ndarray] = []
    hx = hxin
    for i in range(1, depth):
        hx = _rebnconv(p[f"rebnconv{i}"], hx)
        encs.append(hx)
        if i < depth - 1:
            hx = _maxpool_ceil(hx)
    hx_top = _rebnconv(p[f"rebnconv{depth}"], encs[-1], dirate=2)

    hxd = hx_top
    for i in range(depth - 1, 0, -1):
        enc = encs[i - 1]
        hxd = _rebnconv(p[f"rebnconv{i}d"], jnp.concatenate([hxd, enc], axis=-1))
        if i > 1:
            hxd = _upsample_like(hxd, encs[i - 2].shape[1:3])
    return hxd + hxin


def _rsu4f_init(key, in_ch: int, mid_ch: int, out_ch: int, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8))
    return {
        "rebnconvin": _rebnconv_init(next(keys), in_ch, out_ch, dtype),
        "rebnconv1": _rebnconv_init(next(keys), out_ch, mid_ch, dtype),
        "rebnconv2": _rebnconv_init(next(keys), mid_ch, mid_ch, dtype),
        "rebnconv3": _rebnconv_init(next(keys), mid_ch, mid_ch, dtype),
        "rebnconv4": _rebnconv_init(next(keys), mid_ch, mid_ch, dtype),
        "rebnconv3d": _rebnconv_init(next(keys), mid_ch * 2, mid_ch, dtype),
        "rebnconv2d": _rebnconv_init(next(keys), mid_ch * 2, mid_ch, dtype),
        "rebnconv1d": _rebnconv_init(next(keys), mid_ch * 2, out_ch, dtype),
    }


def _rsu4f_apply(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Dilated RSU (briarmbg.py RSU4F): dirates 1,2,4,8, no pooling."""
    hxin = _rebnconv(p["rebnconvin"], x)
    hx1 = _rebnconv(p["rebnconv1"], hxin, dirate=1)
    hx2 = _rebnconv(p["rebnconv2"], hx1, dirate=2)
    hx3 = _rebnconv(p["rebnconv3"], hx2, dirate=4)
    hx4 = _rebnconv(p["rebnconv4"], hx3, dirate=8)
    hx3d = _rebnconv(p["rebnconv3d"], jnp.concatenate([hx4, hx3], -1), dirate=4)
    hx2d = _rebnconv(p["rebnconv2d"], jnp.concatenate([hx3d, hx2], -1), dirate=2)
    hx1d = _rebnconv(p["rebnconv1d"], jnp.concatenate([hx2d, hx1], -1), dirate=1)
    return hx1d + hxin


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

_STAGES = [  # (name, kind/depth, in, mid, out) — briarmbg.py:354-380
    ("stage1", 7, 64, 32, 64),
    ("stage2", 6, 64, 32, 128),
    ("stage3", 5, 128, 64, 256),
    ("stage4", 4, 256, 128, 512),
    ("stage5", "4F", 512, 256, 512),
    ("stage6", "4F", 512, 256, 512),
]
_DSTAGES = [
    ("stage5d", "4F", 1024, 256, 512),
    ("stage4d", 4, 1024, 128, 256),
    ("stage3d", 5, 512, 64, 128),
    ("stage2d", 6, 256, 32, 64),
    ("stage1d", 7, 128, 16, 64),
]
_SIDE_CH = {"side1": 64, "side2": 64, "side3": 128, "side4": 256, "side5": 512, "side6": 512}


def init_rmbg(key, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 32))
    p: Params = {"conv_in": L.conv2d_init(next(keys), 3, 64, 3, dtype=dtype)}
    for name, kind, i, m, o in _STAGES + _DSTAGES:
        if kind == "4F":
            p[name] = _rsu4f_init(next(keys), i, m, o, dtype)
        else:
            p[name] = _rsu_init(next(keys), kind, i, m, o, dtype)
    for name, ch in _SIDE_CH.items():
        p[name] = L.conv2d_init(next(keys), ch, 1, 3, dtype=dtype)
    return p


def rmbg_apply(params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """[N, H, W, 3] -> six sigmoid side outputs [N, H, W, 1], finest first
    (briarmbg.py:391-462)."""
    in_hw = x.shape[1:3]

    def stage(name, h):
        _, kind, *_ = next(s for s in _STAGES + _DSTAGES if s[0] == name)
        return _rsu4f_apply(params[name], h) if kind == "4F" else _rsu_apply(params[name], h, kind)

    hxin = L.conv2d(params["conv_in"], x, stride=2, padding=1)
    hx1 = stage("stage1", hxin)
    hx2 = stage("stage2", _maxpool_ceil(hx1))
    hx3 = stage("stage3", _maxpool_ceil(hx2))
    hx4 = stage("stage4", _maxpool_ceil(hx3))
    hx5 = stage("stage5", _maxpool_ceil(hx4))
    hx6 = stage("stage6", _maxpool_ceil(hx5))

    hx6up = _upsample_like(hx6, hx5.shape[1:3])
    hx5d = stage("stage5d", jnp.concatenate([hx6up, hx5], -1))
    hx5dup = _upsample_like(hx5d, hx4.shape[1:3])
    hx4d = stage("stage4d", jnp.concatenate([hx5dup, hx4], -1))
    hx4dup = _upsample_like(hx4d, hx3.shape[1:3])
    hx3d = stage("stage3d", jnp.concatenate([hx4dup, hx3], -1))
    hx3dup = _upsample_like(hx3d, hx2.shape[1:3])
    hx2d = stage("stage2d", jnp.concatenate([hx3dup, hx2], -1))
    hx2dup = _upsample_like(hx2d, hx1.shape[1:3])
    hx1d = stage("stage1d", jnp.concatenate([hx2dup, hx1], -1))

    outs = []
    for name, feat in [("side1", hx1d), ("side2", hx2d), ("side3", hx3d),
                       ("side4", hx4d), ("side5", hx5d), ("side6", hx6)]:
        d = L.conv2d(params[name], feat, padding=1)
        outs.append(jax.nn.sigmoid(_upsample_like(d, in_hw).astype(jnp.float32)).astype(x.dtype))
    return outs


class BriaRMBG:
    def init(self, key, dtype=jnp.float32) -> Params:
        return init_rmbg(key, dtype)

    def apply(self, params: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
        return rmbg_apply(params, x)
