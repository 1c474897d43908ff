"""Attention dispatch: Pallas flash kernel on TPU, fused XLA path elsewhere.

This is the TPU-native replacement for the reference's only native-kernel
dependency — xformers ``memory_efficient_attention``
(/root/reference/diffusers/src/diffusers/models/attention_processor.py:
2036-2038) and torch ``F.scaled_dot_product_attention`` (:2250-2252).

The RollingDepth cross-frame self-attention runs over ``n*hw`` tokens per
snippet (rearrange ``(b n) hw c -> b (n hw) c`` before QKV,
attention_processor.py:1989-2002); in this framework the snippet axis is
native, so callers simply pass ``[B, L, H, D]`` with ``L = n*hw``.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


# ---- no_max kernel safety gate -------------------------------------------
# The max-free flash kernel (_flash_kernel_packed_nomax) requires bounded
# log2-domain scores (|q.k|*scale*log2e < ~120, else exp2 overflows fp32).
# GroupNorm-scaled SD checkpoints satisfy this with a ~5x margin, but a
# checkpoint with pathological attention-projection scales would fail
# SILENTLY — so loaders calibrate the bound on real weights at load time
# (ops/score_probe.py) and flip this gate; the dispatch below then routes to
# the safe online-softmax (running max) kernel instead.  Trace-time constant:
# backend_tag() folds it in so pipeline program caches retrace on a flip.
_NOMAX_ALLOWED = True
NOMAX_SCORE_LIMIT = 96.0  # log2 units; fp32 exp2 overflows at 128

LOG2E = 1.4426950408889634

# When set (a list), eager dot_product_attention calls append their exact
# log2-domain |score| max — the recording mechanism of the load-time probe
# (only concrete values record; traced calls are unaffected).
_SCORE_RECORDER: Optional[list] = None


def set_nomax_allowed(ok: bool) -> None:
    global _NOMAX_ALLOWED
    _NOMAX_ALLOWED = bool(ok)


def nomax_allowed() -> bool:
    return _NOMAX_ALLOWED


def backend_tag() -> str:
    """Current ``ROLLINGDEPTH_ATTN`` override (a trace-time input): pipelines
    mix this into their program cache keys so flipping the env var
    mid-process retraces instead of silently reusing programs compiled with
    the previous backend.  The no_max safety gate is folded in for the same
    reason."""
    env = os.environ.get("ROLLINGDEPTH_ATTN", "auto").lower()
    return env if _NOMAX_ALLOWED else env + "+safemax"


def _xla_attention(
    q: jnp.ndarray,  # [B, L_q, H, D]
    k: jnp.ndarray,  # [B, L_k, H, D]
    v: jnp.ndarray,  # [B, L_k, H, D]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention; XLA fuses this well on CPU and is the fallback
    for shapes the flash kernel does not cover."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    # fp32 softmax for numerical parity with the fp16/bf16 torch kernels
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def _chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 2048,
) -> jnp.ndarray:
    """Query-blocked attention: bounds the live score matrix to
    [block_q, L_k] so long snippet sequences fit host/device memory when the
    Pallas kernel is unavailable (non-TPU backends)."""
    b, l_q, h, d = q.shape
    pad = (-l_q) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qb = q.reshape(b, -1, block_q, h, d).transpose(1, 0, 2, 3, 4)
    out = jax.lax.map(lambda qc: _xla_attention(qc, k, v, scale), qb)
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, -1, h, d)
    return out[:, :l_q]


@functools.partial(jax.named_call, name="dot_product_attention")
def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention over ``[B, L, H, D]`` tensors.

    ``use_flash=None`` auto-selects: Pallas flash kernel when running on TPU
    and the shape is worth tiling, else the XLA einsum path.  The
    ``ROLLINGDEPTH_ATTN`` env var overrides the auto choice globally
    (``xla`` or ``flash``) — the debug/fallback analogue of toggling
    xformers on the reference (run_video.py passes no such flag; diffusers
    exposes enable_xformers_memory_efficient_attention).
    """
    if _SCORE_RECORDER is not None and not isinstance(q, jax.core.Tracer):
        # load-time calibration (ops/score_probe.py): eager call with
        # concrete values — record the exact log2-domain |score| max the
        # no_max kernel would see, and answer via the reference path
        d = q.shape[-1]
        sc = (d**-0.5 if scale is None else scale) * LOG2E
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        _SCORE_RECORDER.append(float(jnp.max(jnp.abs(logits)) * sc))
        return _xla_attention(q, k, v, scale=scale)
    if use_flash is None:
        env = os.environ.get("ROLLINGDEPTH_ATTN", "auto").lower()
        if env == "xla":
            use_flash = False
        elif env == "flash":
            use_flash = True
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[1] >= 256
            and k.shape[1] >= 256
            # head-dim window: the kernel tiles [block, d] onto the MXU, so
            # d << 128 lanes runs at d/128 efficiency — at the degenerate
            # head dims of tiny test checkpoints (d=2..16) the XLA path is
            # strictly faster AND a d=2/L=345k Pallas launch faulted the v5e
            # worker (2026-08-19 relight-CLI verify); the kernel is
            # validated at d=40..160 (+ the d<=512 wide-head VAE tiling)
            and 32 <= q.shape[-1] <= 512
        )
    if use_flash:
        from .flash_attention import flash_attention

        # wide heads (VAE mid-block: single head, d=512) halve the tile so
        # q/k/v blocks + fp32 accumulator stay within the VMEM budget and
        # keep the safe online-softmax kernel; narrow heads (the UNet
        # snippet attention over GroupNorm-scaled activations — scores are
        # bounded orders of magnitude inside exp2's fp32 range) take the
        # MAX-FREE kernel at its measured-fastest tiling (58 vs 53 TF/s at
        # [2,15552,5,64]; see _flash_kernel_packed_nomax's safety contract
        # and scripts/bench_flash_variants.py)
        if q.shape[-1] > 256:
            return flash_attention(q, k, v, scale=scale, block_q=512, block_k=512)
        # no_max only while the load-time score calibration holds (see
        # set_nomax_allowed / ops/score_probe.py) — a checkpoint whose probed
        # score bound exceeds NOMAX_SCORE_LIMIT routes to the max kernel
        return flash_attention(
            q, k, v, scale=scale, block_q=512, block_k=4096,
            no_max=_NOMAX_ALLOWED,
        )
    # bound memory for long sequences on the non-flash path
    if q.shape[1] * k.shape[1] > 8_388_608 and q.shape[1] > 4096:
        return _chunked_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale=scale)
