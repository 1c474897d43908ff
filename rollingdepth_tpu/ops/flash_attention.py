"""Pallas TPU flash attention over the snippet token axis.

TPU-native replacement for xformers ``memory_efficient_attention``
(/root/reference/diffusers/src/diffusers/models/attention_processor.py:
2036-2038): one fused kernel computing softmax(q k^T / sqrt(d)) v with online
(streaming) softmax, so the ``[L_q, L_k]`` score matrix never hits HBM.  The
RollingDepth workload is bidirectional full attention with L = n*hw up to
~28k tokens and head_dim 64/160 — squarely flash-attention territory.

Kernel layout: grid (batch*heads, q_blocks, k_blocks) with the k axis
innermost; running max / normalizer / accumulator live in VMEM scratch and
persist across the k iterations (TPU grid execution is sequential
minor-to-major), initialized at k==0 and finalized at the last k block.

Softmax-cost engineering (measured on v5e at the production UNet shape
[2,15552,5,64]: 40 -> 55 TF/s):
- log2-domain softmax: ``log2(e)`` folds into the qk scale so probabilities
  are ``exp2(s - m)`` — drops the per-element multiply hidden inside
  ``exp`` (exp lowers to mul+exp2 on the VPU).
- for d < 128 the row-sum is folded into the PV matmul by appending
  all-ones columns to v: the sum rides the N<128 MXU lanes that a d=64
  head wastes anyway, eliminating a [BQ, BK] VPU reduction per step.
- ``subs`` k-sub-blocks per body give the scheduler independent qk matmuls
  to overlap with the previous sub-block's VPU softmax (the kernel is
  roughly half-MXU half-VPU bound at d=64: qk contracts only 64 lanes and
  pv writes only 64, so MXU peak is ~98 TF/s and the VPU exp stream is
  ~3 ms per 2.4e9 scores).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _flash_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, scale, l_k, block_k, subs, d
):
    """d < 128: ones-column sum fusion; acc[:, d] holds the normalizer."""
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    sub = block_k // subs
    ss = []
    for j in range(subs):
        k = k_ref[0, j * sub : (j + 1) * sub]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if scale != 1.0:  # scale is normally pre-folded into k (see impl)
            s = s * scale  # log2 domain: scale includes log2(e)
        if l_k % block_k != 0:
            # padded-key masking rides the PV ones-column instead of the
            # scores (see _ones_ext) EXCEPT that the running max must not be
            # dragged above the real scores' max by the padded s==0 columns
            # (exp2(s - m) would underflow real rows); mask s only here
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ik * block_k
                + j * sub
            )
            s = jnp.where(col < l_k, s, NEG_INF)
        ss.append(s)

    m_prev = m_ref[:, :1]
    m_new = m_prev
    for s in ss:
        m_new = jnp.maximum(m_new, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp2(m_prev - m_new)
    m_ref[:, :1] = m_new

    acc = acc_ref[:] * corr
    for j, s in enumerate(ss):
        p = jnp.exp2(s - m_new)
        v = v_ref[0, j * sub : (j + 1) * sub]
        ones = jnp.ones((sub, 128 - d), v.dtype)
        vv = jnp.concatenate([v, ones], axis=1)  # [sub, 128]
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(ik == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / acc_ref[:, d : d + 1]).astype(o_ref.dtype)


def _flash_kernel_packed_nomax(
    q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale, l_k, block_k, subs, d
):
    """d < 128, NO running max: p = exp2(s) directly.

    The online-softmax max/subtract/rescale stream is dropped entirely —
    measured on v5e this is the fastest reachable point for this op mix
    (~58 TF/s at [2,15552,5,64]; the kernel is then balanced between the
    qk+pv matmuls and the irreducible one-exp2-per-score VPU stream).

    SAFETY CONTRACT: requires |q.k| * scale < ~120 in the log2 domain so
    exp2 stays inside fp32 range.  GroupNorm-scaled transformer activations
    satisfy this by an order of magnitude (|s| ~ 15 at d=64); underflow
    flushes negligible probabilities to zero, which is exact after
    normalization.  Callers with unbounded inputs must use the default
    max-based kernels; the bench preamble asserts on-chip parity of this
    kernel at production shapes every run."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    sub = block_k // subs
    acc = acc_ref[:]
    for j in range(subs):
        k = k_ref[0, j * sub : (j + 1) * sub]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if scale != 1.0:  # scale is normally pre-folded into k (see impl)
            s = s * scale  # log2 domain
        p = jnp.exp2(s)
        v = v_ref[0, j * sub : (j + 1) * sub]
        # Ragged l_k is masked through the PV matmul, NOT the scores: padded
        # k rows are zeros, so their s == 0 and p == 1 exactly; with the v
        # rows zero-padded and the appended normalizer column zeroed for
        # those rows, they contribute exactly 0 to both the output and the
        # row sum.  This keeps the per-score VPU stream at exp2+cast —
        # the O(BQ*BK) iota/compare/select mask would otherwise run in
        # EVERY k iteration whenever l_k isn't a block multiple.
        if l_k % block_k != 0:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, (sub, 128 - d), 0)
                + ik * block_k
                + j * sub
            )
            ones = (row < l_k).astype(v.dtype)  # [sub, 128-d], O(BK) work
        else:
            ones = jnp.ones((sub, 128 - d), v.dtype)
        vv = jnp.concatenate([v, ones], axis=1)  # [sub, 128]
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(ik == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / acc_ref[:, d : d + 1]).astype(o_ref.dtype)


def _flash_kernel_wide(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, l_k, block_k
):
    """d >= 128 (VAE mid-block single head): explicit normalizer scratch."""
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:  # scale is normally pre-folded into k (see impl)
        s = s * scale  # log2 domain

    if l_k % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        s = jnp.where(col < l_k, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    corr = jnp.exp2(m_prev - m_new)

    l_ref[:, :1] = l_ref[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:, :1] = m_new
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * corr + pv

    @pl.when(ik == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret", "no_max")
)
def _flash_attention_impl(
    q: jnp.ndarray,  # [B, L_q, H, D]
    k: jnp.ndarray,  # [B, L_k, H, D]
    v: jnp.ndarray,  # [B, L_k, H, D]
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 2048,
    interpret: bool = False,
    no_max: bool = False,
) -> jnp.ndarray:
    b, l_q, h, d = q.shape
    l_k = k.shape[1]
    if scale is None:
        scale = d**-0.5
    scale = scale * LOG2E  # kernels run the softmax in the log2 domain
    # Blocks must stay tile-aligned.  Shrinking block_k all the way to a
    # ragged l_k (e.g. an odd 1025) both breaks the subs k-sub-slicing
    # (2*(block_k//2) = block_k-1 keys covered, and the l_k%block_k==0 mask
    # never fires to catch the drop) and hands Mosaic non-lane-aligned block
    # shapes.  Round the shrunk block up to a tile multiple instead; the L
    # padding plus the l_k mask absorb the overhang.
    block_q = min(block_q, _round_up(max(128, l_q), 128))
    block_k = min(block_k, _round_up(max(128, l_k), 256))
    subs = 2 if (d < 128 and block_k >= 1024 and block_k % 256 == 0) else 1

    # [B*H, L, D] layout, pad L to block multiples
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf = _pad_to(fold(q), 1, block_q)
    kf = _pad_to(fold(k), 1, block_k)
    vf = _pad_to(fold(v), 1, block_k)
    # Fold the softmax scale (incl. log2 e) into k BEFORE the kernel: one
    # O(L*d) fp32 multiply (fused by XLA into the pad/transpose) replaces an
    # O(L_q*L_k) per-score VPU multiply inside the kernel — the kernel's VPU
    # stream drops from mul+exp2+cast to exp2+cast per score.  Rounding
    # k*scale to bf16 carries the same relative error as bf16 k itself, so
    # accuracy is unchanged.  Measured speed-NEUTRAL at the production shape
    # [16,15552,5,64] (73.7 -> 73.8 TF/s): at grid 80 the VPU stream already
    # overlaps the matmuls fully — kept because it strictly reduces VPU
    # work and simplifies the kernels (doc/ROADMAP.md flash section).
    kf = (kf.astype(jnp.float32) * scale).astype(kf.dtype)
    scale = 1.0
    lq_pad, lk_pad = qf.shape[1], kf.shape[1]

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)
    if d < 128 and no_max:
        kernel = functools.partial(
            _flash_kernel_packed_nomax, scale=scale, l_k=l_k, block_k=block_k,
            subs=subs, d=d,
        )
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc[:, :d] out, [:, d] sum
        ]
    elif d < 128:
        kernel = functools.partial(
            _flash_kernel_packed, scale=scale, l_k=l_k, block_k=block_k,
            subs=subs, d=d,
        )
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (log2)
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc[:, :d] out, [:, d] sum
        ]
    else:
        kernel = functools.partial(
            _flash_kernel_wide, scale=scale, l_k=l_k, block_k=block_k
        )
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (log2)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :l_q, :].reshape(b, h, l_q, d).transpose(0, 2, 1, 3)
    return out


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


def _attention_remat_reference(q, k, v, scale, block_q):
    """Query-blocked reference attention, rematerialized per block.

    Mathematically the same function as the flash kernel; written so its XLA
    autodiff keeps only O(block_q * L_k) live — ``jax.checkpoint`` makes the
    reverse pass recompute per-block probabilities instead of storing them."""
    b, l_q, h, d = q.shape
    scale = d**-0.5 if scale is None else scale
    pad = (-l_q) % block_q
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q
    qb = qp.reshape(b, -1, block_q, h, d).transpose(1, 0, 2, 3, 4)

    @jax.checkpoint
    def one_block(qc):
        logits = jnp.einsum("bqhd,bkhd->bhqk", qc, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * scale, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)

    out = jax.lax.map(one_block, qb)
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, -1, h, d)
    return out[:, :l_q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_k: int = 2048,
    interpret: bool = False,
    no_max: bool = False,
) -> jnp.ndarray:
    """Flash attention with a memory-bounded backward pass.

    Forward: the Pallas online-softmax kernel (``no_max=True`` selects the
    max-free variant for bounded-score callers — see
    ``_flash_kernel_packed_nomax``).  Backward: VJP of the rematerialized
    blocked reference (same math), so ``jax.grad`` through the UNet works at
    training shapes without an O(L^2) residual (VERDICT r1: training at
    seq>=256 on TPU auto-selects flash)."""
    return _flash_attention_impl(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret, no_max=no_max,
    )


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret, no_max):
    out = _flash_attention_impl(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k,
        interpret=interpret, no_max=no_max,
    )
    return out, (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, no_max, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _attention_remat_reference(q, k, v, scale, block_q), q, k, v
    )
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
