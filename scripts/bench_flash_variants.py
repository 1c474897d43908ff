#!/usr/bin/env python
"""Microbench: flash-attention kernel variants at the UNet production shape.

Variants:
  base   - in-tree kernel (exp, running max)
  exp2   - log2-domain softmax: fold log2(e) into scale, use exp2 for p and
           the correction factor (exp is mul+exp2 on the VPU; this drops the
           per-element multiply)
Block-size sweep for each.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rollingdepth_tpu.ops.flash_attention import _flash_attention_impl, _pad_to

NEG_INF = -1e30


def _kernel_exp2(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, l_k, block_k):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # scale already includes log2(e); s is in log2 domain

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


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_exp2(q, k, v, block_q=1024, block_k=1024):
    b, l_q, h, d = q.shape
    l_k = k.shape[1]
    scale = (d ** -0.5) * 1.4426950408889634  # fold log2(e)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf = _pad_to(fold(q), 1, block_q)
    kf = _pad_to(fold(k), 1, block_k)
    vf = _pad_to(fold(v), 1, block_k)
    lq_pad, lk_pad = qf.shape[1], kf.shape[1]

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel_exp2, scale=scale, l_k=l_k, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qf, kf, vf)
    return out[:, :l_q, :].reshape(b, h, l_q, d).transpose(0, 2, 1, 3)


def _kernel_fused(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, scale, l_k, block_k, subs):
    """exp2 softmax + sum folded into the PV matmul (ones column appended to
    v: row-sum rides the wasted N<128 MXU lanes) + ``subs`` k-sub-blocks per
    body to give the scheduler independent MXU work to overlap with the VPU
    softmax."""
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    d = q.shape[-1]
    sub = block_k // subs
    ss = []
    for j in range(subs):
        k = k_ref[0, j * sub : (j + 1) * sub]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        if l_k % block_k != 0:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ik * block_k + j * sub
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


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "subs"))
def flash_fused(q, k, v, block_q=1024, block_k=1024, subs=1):
    b, l_q, h, d = q.shape
    l_k = k.shape[1]
    scale = (d ** -0.5) * 1.4426950408889634

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf = _pad_to(fold(q), 1, block_q)
    kf = _pad_to(fold(k), 1, block_k)
    vf = _pad_to(fold(v), 1, block_k)
    lq_pad, lk_pad = qf.shape[1], kf.shape[1]

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel_fused, scale=scale, l_k=l_k, block_k=block_k, subs=subs
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc: [.., :d] out, [.., d] = l
        ],
    )(qf, kf, vf)
    return out[:, :l_q, :].reshape(b, h, l_q, d).transpose(0, 2, 1, 3)


def _kernel_bf16(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *, scale, l_k, block_k, subs, d):
    """Like fused, but scores stay bf16 through max/sub/exp2 (halves VPU
    element traffic). Running max/normalizer/acc stay fp32."""
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
        ).astype(jnp.bfloat16)  # q is pre-scaled outside the kernel
        if l_k % block_k != 0:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ik * block_k + j * sub
            )
            s = jnp.where(col < l_k, s, jnp.bfloat16(-3e38))
        ss.append(s)

    m_prev = m_ref[:, :1]
    m_new = m_prev
    for s in ss:
        m_new = jnp.maximum(
            m_new, jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
        )
    corr = jnp.exp2(m_prev - m_new)
    m_ref[:, :1] = m_new

    acc = acc_ref[:] * corr
    m16 = m_new.astype(jnp.bfloat16)
    for j, s in enumerate(ss):
        p = jnp.exp2(s - m16)
        v = v_ref[0, j * sub : (j + 1) * sub]
        ones = jnp.ones((sub, 128 - d), v.dtype)
        vv = jnp.concatenate([v, ones], axis=1)
        acc = acc + jax.lax.dot_general(
            p, vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(ik == n_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / acc_ref[:, d : d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "subs"))
def flash_bf16(q, k, v, block_q=1024, block_k=2048, subs=2):
    b, l_q, h, d = q.shape
    l_k = k.shape[1]
    scale = (d ** -0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # prescale: drops a [BQ,BK] mul

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf = _pad_to(fold(q), 1, block_q)
    kf = _pad_to(fold(k), 1, block_k)
    vf = _pad_to(fold(v), 1, block_k)
    lq_pad, lk_pad = qf.shape[1], kf.shape[1]

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel_bf16, scale=scale, l_k=l_k, block_k=block_k, subs=subs, d=d
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )(qf, kf, vf)
    return out[:, :l_q, :].reshape(b, h, l_q, d).transpose(0, 2, 1, 3)


def _kernel_nomax(q_ref, k_ref, v_ref, o_ref, acc_ref, *, scale, l_k, block_k, subs, d, bf16_exp=False):
    """NO running max: p = exp2(s) directly (1 VPU op per score instead of
    3 — no max reduce, no subtract, no acc rescale).  Safe when |s| stays
    well under the fp32 exp2 range (|q.k|*scale < 127): GroupNorm-bounded
    UNet activations give |s| ~ 15 at d=64.  Underflow flushes tiny
    probabilities to zero — mathematically a no-op after normalization."""
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
        s = s * scale
        if l_k % block_k != 0:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ik * block_k + j * sub
            )
            s = jnp.where(col < l_k, s, NEG_INF)
        if bf16_exp:
            p = jnp.exp2(s.astype(jnp.bfloat16))
        else:
            p = jnp.exp2(s).astype(v_ref.dtype)
        v = v_ref[0, j * sub : (j + 1) * sub]
        ones = jnp.ones((sub, 128 - d), v.dtype)
        vv = jnp.concatenate([v, ones], axis=1)
        acc = acc + jax.lax.dot_general(
            p, vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(ik == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / acc_ref[:, d : d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "subs", "bf16_exp"))
def flash_nomax(q, k, v, block_q=1024, block_k=1024, subs=1, bf16_exp=False):
    b, l_q, h, d = q.shape
    l_k = k.shape[1]
    scale = (d ** -0.5) * 1.4426950408889634

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf = _pad_to(fold(q), 1, block_q)
    kf = _pad_to(fold(k), 1, block_k)
    vf = _pad_to(fold(v), 1, block_k)
    lq_pad, lk_pad = qf.shape[1], kf.shape[1]

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _kernel_nomax, scale=scale, l_k=l_k, block_k=block_k, subs=subs, d=d,
            bf16_exp=bf16_exp,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc[:, :d] out, [:, d] sum
        ],
    )(qf, kf, vf)
    return out[:, :l_q, :].reshape(b, h, l_q, d).transpose(0, 2, 1, 3)


def _kernel_nomask(q_ref, k_ref, v_ref, o_ref, acc_ref, *, block_k, subs, d):
    """Minimal-VPU kernel: q pre-scaled OUTSIDE (kills the s*scale mul), no
    masking (padded V rows and the appended normalizer column are ZERO, so
    padded keys contribute exactly 0 to numerator and normalizer), no
    running max (exp2-safe score bound).  Per-score VPU work: exp2 + cast."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # already scaled by log2(e)/sqrt(d)
    sub = block_k // subs
    acc = acc_ref[:]
    for j in range(subs):
        k = k_ref[0, j * sub : (j + 1) * sub]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(s).astype(v_ref.dtype)
        vv = v_ref[0, j * sub : (j + 1) * sub]  # [sub, 128]: v | zeros-pad tail
        acc = acc + jax.lax.dot_general(
            p, vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(ik == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / acc_ref[:, d : d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "subs"))
def flash_nomask(q, k, v, block_q=1024, block_k=1024, subs=1):
    b, l_q, h, d = q.shape
    l_k = k.shape[1]
    scale = (d ** -0.5) * 1.4426950408889634
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)  # fold scale into q

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf = _pad_to(fold(q), 1, block_q)
    kf = _pad_to(fold(k), 1, block_k)
    vf = _pad_to(fold(v), 1, block_k)
    lq_pad, lk_pad = qf.shape[1], kf.shape[1]
    # [bh, lk_pad, 128]: v columns, then the normalizer column (1 for real
    # keys, 0 for padding) and zero filler — padded keys contribute 0 to
    # both the PV numerator and the row sum, so no score masking is needed
    valid = (jnp.arange(lk_pad) < l_k).astype(v.dtype)[None, :, None]
    tail = jnp.concatenate(
        [jnp.broadcast_to(valid, (b * h, lk_pad, 1)),
         jnp.zeros((b * h, lk_pad, 128 - d - 1), v.dtype)], axis=2,
    )
    vf = jnp.concatenate([vf * valid, tail], axis=2)  # [bh, lk_pad, 128]

    grid = (b * h, lq_pad // block_q, lk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel_nomask, block_k=block_k, subs=subs, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, 128), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc[:, :d] out, [:, d] sum
        ],
    )(qf, kf, vf)
    return out[:, :l_q, :].reshape(b, h, l_q, d).transpose(0, 2, 1, 3)


def _sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    b, l, h, d = 2, 15552, 5, 64
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, l, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, l, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, l, h, d), jnp.bfloat16)
    flops = 4 * b * h * l * l * d

    ref = np.asarray(
        jax.jit(
            lambda q, k, v: flash_fused(q, k, v, 1024, 2048, 2)
        )(q, k, v),
        np.float32,
    )
    # round-3 sweep: no-running-max kernel (1 VPU op/score instead of 3),
    # deeper sub-block interleave, tile geometry
    for bq, bk in [(512, 4096), (1024, 2048), (512, 2048), (1024, 1024)]:
        for name, fn in [
            ("nomask/1", lambda q, k, v: flash_nomask(q, k, v, bq, bk, 1)),
            ("nomask/2", lambda q, k, v: flash_nomask(q, k, v, bq, bk, 2)),
        ]:
            try:
                out = fn(q, k, v)
                o = np.asarray(out, np.float32)
                if ref is None:
                    ref = o
                err = np.abs(o - ref).max()
                dt = timeit(fn, q, k, v)
                print(f"{name} bq={bq} bk={bk}: {dt*1e3:6.1f} ms  "
                      f"{flops/dt/1e12:5.1f} TF/s  err {err:.2e}", flush=True)
            except Exception as e:
                print(f"{name} bq={bq} bk={bk}: FAIL {type(e).__name__} {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
