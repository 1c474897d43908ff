#!/usr/bin/env python
"""Probe: does this v5e stack lower int8 convs/matmuls to the MXU 2x path?

The fast-preset wall is the UNet's convs+matmuls (BASELINE.md: whole-UNet
~112 TF/s bf16, phase 3.7 s/clip).  v5e advertises 394 int8 TOPS vs 197
bf16 TFLOP/s; if s8 x s8 -> s32 convolutions/dots actually hit that path
through this XLA build, a W8A8 quantized serving mode is the one remaining
single-chip lever.  This probe times bare ops only — no quality claims.

Shapes: the SD2 UNet trunk convs at 768p latents (96x54 level 0, then /2
per level) and the attention-adjacent projections as [M,K]x[K,N] dots.

MEASURED ANSWER (2026-08-18, v5e via tunnel): **no 2x path**.
  conv 320ch @96x54:   bf16 68.1 TF/s   s8 21.0 TF/s   (3.2x SLOWER)
  conv 1280ch @24x14:  bf16 85.9 TF/s   s8 93.0 TF/s   (1.08x)
  dot 16k x 4k x 4k:   bf16 97.2 TF/s   s8 134.8 TF/s  (1.39x)
Large dots gain 1.39x at best and shallow convs regress badly; SD-UNet
FLOPs are dominated by the shallow/mid conv levels, so the W8A8 serving
mode (ops/quant.py) is net-NEGATIVE on this XLA build and stays opt-in
(--quantize w8a8) for future toolchains that lower s8xs8->s32 natively.

Default run is the 3-shape slim set above (6 compiles — the full 18-fn
sweep exceeds a 10-min tunnel timeout on serialized remote compiles);
pass --full for the original sweep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(o):
    np.asarray(jax.device_get(o.ravel()[0]))


def timeit(fn, *a, iters=10):
    for _ in range(2):
        out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def conv(x, w, acc=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


@jax.jit
def conv_bf16(x, w):
    return conv(x, w)


@jax.jit
def conv_s8(x, w):
    return conv(x, w, acc=jnp.int32)


@jax.jit
def conv_s8_scaled(x, w, sx, sw):
    """The full W8A8 pattern: s8 conv -> s32 -> dequant bf16."""
    y = conv(x, w, acc=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)


@jax.jit
def dot_bf16(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())))


@jax.jit
def dot_s8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def main():
    full = "--full" in sys.argv[1:]
    r = np.random.RandomState(0)
    # UNet trunk conv shapes at 768x432 (latent 96x54), snippet_batch=16 -> N=48
    convs = [
        ("unet l0 320@96x54", (48, 96, 54, 320)),
        ("unet l1 640@48x27", (48, 48, 27, 640)),
        ("unet l2 1280@24x14", (48, 24, 14, 1280)),
        ("vae up3 128@768x432", (16, 768, 432, 128)),
    ]
    if not full:  # slim: extreme channel depths only, bf16-vs-s8 only
        convs = [convs[0], convs[2]]
    for name, (n, H, W, c) in convs:
        xb = jnp.asarray(r.randn(n, H, W, c), jnp.bfloat16)
        wb = jnp.asarray(r.randn(3, 3, c, c) * 0.02, jnp.bfloat16)
        xi = jnp.asarray(r.randint(-127, 128, (n, H, W, c)), jnp.int8)
        wi = jnp.asarray(r.randint(-127, 128, (3, 3, c, c)), jnp.int8)
        flops = 2 * n * H * W * c * c * 9
        variants = [
            ("bf16", conv_bf16, (xb, wb)),
            ("s8  ", conv_s8, (xi, wi)),
        ]
        if full:
            variants.append(
                ("s8sc", conv_s8_scaled, (xi, wi, jnp.float32(0.1), jnp.float32(0.1)))
            )
        for variant, fn, args in variants:
            try:
                dt = timeit(fn, *args)
                print(f"conv {name} {variant}: {dt*1e3:7.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"conv {name} {variant}: FAIL {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)

    # dense projections: [M, K] x [K, N] at transformer-block sizes
    dots = [
        ("attn qkv l0", (48 * 96 * 54, 320, 320)),
        ("ff geglu l1", (48 * 48 * 27, 640, 5120)),
        ("big", (16384, 4096, 4096)),
    ]
    if not full:
        dots = [dots[2]]
    for name, (M, K, N) in dots:
        ab = jnp.asarray(r.randn(M, K), jnp.bfloat16)
        bb = jnp.asarray(r.randn(K, N) * 0.02, jnp.bfloat16)
        ai = jnp.asarray(r.randint(-127, 128, (M, K)), jnp.int8)
        bi = jnp.asarray(r.randint(-127, 128, (K, N)), jnp.int8)
        flops = 2 * M * K * N
        for variant, fn, args in [
            ("bf16", dot_bf16, (ab, bb)),
            ("s8  ", dot_s8, (ai, bi)),
        ]:
            try:
                dt = timeit(fn, *args)
                print(f"dot  {name} {variant}: {dt*1e3:7.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"dot  {name} {variant}: FAIL {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
