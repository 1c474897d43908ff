#!/usr/bin/env python
"""Probe: equal-FLOP 3x3 convs at the VAE decoder stage shapes.

The decoder breakdown shows 256ch@384x216 running at ~half the TF/s of
512ch@192x108 despite identical FLOPs. Time the bare convs, plus remedies:
- 'split': run the conv as two half-batch convs
- 'taps9': sum of 9 shifted [N*H*W, C] x [C, C] matmuls (pure XLA)
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


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.jit
def conv_xla(x, w):
    return conv(x, w)


@jax.jit
def conv_split(x, w):
    h = x.shape[0] // 2
    return jnp.concatenate([conv(x[:h], w), conv(x[h:], w)], axis=0)


@jax.jit
def conv_taps9(x, w):
    n, H, W, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            patch = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, H, W, c))
            t = jnp.einsum(
                "nhwc,cd->nhwd", patch, w[dy, dx],
                preferred_element_type=jnp.float32,
            )
            out = t if out is None else out + t
    return out.astype(x.dtype)


def main():
    for name, (n, H, W, c) in [
        ("up1 512@192x108", (16, 192, 108, 512)),
        ("up2 256@384x216", (16, 384, 216, 256)),
        ("up3 128@768x432", (16, 768, 432, 128)),
    ]:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (n, H, W, c), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, c, c), jnp.bfloat16) * 0.02
        flops = 2 * n * H * W * c * c * 9
        for variant, fn in [("xla  ", conv_xla), ("split", conv_split),
                            ("taps9", conv_taps9)]:
            try:
                dt = timeit(fn, x, w)
                print(f"{name} {variant}: {dt*1e3:7.1f} ms  {flops/dt/1e12:5.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"{name} {variant}: FAIL {type(e).__name__} {str(e)[:100]}",
                      flush=True)


if __name__ == "__main__":
    main()
