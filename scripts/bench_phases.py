#!/usr/bin/env python
"""Phase/kernel microbenchmarks on the real chip.

Measures, independently:
  - UNet single_step forward TF/s at the fast-preset shape (denoise phase)
  - VAE decode TF/s at the fast-preset shape (decode phase)
  - VAE encode TF/s
  - our Pallas flash attention vs the JAX-library TPU flash kernel vs XLA
    at the UNet cross-frame shape (L=15552, H=5, D=64)

Usage: python scripts/bench_phases.py [section ...]
Sections: unet vae attn (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rollingdepth_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """True device sync via a scalar fetch — block_until_ready is a no-op on
    some remote transports (same trick as pipelines/rollingdepth._sync)."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def conv_flops(n, h, w, cin, cout, k=3):
    return 2 * n * h * w * cin * cout * k * k


def bench_unet():
    from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig, unet_apply

    from rollingdepth_tpu.utils.bench_init import device_random_params

    cfg = UNetConfig.sd21(in_channels=8)
    unet = UNet2DCondition(cfg)
    params = device_random_params(
        lambda: unet.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    sb, n, h, w = 16, 3, 96, 54
    x = jax.random.normal(jax.random.PRNGKey(1), (sb, n, h, w, 8), jnp.bfloat16)
    t = jnp.full((sb,), 999, jnp.int32)
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 1024), jnp.bfloat16)

    fn = jax.jit(lambda p, x, t, c: unet_apply(p, cfg, x, t, c))
    dt = timeit(fn, params, x, t, text)
    # FLOP estimate: single-frame SD2 UNet ~680 GFLOP at 64x64 latent,
    # conv part scales with area; snippet attention part grows 3x on top.
    # Use a conservative conv-only scale for the TF/s denominator.
    flops = 680e9 * (h * w) / (64 * 64) * sb * n
    print(f"unet fwd [sb={sb} n={n} {h}x{w}]: {dt*1e3:.1f} ms  ~{flops/dt/1e12:.1f} TF/s (conv-scaled est)")


def bench_vae():
    from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig

    from rollingdepth_tpu.utils.bench_init import device_random_params

    vae = AutoencoderKL(VAEConfig())
    params = device_random_params(
        lambda: vae.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    bs = 16
    H, W = 768, 432
    z = jax.random.normal(jax.random.PRNGKey(1), (bs, H // 8, W // 8, 4), jnp.bfloat16)
    img = jax.random.normal(jax.random.PRNGKey(2), (bs, H, W, 3), jnp.bfloat16)

    dec = jax.jit(lambda p, z: vae.decode(p, z).mean(axis=-1))
    enc = jax.jit(lambda p, x: vae.encode_mean(p, x))
    dt_d = timeit(dec, params, z)
    dt_e = timeit(enc, params, img)
    vs = (H * W) / (512 * 512)
    print(f"vae decode [bs={bs} {H}x{W}]: {dt_d*1e3:.1f} ms  {1260e9*vs*bs/dt_d/1e12:.1f} TF/s")
    print(f"vae encode [bs={bs} {H}x{W}]: {dt_e*1e3:.1f} ms  {560e9*vs*bs/dt_e/1e12:.1f} TF/s")


def bench_attn():
    from rollingdepth_tpu.ops.flash_attention import flash_attention
    from jax.experimental.pallas.ops.tpu import flash_attention as jfa

    for (b, l, hh, d), blk in [((2, 15552, 5, 64), 1024), ((16, 5184, 1, 512), 512)]:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(kq, (b, l, hh, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, l, hh, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, l, hh, d), jnp.bfloat16)
        flops = 4 * b * hh * l * l * d  # qk + pv

        dt = timeit(
            lambda q, k, v: flash_attention(q, k, v, None, blk, blk), q, k, v,
            iters=10,
        )
        print(f"ours  flash [{b}x{l}x{hh}x{d}]: {dt*1e3:.1f} ms  {flops/dt/1e12:.1f} TF/s")

        # jax library kernel wants [b, h, l, d] and L % block == 0 (pad with
        # zero keys — changes the math slightly, fine for a speed comparison)
        lp = (l + 511) // 512 * 512
        pad = ((0, 0), (0, lp - l), (0, 0), (0, 0))
        qt, kt, vt = (
            jnp.pad(x, pad).transpose(0, 2, 1, 3) for x in (q, k, v)
        )
        try:
            jfn = jax.jit(
                lambda q, k, v: jfa.flash_attention(
                    q, k, v, causal=False, sm_scale=float(d) ** -0.5
                )
            )
            dt = timeit(jfn, qt, kt, vt, iters=10)
            jflops = 4 * b * hh * lp * lp * d
            print(f"jaxlib flash [{b}x{lp}x{hh}x{d}]: {dt*1e3:.1f} ms  {jflops/dt/1e12:.1f} TF/s")
        except Exception as e:
            print(f"jaxlib flash failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    sections = sys.argv[1:] or ["unet", "vae", "attn"]
    print(f"devices: {jax.devices()}")
    for s in sections:
        {"unet": bench_unet, "vae": bench_vae, "attn": bench_attn}[s]()
