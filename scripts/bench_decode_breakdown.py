#!/usr/bin/env python
"""Per-stage timing of the VAE decoder (and UNet fwd) at the fast-preset
shape: time decoder PREFIXES (conv_in, +mid, +up0, ..., +conv_out) so stage
cost = successive difference, with XLA free to fuse inside each prefix.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rollingdepth_tpu.models import layers as L
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig, _mid_block_apply
from rollingdepth_tpu.utils.bench_init import device_random_params


def _sync(out):
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    vae = AutoencoderKL(VAEConfig())
    cfg = vae.config
    params = device_random_params(
        lambda: vae.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    bs, H, W = 16, 768, 432
    z = jax.random.normal(jax.random.PRNGKey(1), (bs, H // 8, W // 8, 4), jnp.bfloat16)

    def prefix(n_stages):
        dec = params["decoder"]
        g = cfg.norm_num_groups

        @jax.jit
        def fn(dec, z):
            h = L.conv2d(dec["conv_in"], z, padding=1)
            stages = 0
            if n_stages > stages:
                h = _mid_block_apply(dec["mid_block"], h, cfg)
            stages += 1
            for block in dec["up_blocks"]:
                if n_stages > stages:
                    for r in block["resnets"]:
                        h = L.resnet_block(r, h, num_groups=g, eps=1e-6)
                    if "upsamplers" in block:
                        h = L.upsample_nearest_conv(block["upsamplers"][0]["conv"], h)
                stages += 1
            if n_stages > stages:
                h = L.group_norm(dec["conv_norm_out"], h, g, eps=1e-6)
                h = L.silu(h)
                h = L.conv2d(dec["conv_out"], h, padding=1)
            return h.mean()  # force full computation, tiny fetch

        return fn

    names = ["conv_in", "+mid", "+up0(512@96x54)", "+up1(512@192x108)",
             "+up2(256@384x216)", "+up3(128@768x432)", "+norm/conv_out"]
    prev = 0.0
    for i, name in enumerate(names):
        dt = timeit(prefix(i), params["decoder"], z)
        print(f"{name:<22} cum {dt*1e3:7.1f} ms   stage {(dt-prev)*1e3:7.1f} ms")
        prev = dt


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
