#!/usr/bin/env python
"""Microbench: UNet snippet-infer chunk scaling at the fast-768p shape.

Times RollingDepthPipeline._infer_snippets directly for several
(snippet_count, snippet_batch) combinations to answer:
  - does a k-trip dynamic fori_loop cost k/5 of a 5-trip one?
  - what does a small remainder trip (4-chunk) really cost?
  - mixed-chunk (64+4) vs uniform padded (80)?
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rollingdepth_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline, _sync
from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler
from rollingdepth_tpu.utils.bench_init import device_random_params


def main():
    h_img, w_img = 768, 432
    h, w = h_img // 8, w_img // 8
    unet = UNet2DCondition(UNetConfig.sd21(in_channels=8))
    vae = AutoencoderKL(VAEConfig())
    unet_params = device_random_params(
        lambda: unet.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    vae_params = device_random_params(
        lambda: vae.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(1), jnp.bfloat16
    )
    sched = DDIMScheduler(
        DDIMConfig(beta_schedule="scaled_linear", timestep_spacing="trailing")
    )
    text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
    pipe = RollingDepthPipeline(
        unet, unet_params, vae, vae_params, sched, text,
        dtype=jnp.bfloat16, snippet_batch=16,
    )
    rgb_latent = jax.random.normal(
        jax.random.PRNGKey(3), (60, h, w, 4), jnp.bfloat16
    )
    noise = jax.random.normal(jax.random.PRNGKey(4), (h, w, 4), jnp.bfloat16)

    def index_matrix(s):
        # s overlapping 3-frame windows over the 60-frame source
        return np.stack([np.arange(3) + (i % 58) for i in range(s)]).astype(np.int32)

    cases = [
        ("80 evals, sb16 (5 trips)", 80, 16),
        ("64 evals, sb16 (4 trips)", 64, 16),
        ("68 evals, sb16 (mixed 4x16 + 1x4)", 68, 16),
        ("4 evals, sb4 (1 trip)", 4, 16),  # _pick_chunk clamps to 4
        ("68 evals, sb4 (17 trips)", 68, 4),
    ]
    for name, s, sb in cases:
        pipe.snippet_batch = sb
        idx = index_matrix(s)
        out = pipe._infer_snippets(rgb_latent, noise, idx, 1)  # compile
        _sync(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pipe._infer_snippets(rgb_latent, noise, idx, 1)
            _sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:40s} {dt*1e3:8.1f} ms  ({dt/s*1e3:6.2f} ms/eval)", flush=True)


if __name__ == "__main__":
    main()
