#!/usr/bin/env python
"""Probe: where does per-clip wall time go vs the summed phase timings?

Modes (argv[1]):
  overlap  - same as bench.py steady-state loop (upload+fetch threads)
  serial   - no threads at all: upload, compute, sync, NO fetch
  nofetch  - overlap uploads but never fetch outputs
"""
import concurrent.futures
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rollingdepth_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.pipelines.rollingdepth import (
    RollingDepthPipeline,
    _sync,
    _upload,
)
from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler
from rollingdepth_tpu.utils.bench_init import device_random_params


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "overlap"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    n_clips = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    h, w = 768, 432

    print(f"[probe] mode={mode} devices: {jax.devices()}", file=sys.stderr)
    t0 = time.perf_counter()
    unet = UNet2DCondition(UNetConfig.sd21(in_channels=8))
    vae = AutoencoderKL(VAEConfig())
    unet_params = device_random_params(
        lambda: unet.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    vae_params = device_random_params(
        lambda: vae.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(1), jnp.bfloat16
    )
    scheduler = DDIMScheduler(
        DDIMConfig(beta_schedule="scaled_linear", timestep_spacing="trailing")
    )
    text = jnp.zeros((1, 2, 1024), jnp.bfloat16)
    pipe = RollingDepthPipeline(
        unet, unet_params, vae, vae_params, scheduler, text,
        dtype=jnp.bfloat16, snippet_batch=16, vae_batch=16,
    )
    print(f"[probe] setup {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    clips = [
        (rng.rand(n_frames, 3, h, w) * 255).astype(np.uint8) for _ in range(3)
    ]
    kwargs = dict(
        dilations=[1, 25], cap_dilation=True, refine_step=0, seed=0,
        max_vae_bs=16, fetch_output=False,
    )

    def fetch_and_check(depth_dev):
        depth = RollingDepthPipeline.fetch_depth(depth_dev)
        assert np.isfinite(depth).all()
        return depth

    t0 = time.perf_counter()
    out = pipe.forward(_upload(clips[0]), verbose=True, **kwargs)
    fetch_and_check(out.depth_pred)
    print(
        f"[probe] warmup {time.perf_counter()-t0:.1f}s phases {pipe.last_timings}",
        file=sys.stderr,
    )

    if mode == "serial":
        t0 = time.perf_counter()
        for i in range(1, n_clips + 1):
            tc = time.perf_counter()
            dev = _upload(clips[i % len(clips)])
            t_up = time.perf_counter() - tc
            out = pipe.forward(dev, verbose=True, **kwargs)
            _sync(out.depth_pred)
            print(
                f"[probe] clip {i}: up {t_up:.2f}s wall "
                f"{time.perf_counter()-tc:.2f}s phases {pipe.last_timings}",
                file=sys.stderr,
            )
        elapsed = time.perf_counter() - t0
    else:
        pool = concurrent.futures.ThreadPoolExecutor(4)
        t0 = time.perf_counter()
        up_next = pool.submit(_upload, clips[1 % len(clips)])
        fetches = []
        for i in range(1, n_clips + 1):
            tc = time.perf_counter()
            dev = up_next.result()
            t_wait = time.perf_counter() - tc
            if i < n_clips:
                up_next = pool.submit(_upload, clips[(i + 1) % len(clips)])
            out = pipe.forward(dev, **kwargs)
            t_fwd = time.perf_counter() - tc
            if mode == "overlap":
                fetches.append(pool.submit(fetch_and_check, out.depth_pred))
            else:
                last = out.depth_pred
            t_disp = time.perf_counter() - tc
            _sync(out.depth_pred)
            print(
                f"[probe] clip {i}: upwait {t_wait:.2f}s fwd-dispatch "
                f"{t_fwd:.2f}s submit {t_disp:.2f}s wall(sync) "
                f"{time.perf_counter()-tc:.2f}s",
                file=sys.stderr,
            )
        for f in fetches:
            f.result()
        elapsed = time.perf_counter() - t0
    fps = n_clips * n_frames / elapsed
    print(f"[probe] {mode}: {n_clips}x{n_frames} in {elapsed:.2f}s -> {fps:.2f} fps")


if __name__ == "__main__":
    main()
