#!/usr/bin/env python
"""Minimal repro for the v5e iterated-trip worker fault (VERDICT r5 #3).

History (doc/ROADMAP.md): the composed relight infer program deterministically
faults the v5e worker when MANY 20-step SDE UNet chunk trips run inside ONE
dispatch — 24 frames (4 trips of sb=8) crashed on BOTH attention backends,
6 frames (1 trip) passed, and a 49 s pure-matmul single dispatch passed, so
the trigger is the iterated-UNet trip count, not kernels or wall time.  The
production mitigation is ``max_trips_per_dispatch=1``; this probe measures
the actual threshold so the bound can be raised to the largest safe value.

This is the NO-PIPELINE distillation of ``RollingImgPipeline._infer_program``
(pipelines/rollingimg.py:920-993): one jitted dispatch running

    fori_loop(0, TRIPS):
        20-step lax.scan( 12-ch SD1.5 UNet @ [sb*3, 80, 90] latent
                          + DPM++ SDE step + threefry snippet noise )
        -> dynamic_update_slice into a donated output buffer

with gather/scatter/VAE removed.  Run ONE process per trial (a fault kills
the worker; re-run trials in fresh processes):

    python scripts/probe_trip_threshold.py --trips 2        # on chip
    python scripts/probe_trip_threshold.py --trips 2 --tiny # CPU smoke

Prints ``TRIPS_OK <n> <seconds>`` on success; a worker fault surfaces as a
dead process / RPC error.  Bisect upward: 2, 3, 4 ... first failure is the
threshold; set ``ROLLINGDEPTH_MAX_TRIPS`` (pipelines/rollingimg.py) to
threshold-1.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rollingdepth_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    args = list(sys.argv[1:])
    trips = 2
    if "--trips" in args:
        i = args.index("--trips")
        trips = int(args[i + 1])
        del args[i : i + 2]
    sb = 8
    if "--sb" in args:
        i = args.index("--sb")
        sb = int(args[i + 1])
        del args[i : i + 2]
    n_steps = 20
    if "--steps" in args:
        i = args.index("--steps")
        n_steps = int(args[i + 1])
        del args[i : i + 2]
    tiny = "--tiny" in args

    import jax
    import jax.numpy as jnp

    from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig, unet_apply
    from rollingdepth_tpu.schedulers.dpmsolver import (
        DPMSolverConfig,
        DPMSolverMultistepScheduler,
        DPMState,
    )
    from rollingdepth_tpu.utils.bench_init import device_random_params

    if tiny:
        cfg_obj = UNetConfig(
            sample_size=8, in_channels=12, out_channels=4,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            block_out_channels=(8, 16), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=2, norm_num_groups=4,
        )
        n, h, w, ctx_l, ctx_d = 3, 8, 8, 2, 16
    else:
        cfg_obj = UNetConfig.sd15(in_channels=12)
        n, h, w, ctx_l, ctx_d = 3, 80, 90, 154, 768  # 640x720 production latent

    unet = UNet2DCondition(cfg_obj)
    cfg = unet.config
    params = device_random_params(
        lambda: unet.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    sched = DPMSolverMultistepScheduler(DPMSolverConfig(
        beta_start=0.00085, beta_end=0.012, algorithm_type="sde-dpmsolver++",
        use_karras_sigmas=True, steps_offset=1,
    ))
    num_inference_steps = 40
    timesteps, sigmas = sched.schedule(num_inference_steps)
    begin_index = num_inference_steps - n_steps
    ts = jnp.asarray(timesteps[begin_index:])
    sig = jnp.asarray(sigmas)

    kc, kl, ke = jax.random.split(jax.random.PRNGKey(7), 3)
    rows = trips * sb
    cond = jax.random.normal(kc, (rows, n, h, w, 8), jnp.bfloat16)
    lat0 = jax.random.normal(kl, (rows, n, h, w, 4), jnp.bfloat16)
    text = jax.random.normal(ke, (1, ctx_l, ctx_d), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(5,), static_argnames=("nchunks",))
    def fn(unet_params, text, src_cond, src_init, seed_arr, buf, nchunks):
        def denoise_chunk(cond_c, lat_c, sid_c):
            state = DPMState.init(lat_c.shape)

            def body(carry, inp):
                lat, state = carry
                i, t = inp
                x = jnp.concatenate([lat, cond_c], axis=-1)
                eps = unet_apply(unet_params, cfg, x, jnp.full((sb,), t), text)
                step_noise = jax.vmap(
                    lambda s: jax.random.normal(
                        jax.random.fold_in(
                            jax.random.fold_in(jax.random.PRNGKey(seed_arr[0]), s), i
                        ),
                        lat.shape[1:], jnp.float32,
                    )
                )(sid_c)
                prev, state = sched.step(
                    eps.astype(jnp.float32), begin_index + i,
                    lat.astype(jnp.float32), sig, num_inference_steps,
                    state, noise=step_noise,
                )
                return (prev.astype(jnp.bfloat16), state), None

            (lat, _), _ = jax.lax.scan(body, (lat_c, state), (jnp.arange(n_steps), ts))
            return lat

        def chunk_body(i, buf):
            cond_s = jax.lax.dynamic_slice_in_dim(src_cond, i * sb, sb, 0)
            lat_s = jax.lax.dynamic_slice_in_dim(src_init, i * sb, sb, 0)
            sid_c = i * sb + jnp.arange(sb, dtype=jnp.int32)
            out = denoise_chunk(cond_s, lat_s, sid_c)
            return jax.lax.dynamic_update_slice_in_dim(buf, out, i * sb, 0)

        return jax.lax.fori_loop(0, nchunks, chunk_body, buf)

    print(
        f"[probe] devices={jax.devices()} trips={trips} sb={sb} steps={n_steps} "
        f"latent=[{sb*n},{h},{w}]", file=sys.stderr,
    )
    buf = jnp.zeros((rows, n, h, w, 4), jnp.bfloat16)
    t0 = time.perf_counter()
    out = fn(params, text, cond, lat0, jnp.asarray([12345], jnp.int32), buf,
             nchunks=trips)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0
    import numpy as np

    assert np.isfinite(np.asarray(out[0, 0, :2, :2, 0], np.float32)).all()
    print(f"TRIPS_OK {trips} {elapsed:.1f}", flush=True)


if __name__ == "__main__":
    main()
