#!/usr/bin/env python
"""Split the relight composed-infer time into its parts, on chip.

The 60-frame relight bench runs the composed 20-step SDE denoise at a
whole-workload rate well below the 133 TF/s the 12-ch UNet forward measures
standalone (BASELINE.md relight table).  This harness times, at the exact
production chunk shape [sb, 3, 80, 90, ...]:

  1. one jitted UNet forward (the standalone ceiling),
  2. the full 20-step denoise scan chunk (UNet + DPM++ SDE step + keyed
     noise) — the bounded-dispatch unit production runs,
  3. the same scan with the scheduler step replaced by a plain axpy (so the
     gap attributable to scheduler arithmetic + threefry noise is isolated),
  4. optionally the XLA attention backend and sb=16 for comparison.

Usage: python scripts/profile_relight_infer.py [--sb N] [--xla] [--steps N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rollingdepth_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig, unet_apply
    from rollingdepth_tpu.schedulers.dpmsolver import (
        DPMSolverConfig,
        DPMSolverMultistepScheduler,
        DPMState,
    )
    from rollingdepth_tpu.utils.bench_init import device_random_params

    args = list(sys.argv[1:])
    sb = 8
    if "--sb" in args:
        i = args.index("--sb")
        sb = int(args[i + 1])
        del args[i : i + 2]
    use_flash = None
    if "--xla" in args:
        use_flash = False
        args.remove("--xla")
    n_steps = 20
    if "--steps" in args:
        i = args.index("--steps")
        n_steps = int(args[i + 1])
        del args[i : i + 2]

    n, h, w = 3, 80, 90  # 640x720 production latent
    print(f"[profile] devices: {jax.devices()} sb={sb} flash={use_flash} "
          f"steps={n_steps}", file=sys.stderr)

    unet = UNet2DCondition(UNetConfig.sd15(in_channels=12))
    unet_params = device_random_params(
        lambda: unet.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16
    )
    cfg = unet.config
    sched = DPMSolverMultistepScheduler(DPMSolverConfig(
        beta_start=0.00085, beta_end=0.012, algorithm_type="sde-dpmsolver++",
        use_karras_sigmas=True, steps_offset=1,
    ))
    num_inference_steps = 40
    timesteps, sigmas = sched.schedule(num_inference_steps)
    t_start = num_inference_steps - n_steps
    ts = timesteps[t_start:]

    key = jax.random.PRNGKey(7)
    kc, kl, ke = jax.random.split(key, 3)
    cond = jax.random.normal(kc, (sb, n, h, w, 8), jnp.bfloat16)
    lat0 = jax.random.normal(kl, (sb, n, h, w, 4), jnp.bfloat16)
    text = jax.random.normal(ke, (1, 154, 768), jnp.bfloat16)
    sid = jnp.arange(sb, dtype=jnp.int32)

    def sync(out):
        # block_until_ready is a NO-OP on the axon transport (see
        # pipelines.rollingdepth._sync) — close every timing with a real
        # scalar fetch or the numbers measure dispatch latency only
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))

    def timeit(f, *a, reps=3):
        sync(f(*a))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- 1. standalone forward
    @jax.jit
    def fwd(p, cond, lat, text):
        x = jnp.concatenate([cond, lat], axis=-1)
        return unet_apply(p, cfg, x, jnp.full((sb,), 999.0), text,
                          use_flash=use_flash)

    t_fwd = timeit(fwd, unet_params, cond, lat0, text)
    print(f"[profile] unet forward: {t_fwd*1e3:.1f} ms", file=sys.stderr)

    # ---- 2. full production scan (UNet + DPM++ SDE + keyed noise)
    def make_scan(step_mode):
        @jax.jit
        def scan_fn(p, cond_c, lat_c, text, sig, sid_c):
            state = DPMState.init(lat_c.shape)

            def body(carry, inp):
                lat, state = carry
                i, t = inp
                x = jnp.concatenate([cond_c, lat], axis=-1)
                eps = unet_apply(p, cfg, x, jnp.full((sb,), t), text,
                                 use_flash=use_flash)
                if step_mode == "full":
                    step_noise = jax.vmap(
                        lambda s: jax.random.normal(
                            jax.random.fold_in(
                                jax.random.fold_in(jax.random.PRNGKey(0), s), i
                            ),
                            lat.shape[1:], jnp.float32,
                        )
                    )(sid_c)
                    prev, state = sched.step(
                        eps.astype(jnp.float32), t_start + i,
                        lat.astype(jnp.float32), sig, num_inference_steps,
                        state, noise=step_noise,
                    )
                elif step_mode == "nonoise":
                    prev, state = sched.step(
                        eps.astype(jnp.float32), t_start + i,
                        lat.astype(jnp.float32), sig, num_inference_steps,
                        state, noise=jnp.zeros_like(lat, jnp.float32),
                    )
                else:  # axpy: no scheduler at all
                    prev = lat.astype(jnp.float32) - 0.05 * eps.astype(jnp.float32)
                return (prev.astype(jnp.bfloat16), state), None

            (lat, _), _ = jax.lax.scan(
                body, (lat_c, state), (jnp.arange(n_steps), ts)
            )
            return lat

        return scan_fn

    for mode in ("full", "nonoise", "axpy"):
        t_scan = timeit(make_scan(mode), unet_params, cond, lat0, text, sigmas, sid)
        overhead = t_scan - n_steps * t_fwd
        print(
            f"[profile] {n_steps}-step scan [{mode}]: {t_scan*1e3:.1f} ms "
            f"({t_scan/n_steps*1e3:.1f} ms/step; vs {n_steps}x forward: "
            f"{overhead*1e3:+.1f} ms, {overhead/max(t_scan,1e-9)*100:.1f}%)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
