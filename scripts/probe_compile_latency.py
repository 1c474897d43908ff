#!/usr/bin/env python
"""On-chip probe: what does one jit compile actually cost on this backend,
and do compiles overlap across threads / persist across processes?

Answers three questions that decide how to attack new-clip-length compile
overhead (doc/ROADMAP.md "New-length compile cost"):

1. serial cost of a TRIVIAL program compile (the pad/slice/reshape glue) —
   on the axon tunnel this is dominated by RPC round trips, not XLA work;
2. whether N compiles issued from N Python threads overlap (if they do, a
   prewarm pool amortizes the tunnel latency);
3. whether the jax persistent compilation cache
   (jax_compilation_cache_dir) works on this backend — if it does, every
   process start and every previously-seen clip length costs ~0 compiles.

Usage: python scripts/probe_compile_latency.py [--cache-dir DIR]
(run twice with --cache-dir to measure the warm-cache process start).
"""
import concurrent.futures
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache_dir = None
if "--cache-dir" in sys.argv:
    cache_dir = sys.argv[sys.argv.index("--cache-dir") + 1]

import jax

if cache_dir:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def trivial(n):
    """A distinct trivial 'glue-like' program per n (pad + slice)."""
    @jax.jit
    def fn(x):
        y = jnp.concatenate([x, jnp.zeros((7, x.shape[1]), x.dtype)], axis=0)
        return y[: n + 3]

    return fn


def main():
    dev = jax.devices()[0]
    print(f"[probe] device: {dev}", flush=True)

    # warm the dispatch path itself
    jnp.zeros((8, 8)).block_until_ready()

    # 1. serial trivial compiles (8 distinct shapes)
    xs = [jnp.ones((100 + i, 64), jnp.float32) for i in range(16)]
    for x in xs:
        x.block_until_ready()
    t0 = time.perf_counter()
    for i in range(8):
        np.asarray(trivial(i)(xs[i])[0, 0])
    serial = time.perf_counter() - t0
    print(f"[probe] 8 trivial compiles SERIAL: {serial:.2f}s "
          f"({serial / 8:.2f}s each)", flush=True)

    # 2. threaded trivial compiles (8 distinct shapes, 8 threads)
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        list(pool.map(lambda i: np.asarray(trivial(i)(xs[8 + i])[0, 0]),
                      range(8)))
    threaded = time.perf_counter() - t0
    print(f"[probe] 8 trivial compiles THREADED(8): {threaded:.2f}s "
          f"(overlap {serial / max(threaded, 1e-9):.1f}x)", flush=True)

    # 3. a mid-size program (conv chain ~ VAE-decode-chunk flavor)
    k = jax.random.PRNGKey(0)
    w1 = jax.random.normal(k, (3, 3, 64, 64), jnp.bfloat16)
    x = jax.random.normal(k, (4, 96, 96, 64), jnp.bfloat16)

    @jax.jit
    def mid(x, w):
        for _ in range(12):
            x = jax.nn.gelu(jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return x.mean()

    t0 = time.perf_counter()
    np.asarray(mid(x, w1))
    print(f"[probe] mid-size (12-conv) compile+run: "
          f"{time.perf_counter() - t0:.2f}s", flush=True)

    if cache_dir:
        try:
            n_entries = len(os.listdir(cache_dir))
        except OSError:
            n_entries = -1
        print(f"[probe] persistent cache entries now: {n_entries}", flush=True)


if __name__ == "__main__":
    main()
