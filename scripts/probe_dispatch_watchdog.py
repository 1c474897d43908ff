#!/usr/bin/env python
"""Probe: does the TPU worker/relay kill LONG single dispatches?

Evidence (2026-08-19): the relight pipeline crashes the v5e worker at 24
frames on BOTH the all-Pallas and all-XLA attention paths, while 6-frame
runs pass on both — the variable is per-dispatch work (one fori_loop
program runs ~26-50 s at 24f vs ~9 s at 6f), not kernels or shapes.  This
probe times a trivially-correct program (chained matmuls, dynamic trip
count so ONE compile serves all durations) at increasing durations to find
the execution-time threshold directly, with zero pipeline baggage.

Usage: python scripts/probe_dispatch_watchdog.py [seconds...]
Default ladder: 3 8 15 25 40 60 — stops at the first crash.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    durations = [float(a) for a in sys.argv[1:]] or [3, 8, 15, 25, 40, 60]
    dim = 4096
    x = jnp.ones((dim, dim), jnp.bfloat16)

    @jax.jit
    def burn(x, ntrips):
        def body(i, a):
            # data-dependent chain so nothing folds away
            return (a @ x) * (1.0 / dim)

        return jax.lax.fori_loop(0, ntrips, body, x)

    # calibrate: trips/sec at this shape (2*dim^3 flops per trip)
    t0 = time.perf_counter()
    np.asarray(burn(x, 50).ravel()[0])
    dt = time.perf_counter() - t0
    print(f"[probe] warmup+50 trips: {dt:.2f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(burn(x, 200).ravel()[0])
    per_trip = (time.perf_counter() - t0) / 200
    print(f"[probe] {per_trip*1e3:.2f} ms/trip "
          f"({2*dim**3/per_trip/1e12:.1f} TF/s)", flush=True)

    for want in durations:
        trips = max(1, int(want / per_trip))
        t0 = time.perf_counter()
        try:
            np.asarray(burn(x, trips).ravel()[0])
            dt = time.perf_counter() - t0
            print(f"[probe] target {want:.0f}s -> {trips} trips: OK in {dt:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.perf_counter() - t0
            print(f"[probe] target {want:.0f}s -> {trips} trips: "
                  f"FAILED after {dt:.1f}s: {type(e).__name__}: {e}", flush=True)
            break


if __name__ == "__main__":
    main()
