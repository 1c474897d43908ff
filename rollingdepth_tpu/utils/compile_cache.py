"""Persistent XLA compilation cache (production cold-start killer).

The pipelines are engineered so no heavy program keys on the clip length
(pipelines/chunking.py fixed-row blocks), but the FIRST run of a
configuration still pays the full XLA compile (~5 min for the paper preset
at fp32 on the tunnel — BENCH/r5_paper_fp32.log warmup).  JAX's persistent
compilation cache stores compiled executables keyed by HLO hash, so a new
PROCESS running any previously-seen (config, bucket) combination skips
straight to execution — across CLI invocations, servers, and restarts.
The reference has nothing comparable (every torch process re-traces; only
CUDA kernels are cached by the driver).

Enabled by default for the CLI and bench; control with
``ROLLINGDEPTH_XLA_CACHE``:

- unset      -> ``~/.cache/rollingdepth_tpu/xla`` (but auto-off on the axon
  remote-compile tunnel, where cache writes serialize worker-side
  executables back over a ~MB/s link)
- a path     -> that directory (forces on, any backend)
- ``0``/``off`` -> disabled

The min-compile-time / min-entry-size thresholds are zeroed because on
remote-compile transports even trivial glue programs cost a round trip
(doc/ROADMAP.md 'New-length compile cost'); the cache entries for those are
a few KB each.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_DISABLE = ("0", "off", "none", "false")


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX at an on-disk compilation cache; returns the directory or
    None when disabled.  Call BEFORE the first jit dispatch (config flags
    are read at compile time, so calling later only affects later
    compiles)."""
    env = os.environ.get("ROLLINGDEPTH_XLA_CACHE", "")
    if env.lower() in _DISABLE:
        return None
    if not env and path is None:
        # default-on only where executable serialization is local.  On the
        # axon remote-compile tunnel each cache WRITE serializes the
        # worker-side executable back over a ~MB/s link — measured 2026-08-20:
        # the tiny CLI fixture goes from ~200 s to >580 s (hang-like).  An
        # explicit ROLLINGDEPTH_XLA_CACHE path overrides this guard.
        import jax

        if jax.default_backend() == "axon":
            logger.debug(
                "persistent compilation cache off on the axon tunnel "
                "(remote executable serialization; set "
                "ROLLINGDEPTH_XLA_CACHE=<dir> to force)"
            )
            return None
    path = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "rollingdepth_tpu", "xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: on remote-compile transports a "trivial" glue
        # program still costs a full round trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover - defensive: never fatal
        logger.warning("persistent compilation cache unavailable: %s", exc)
        return None
    logger.debug("persistent compilation cache at %s", path)
    return path
