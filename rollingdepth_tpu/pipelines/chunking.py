"""Host-chunked execution helpers for length-independent compilation.

Compute-heavy device programs are keyed by their CHUNK shape (plus the
FRAME_CAPACITY bucket for gather sources), never by the clip length; a host
loop feeds fixed-shape chunks.  A second clip of a different length reuses
every heavy program and pays only for the trivial pad/slice/concat programs
here (the reference handles any clip length with zero recompilation,
/root/reference/run_video.py:550-585 — this is the XLA-static-shape
equivalent).

All helpers take the caller's jit-cache dict so each pipeline keeps one
cache to drop when its mesh/config changes.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

# Gather sources (per-frame latents) are zero-padded to a multiple of this
# bucket.  Latents are tiny (a 256-frame 768p source is ~11 MB bf16), so the
# padding is free; compute-chunk sizes still track the TRUE length.
FRAME_CAPACITY = 256


def capacity(n: int) -> int:
    return FRAME_CAPACITY * (-(-n // FRAME_CAPACITY))


# Work-item buffers (snippet rows, frame rows) are padded to a multiple of
# this bucket; the compute loops run a DYNAMIC number of chunk iterations
# inside one compiled program, so only the buffer bucket — not the work
# count — keys the compile.
ROW_BUCKET = 128


def row_capacity(n: int) -> int:
    return ROW_BUCKET * (-(-n // ROW_BUCKET))


def pad_zeros_dev(cache: Dict[Any, Any], x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Zero-pad axis 0 to ``target`` (gather-source capacity padding)."""
    if x.shape[0] >= target:
        return x
    key = ("padzeros", x.shape, target, str(x.dtype))
    if key not in cache:
        pad_shape = (target - x.shape[0],) + x.shape[1:]
        cache[key] = jax.jit(
            lambda x: jnp.concatenate([x, jnp.zeros(pad_shape, x.dtype)], axis=0)
        )
    return cache[key](x)


