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

from ..ops.attention import backend_tag

# Gather sources (per-frame latents) are zero-padded to a multiple of this
# bucket.  Latents are tiny (a 256-frame 768p source is ~11 MB bf16), so the
# padding is free; compute-chunk sizes still track the TRUE length.
FRAME_CAPACITY = 256


def round_up(n: int, multiple: int) -> int:
    """Smallest multiple of ``multiple`` >= n."""
    return multiple * (-(-n // multiple))


def capacity(n: int) -> int:
    return round_up(n, FRAME_CAPACITY)


# Work-item buffers (snippet rows, frame rows) are padded to a multiple of
# this bucket; the compute loops run a DYNAMIC number of chunk iterations
# inside one compiled program, so only the buffer bucket — not the work
# count — keys the compile.
ROW_BUCKET = 128


def row_capacity(n: int) -> int:
    return round_up(n, ROW_BUCKET)


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


def pick_chunk(s: int, max_chunk: int, dp: int = 1) -> int:
    """Per-device chunk size for ``s`` work items sharded over ``dp``:
    ``max_chunk`` whenever the per-device share reaches it.

    The chunk size must NOT be derived from s beyond the small-s clamp —
    a length-dependent chunk forces a full UNet/VAE recompile for every new
    clip length, which costs minutes where the padding it saved costs
    milliseconds.  Small shares clamp to the next multiple of 4 so tiny
    test workloads stay tiny (and dp meshes don't pad s to max_chunk*dp
    rows when ceil(s/dp) items per device would do)."""
    if s >= max_chunk * dp:
        return max_chunk
    return max(1, min(max_chunk, round_up(-(-s // dp), 4)))


def encode_frames(cache, vae, vae_params, frames: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, h, w, 4] scaled latents — ONE dispatch over a
    dynamic number of fixed-size ``vae_bs`` chunks, keyed by (frame shape,
    bs, bucket), never the clip length.  Shared by the depth and relight
    pipelines (both encode with identical chunking semantics)."""
    n = frames.shape[0]
    bs = pick_chunk(n, vae_bs)
    n_pad = round_up(n, bs)
    ncap = row_capacity(n_pad)
    src = pad_zeros_dev(cache, frames, ncap)
    key = ("encode", frames.shape[1:], bs, ncap, backend_tag())
    if key not in cache:
        lat_sd = jax.eval_shape(
            lambda p, c: vae.encode_mean(p, c),
            vae_params,
            jax.ShapeDtypeStruct((bs,) + frames.shape[1:], frames.dtype),
        )

        @jax.jit
        def fn(params, x, nchunks):
            def body(i, buf):
                c = jax.lax.dynamic_slice_in_dim(x, i * bs, bs, 0)
                z = vae.encode_mean(params, c)
                return jax.lax.dynamic_update_slice_in_dim(buf, z, i * bs, 0)

            buf = jnp.zeros((ncap,) + lat_sd.shape[1:], lat_sd.dtype)
            return jax.lax.fori_loop(0, nchunks, body, buf)

        cache[key] = fn
    return cache[key](vae_params, src, n_pad // bs)[:n]
