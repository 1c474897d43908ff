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


# ---------------------------------------------------------------------------
# Fixed-row-block dispatch.
#
# A chunk program whose OUTPUT buffer is sized by row_capacity(n_pad) is
# still keyed on the clip length through that bucket: crossing a ROW_BUCKET
# boundary (e.g. the reference-merge snippet decode going 324 -> 252 rows
# between a 60f and a 52f paper-preset clip) recompiles the ENTIRE heavy
# body — at fp32 768p that is a ~100 s VAE/UNet compile on the tunnel, the
# dominant term of the measured 222.8 s new-length overhead
# (BENCH/r5_paper_fp32.log, probe: scripts/probe_glue_compiles.py).
#
# The fix: dispatch the SAME compiled program over fixed-size row BLOCKS
# (ROW_BUCKET rows rounded up to whole chunks).  The heavy body is keyed by
# (chunk, block) only; a new clip length costs at most three trivial glue
# programs (pad / dynamic-slice / concat, <0.3 s local compile each) and
# ceil(n/block)-1 extra dispatches (~28 ms tunnel latency each, ~1% of a
# block's compute).  Trip counts stay dynamic so pad rows are never computed.
# ---------------------------------------------------------------------------


def block_rows(rows: int) -> int:
    """Fixed per-dispatch block: ROW_BUCKET rounded up to whole chunks.
    Depends only on the chunk geometry, NEVER on the work count."""
    return round_up(ROW_BUCKET, rows)


def slice_rows(cache: Dict[Any, Any], src: jnp.ndarray, start: int, block: int) -> jnp.ndarray:
    """[block, ...] rows of ``src`` starting at ``start`` — the offset is a
    traced scalar, so one program per (src bucket, block) serves every
    block of every clip length."""
    key = ("rowslice", src.shape, str(src.dtype), block)
    if key not in cache:
        cache[key] = jax.jit(
            lambda x, o: jax.lax.dynamic_slice_in_dim(x, o, block, 0)
        )
    return cache[key](src, start)


def update_rows(cache: Dict[Any, Any], buf: jnp.ndarray, part: jnp.ndarray, start: int) -> jnp.ndarray:
    """Write ``part`` into ``buf`` at row ``start`` (buf donated — callers
    must rebind: ``buf = update_rows(cache, buf, part, off)``).  The
    streaming assembly twin of ``slice_rows`` for carry-style outputs that
    are too large to concat (one buffer + one block live, never two
    copies)."""
    key = ("rowupdate", buf.shape, str(buf.dtype), part.shape)
    if key not in cache:
        cache[key] = jax.jit(
            lambda b, p, o: jax.lax.dynamic_update_slice_in_dim(b, p, o, 0),
            donate_argnums=(0,),
        )
    return cache[key](buf, part, start)


def concat_rows(cache: Dict[Any, Any], parts: List[jnp.ndarray]) -> jnp.ndarray:
    """Concatenate equal-shaped row blocks (one program per block count)."""
    if len(parts) == 1:
        return parts[0]
    key = ("rowconcat", len(parts), parts[0].shape, str(parts[0].dtype))
    if key not in cache:
        cache[key] = jax.jit(lambda ts: jnp.concatenate(ts, axis=0))
    return cache[key](tuple(parts))


def run_blocked(cache, dispatch, src: jnp.ndarray, n_pad: int, rows: int, block: int) -> jnp.ndarray:
    """Host-loop ``dispatch(z_block, ntrips)`` over fixed-``block``-row
    slices of ``src`` covering ``n_pad`` true rows; returns the concatenated
    [ceil(n_pad/block)*block, ...] buffer (callers slice to true length)."""
    nblocks = max(1, -(-n_pad // block))
    src = pad_zeros_dev(cache, src, nblocks * block)
    outs = []
    for b in range(nblocks):
        z = slice_rows(cache, src, b * block, block)
        trips = -(-min(block, n_pad - b * block) // rows)
        outs.append(dispatch(z, trips))
    return concat_rows(cache, outs)


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
    return encode_frames_padded(cache, vae, vae_params, frames, n, vae_bs)[:n]


def encode_frames_padded(
    cache, vae, vae_params, frames: jnp.ndarray, n_true: int, vae_bs: int
) -> jnp.ndarray:
    """Capacity-padded encode: frames may carry zero-padded tail rows
    (``frames.shape[0] >= n_true``); returns a ``>= round_up(n_true, bs)``-row
    buffer — rows past ``round_up(n_true, bs)`` are zero (never encoded),
    rows in ``[n_true, round_up(n_true, bs))`` are last-chunk pad encodes.

    The VAE program is keyed by (frame shape, bs, BLOCK) only — fixed-size
    row blocks (see ``run_blocked``), so NO clip length or row bucket ever
    recompiles the encoder.  Callers that keep arrays born-padded (host-pad
    before upload, one final slice at the fetch boundary) pay only the
    trivial pad/slice/concat glue at a new length (doc/ROADMAP.md
    'New-length compile cost')."""
    n = n_true
    bs = pick_chunk(n, vae_bs)
    n_pad = round_up(n, bs)
    block = block_rows(bs)
    key = ("encode", frames.shape[1:], bs, block, backend_tag())
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

            buf = jnp.zeros((block,) + lat_sd.shape[1:], lat_sd.dtype)
            return jax.lax.fori_loop(0, nchunks, body, buf)

        cache[key] = fn
    fn = cache[key]
    return run_blocked(
        cache, lambda z, trips: fn(vae_params, z, trips), frames, n_pad, bs, block
    )
