"""Unit tests for the fixed-row-block dispatch helpers (pipelines/chunking.py).

These are the primitives that keep every heavy device program off the
clip-length key (run_blocked / slice_rows / update_rows / concat_rows) —
exercised directly here with a cheap body so failures localize, and
end-to-end by test_compile_stability / test_e2e_parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.pipelines.chunking import (
    ROW_BUCKET,
    block_rows,
    concat_rows,
    encode_frames_padded,
    pick_chunk,
    round_up,
    run_blocked,
    slice_rows,
    update_rows,
)


def test_block_rows_fixed_and_chunk_aligned():
    assert block_rows(16) == ROW_BUCKET  # 16 divides 128
    assert block_rows(12) == round_up(ROW_BUCKET, 12)  # whole chunks
    assert block_rows(256) == 256  # rows > bucket: one chunk per block
    # never a function of any work count — same value for any n
    assert block_rows(16) == block_rows(16)


@pytest.mark.parametrize("n,rows", [(5, 4), (12, 4), (128, 16), (130, 16), (324, 16)])
def test_run_blocked_matches_direct(n, rows):
    """Blocked dispatch of a chunked body == the body applied directly to
    the true rows, for lengths below/at/above one block."""
    cache = {}
    src = jnp.asarray(np.random.RandomState(0).rand(n, 3).astype(np.float32))
    n_pad = round_up(n, rows)
    block = block_rows(rows)

    def make_fn():
        @jax.jit
        def fn(z, nchunks):
            def body(i, buf):
                c = jax.lax.dynamic_slice_in_dim(z, i * rows, rows, 0)
                return jax.lax.dynamic_update_slice_in_dim(buf, c * 2.0 + 1.0, i * rows, 0)

            return jax.lax.fori_loop(0, nchunks, body, jnp.zeros((block,) + z.shape[1:], z.dtype))

        return fn

    fn = make_fn()
    out = run_blocked(cache, fn, src, n_pad, rows, block)
    assert out.shape[0] == max(1, -(-n_pad // block)) * block
    np.testing.assert_allclose(np.asarray(out[:n]), np.asarray(src) * 2.0 + 1.0, rtol=1e-6)
    # rows covered by no trip stay zero (trips are bounded by n_pad)
    tail = np.asarray(out[n_pad:])
    assert (tail == 0).all()


def test_slice_update_concat_roundtrip():
    cache = {}
    src = jnp.asarray(np.arange(40, dtype=np.float32).reshape(10, 4))
    a = slice_rows(cache, src, 0, 4)
    b = slice_rows(cache, src, 4, 4)
    assert a.shape == b.shape == (4, 4)
    cat = concat_rows(cache, [a, b])
    np.testing.assert_array_equal(np.asarray(cat), np.asarray(src[:8]))
    # update_rows donates the buffer: rebind, contents land at the offset
    buf = jnp.zeros((10, 4), jnp.float32)
    buf = update_rows(cache, buf, b, 2)
    np.testing.assert_array_equal(np.asarray(buf[2:6]), np.asarray(src[4:8]))
    assert (np.asarray(buf[:2]) == 0).all() and (np.asarray(buf[6:]) == 0).all()
    # the traced offset means ONE cached program serves every block
    n_progs = len([k for k in cache if k[0] == "rowslice"])
    slice_rows(cache, src, 4, 4)
    assert len([k for k in cache if k[0] == "rowslice"]) == n_progs


def test_program_keys_length_independent():
    """Two different work counts with the same chunk geometry share every
    non-glue cached program — the invariant the whole design rests on."""
    def run(n):
        cache = {}
        src = jnp.zeros((n, 3), jnp.float32)
        rows = 4
        block = block_rows(rows)

        @jax.jit
        def fn(z, nchunks):
            return z * 1.0

        run_blocked(cache, fn, src, round_up(n, rows), rows, block)
        return {k for k in cache if k[0] not in ("padzeros", "rowslice", "rowconcat")}

    assert run(20) == run(52) == run(129)


class _TinyVAE:
    """encode_mean stand-in: per-row affine so outputs identify their row."""

    def encode_mean(self, params, x):  # [b, H, W, C] -> [b, 2]
        return jnp.stack([x.mean(axis=(1, 2, 3)), x.max(axis=(1, 2, 3))], axis=-1)


def test_encode_frames_padded_matches_raw():
    cache = {}
    vae = _TinyVAE()
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.rand(13, 4, 4, 3).astype(np.float32))
    out = encode_frames_padded(cache, vae, None, frames, 13, vae_bs=4)
    assert out.shape[0] >= 16  # >= round_up(13, bs)
    ref = np.stack([np.asarray(frames).mean(axis=(1, 2, 3)),
                    np.asarray(frames).max(axis=(1, 2, 3))], axis=-1)
    np.testing.assert_allclose(np.asarray(out[:13]), ref, rtol=1e-6)
    # a caller-padded (born-padded) input encodes identically on true rows
    padded = jnp.concatenate([frames, jnp.zeros((19, 4, 4, 3), jnp.float32)], 0)
    out2 = encode_frames_padded(cache, vae, None, padded, 13, vae_bs=4)
    np.testing.assert_allclose(np.asarray(out2[:13]), ref, rtol=1e-6)


def test_pick_chunk_not_length_derived():
    # above the clamp region the chunk NEVER tracks the work count
    assert pick_chunk(100, 16) == pick_chunk(1000, 16) == 16
    assert pick_chunk(3, 16) == 4  # small-s clamp to a multiple of 4
