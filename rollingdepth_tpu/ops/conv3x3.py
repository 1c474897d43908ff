"""Pallas 3x3 same-padding conv prototype (NHWC, flat shifted-matmul scheme).

Motivation (doc/ROADMAP.md): XLA's conv reaches only ~25-40% MXU utilization
at the VAE decoder's 128-256 channel / large-spatial shapes, and the decoder
is the largest FLOP block of the fast preset.

Scheme: flatten (H, W) so the image is a [H*Wp, C_in] matrix (Wp = W+2 halo
columns).  For a kernel tap (dy, dx), the shifted patch of a row-tile is the
CONTIGUOUS slice ``flat[dy*Wp + dx : dy*Wp + dx + rows*Wp]`` — so the conv is
9 accumulated [rows*Wp, C_in] @ [C_in, C_out] MXU matmuls with full-lane
contraction and zero data duplication.  The two halo columns per row produce
garbage output pixels that the caller slices off.

On-chip results (v5e, bs16 432x768): v1 58 TF/s, double-buffered v1b
69 TF/s, XLA 78 TF/s — correct at 128 channels but NOT yet faster than XLA.

*** WARNING: at 256 channels the double-buffered variant MISCOMPILES on this
Mosaic build (silently wrong values, err ~1.0), as did the K-concat staging
variant at 128.  These kernels are research prototypes; the model paths use
XLA convs.  Any future enablement must ship with a runtime parity check per
shape. ***

Mosaic constraints hit along the way: >2-D refs with manual DMA crash this
compiler build (hence the flat form); bf16 DMA starts/sizes must be 16-row
multiples (hence wp rounded to 16); sublane-shifted VMEM reads appear to be
the miscompile trigger.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, o_ref, *, rows, wp, cin, cout, img_rows):
    i = pl.program_id(0)  # image index
    j = pl.program_id(1)  # row tile index
    start = i * img_rows * wp + j * rows * wp

    def body(tile, acc_ref, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, (rows + 2) * wp)],
            tile.at[pl.ds(0, (rows + 2) * wp)],
            sem,
        )
        dma.start()
        dma.wait()

        acc_ref[:] = jnp.zeros_like(acc_ref)
        for dy in range(3):
            for dx in range(3):
                off = dy * wp + dx
                a = tile[off : off + rows * wp, :]
                acc_ref[:] += jax.lax.dot_general(
                    a, w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    pl.run_scoped(
        body,
        # +8 slack rows: the dy=2,dx>0 shifted slices overrun the haloed
        # region by up to 2 rows — those lanes only feed the discarded
        # halo-column outputs, but the slice bounds must exist
        pltpu.VMEM(((rows + 2) * wp + 16, cin), x_hbm.dtype),
        pltpu.VMEM((rows * wp, cout), jnp.float32),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def conv3x3_same(
    x: jnp.ndarray,  # [N, H, W, C_in]
    w: jnp.ndarray,  # [3, 3, C_in, C_out]
    b: Optional[jnp.ndarray] = None,
    block_rows: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    # wp must be a 16-multiple: bf16 DMA starts/sizes need 16-row alignment
    wp = (width + 2 + 15) // 16 * 16
    # VMEM budget guard: haloed tile + fp32 accumulator must fit on-chip
    itemsize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    vmem = (block_rows + 2) * wp * cin * itemsize + block_rows * wp * cout * 4
    if vmem > 12 * 1024 * 1024:
        raise ValueError(
            f"block_rows={block_rows} needs ~{vmem/1e6:.0f}MB VMEM; reduce block_rows"
        )
    rows = min(block_rows, h)
    pad_h = (-h) % rows
    hp = h + pad_h
    # conv halo (1px left, wp-width-1 right incl. garbage cols) + row padding
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, wp - width - 1), (0, 0)))
    flat = xp.reshape(n * (hp + 2) * wp, cin)
    wf = w.reshape(9, cin, cout)

    grid = (n, hp // rows)
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, rows=rows, wp=wp, cin=cin, cout=cout, img_rows=hp + 2
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # flat image in HBM; manual DMA
            pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows * wp, cout), lambda i, j: (i * (hp // rows) + j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n * hp * wp, cout), x.dtype),
        interpret=interpret,
    )(flat, wf)
    # un-flatten and drop the 2 garbage halo columns + row padding
    out = out.reshape(n, hp, wp, cout)[:, :h, :width]
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# v1b: double-buffered halo DMA (prefetch next tile during compute)
# ---------------------------------------------------------------------------


def _conv_kernel_db(x_hbm, w_ref, o_ref, tiles, acc_ref, sems, *, rows, wp, cin,
                    cout, img_rows, tiles_per_img, n_img):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * tiles_per_img + j
    n_steps = n_img * tiles_per_img
    size = (rows + 2) * wp

    def start_for(s):
        img = s // tiles_per_img
        tile_j = s % tiles_per_img
        return img * img_rows * wp + tile_j * rows * wp

    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _warmup():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_for(step), size)],
            tiles.at[0, pl.ds(0, size)], sems.at[0],
        ).start()

    @pl.when(step + 1 < n_steps)
    def _prefetch():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(start_for(step + 1), size)],
            tiles.at[next_slot, pl.ds(0, size)], sems.at[next_slot],
        ).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(start_for(step), size)],
        tiles.at[slot, pl.ds(0, size)], sems.at[slot],
    ).wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            off = dy * wp + dx
            a = tiles[slot, off : off + rows * wp, :]
            acc_ref[:] += jax.lax.dot_general(
                a, w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def conv3x3_same_db(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    block_rows: int = 16,
) -> jnp.ndarray:
    """Double-buffered variant of conv3x3_same (TPU only)."""
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    wp = (width + 2 + 15) // 16 * 16
    rows = min(block_rows, h)
    pad_h = (-h) % rows
    hp = h + pad_h
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, wp - width - 1), (0, 0)))
    flat = xp.reshape(n * (hp + 2) * wp, cin)
    wf = w.reshape(9, cin, cout)
    tiles_per_img = hp // rows

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel_db, rows=rows, wp=wp, cin=cin, cout=cout,
            img_rows=hp + 2, tiles_per_img=tiles_per_img, n_img=n,
        ),
        grid=(n, tiles_per_img),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, cin, cout), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows * wp, cout), lambda i, j: (i * tiles_per_img + j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n * hp * wp, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, (rows + 2) * wp + 16, cin), x.dtype),
            pltpu.VMEM((rows * wp, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(flat, wf)
    out = out.reshape(n, hp, wp, cout)[:, :h, :width]
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
