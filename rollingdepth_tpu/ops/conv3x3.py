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

Notes from on-chip measurement (v5e, bs16 432x768 128ch, block_rows=16):
58 TF/s vs XLA's 80 TF/s — correct but not yet faster.  Known structure of
the gap (see doc/ROADMAP.md): per-tap K=128 matmuls run the MXU at ~half
peak (pipeline-latency bound); concatenating 4 taps along K (VPU copy into a
[pixels, 512] staging buffer) and double-buffering the halo DMA are the next
steps.  Mosaic constraints hit on the way: >2-D refs with manual DMA crash
this compiler build (hence the flat form), and bf16 DMA starts/sizes must be
16-row multiples (hence wp rounded to 16).
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
