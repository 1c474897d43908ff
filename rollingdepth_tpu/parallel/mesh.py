"""Device mesh construction.

The reference has NO distributed execution (SURVEY.md §2.3: single hardcoded
cuda device).  Parallelism here is TPU-native by design: a 2-D ICI mesh with
``dp`` (snippet/data parallel — snippets within a dilation pass are
embarrassingly parallel, reference init_snippet_infer loop
rollingdepth_pipeline.py:415-446 has no cross-snippet dependency) and ``tp``
(Megatron-style tensor parallel over attention heads / MLP channels).
Collectives are inserted by XLA GSPMD from sharding annotations — no custom
communication backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def best_mesh_shape(n_devices: int, max_tp: int = 4) -> Tuple[int, int]:
    """Split devices into (dp, tp).

    tp is kept small (heads at the coarsest UNet level = 20 for SD2, and conv
    channel dims bound the useful tp) and must divide the device count; dp
    takes the rest — snippet parallelism scales linearly with zero attention
    traffic between chips (SURVEY.md §5 long-context note).
    """
    tp = 1
    for cand in (4, 2):
        if cand <= max_tp and n_devices % cand == 0 and n_devices >= cand * 2:
            tp = cand
            break
    return n_devices // tp, tp


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = best_mesh_shape(len(devices))
    dp, tp = shape
    if dp * tp != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names)
