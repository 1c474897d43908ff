"""Multi-host (DCN) scale-out: clip-level sharding across host groups.

The reference is strictly single-device (SURVEY.md §2.3).  The TPU-native
scale-out story has two tiers:

1. WITHIN a host's ICI domain: the (dp, tp) mesh of parallel/mesh.py —
   snippets shard over ``dp``, attention/MLP projections over ``tp``; all
   collectives ride ICI.
2. ACROSS hosts over DCN: video clips are embarrassingly parallel (the CLI
   loops independent videos, reference run_video.py:550-585), so the right
   DCN strategy is NO cross-host collectives at all — each host group runs
   its own pipeline instance on its ICI-local mesh and processes a disjoint
   slice of the video list.  DCN is touched only by checkpoint broadcast at
   startup (handled by jax.distributed + the runtime) and final result
   gathering on the filesystem.

This module provides the host-side plumbing for tier 2; it degrades to
no-ops in single-process runs so the CLI uses it unconditionally.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

from .mesh import best_mesh_shape, make_mesh

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (no-op without arguments on
    single-host; TPU pods auto-discover via the environment)."""
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as exc:  # single-process / already initialized
            logger.debug("jax.distributed.initialize skipped: %s", exc)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_mesh(shape: Optional[Tuple[int, int]] = None) -> Mesh:
    """(dp, tp) mesh over THIS process's addressable devices only.

    Cross-host work is clip-parallel (see module docstring), so each host
    group builds its mesh from local devices and XLA never emits a DCN
    collective for the pipeline."""
    devices = jax.local_devices()
    if shape is None:
        shape = best_mesh_shape(len(devices))
    return make_mesh(devices=devices, shape=shape)


def shard_work(
    items: Sequence, process_id: Optional[int] = None, num_processes: Optional[int] = None
) -> List:
    """Disjoint, deterministic slice of ``items`` for this host (round-robin
    so heterogeneous clip lengths balance).  Identity in single-process runs."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [item for i, item in enumerate(items) if i % n == pid]


def is_primary_host(process_id: Optional[int] = None) -> bool:
    """True on the process that should write shared outputs / logs."""
    return (jax.process_index() if process_id is None else process_id) == 0
