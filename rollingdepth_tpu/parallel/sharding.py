"""Sharding rules: map model pytrees to PartitionSpecs on a ("dp","tp") mesh.

Megatron-style tensor parallelism for the transformer blocks — qkv and
feed-forward in-projections column-sharded over ``tp``, out-projections
row-sharded (XLA inserts the psum) — and snippet/data parallelism over
``dp``.  Convolutional params stay replicated: GroupNorm between convs needs
full channels anyway, and conv FLOPs are already balanced by the dp axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# "proj_h"/"proj_gate" are the GEGLU value/gate halves (models/layers.py
# geglu_ff) — separate params so each is a plain column-parallel matmul and
# the elementwise gating stays shard-local; the ff "out" linear is the
# matching row-parallel projection (psum inserted by GSPMD).
COLUMN_PARALLEL = (
    "to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1",
    "proj_h", "proj_gate",
)
ROW_PARALLEL = ("to_out", "out_proj", "fc2", "out")


def _path_names(path) -> list:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
    return names


def unet_param_sharding(params: Dict[str, Any], mesh: Mesh, tp_axis: str = "tp"):
    """PartitionSpec pytree for UNet/CLIP-style params.

    Attention, (CLIP) MLP, and GEGLU feed-forward projections are
    tp-sharded; convs/norms stay replicated (GroupNorm between convs needs
    full channels, and conv FLOPs are balanced by the dp axis).
    """

    def spec_for(path, leaf):
        names = _path_names(path)
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in COLUMN_PARALLEL:
            # W8A8 trees carry kernel_q (same [in, out] layout) + a per-out
            # w_scale — shard them along the same output axis as the fp path
            if leaf_name in ("kernel", "kernel_q") and leaf.ndim == 2 and leaf.shape[1] % mesh.shape[tp_axis] == 0:
                return NamedSharding(mesh, P(None, tp_axis))
            if leaf_name in ("bias", "w_scale") and leaf.shape[0] % mesh.shape[tp_axis] == 0:
                return NamedSharding(mesh, P(tp_axis))
        if parent in ROW_PARALLEL:
            # kernel_q row-shards like kernel; the per-OUT w_scale and bias
            # stay replicated (the out axis is full on every shard)
            if leaf_name in ("kernel", "kernel_q") and leaf.ndim == 2 and leaf.shape[0] % mesh.shape[tp_axis] == 0:
                return NamedSharding(mesh, P(tp_axis, None))
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per unet_param_sharding."""
    shardings = unet_param_sharding(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, batch_axis: str = "dp") -> NamedSharding:
    """Batch arrays: leading (snippet) axis over dp, rest replicated."""
    return NamedSharding(mesh, P(batch_axis))
