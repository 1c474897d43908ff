"""Converted-checkpoint caching: torch->pytree conversion runs once, then
params load from a flat .npz (orders of magnitude faster than re-translating
the torch state dict, and it skips torch entirely on reload).
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

Params = Dict[str, Any]
_SEP = "//"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    root: Dict[Any, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for part in parts[:-1]:
            k = int(part[1:]) if part.startswith("#") else part
            node = node.setdefault(k, {})
        last = parts[-1]
        node[int(last[1:]) if last.startswith("#") else last] = value

    def listify(n):
        if isinstance(n, dict):
            if n and all(isinstance(k, int) for k in n):
                return [listify(n[i]) for i in sorted(n)]
            return {k: listify(v) for k, v in n.items()}
        return n

    return listify(root)


def save_params(params: Params, path: str) -> None:
    flat = _flatten(params)
    # bf16 is not npz-native; store raw bits + dtype tag
    arrays, meta = {}, {}
    for k, v in flat.items():
        if v.dtype == jnp.bfloat16:
            arrays[k] = v.view(np.uint16)
            meta[k] = "bfloat16"
        else:
            arrays[k] = v
            meta[k] = str(v.dtype)
    arrays["__meta_keys__"] = np.array(list(meta.keys()))
    arrays["__meta_vals__"] = np.array(list(meta.values()))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_params(path: str, dtype=None) -> Params:
    with np.load(path, allow_pickle=False) as data:
        meta = dict(zip(data["__meta_keys__"].tolist(), data["__meta_vals__"].tolist()))
        flat = {}
        for k, tag in meta.items():
            arr = data[k]
            if tag == "bfloat16":
                arr = arr.view(jnp.bfloat16)
            flat[k] = jnp.asarray(arr, dtype=dtype) if dtype is not None else jnp.asarray(arr)
    return _unflatten(flat)


# bump whenever the torch->pytree CONVERSION format changes (param naming,
# tensor layout, splits) — cached pytrees from an older converter must not
# load into newer model code (e.g. v2: GEGLU proj split into proj_h/proj_gate)
CONVERSION_FORMAT_VERSION = 2


def cache_path(checkpoint_dir: str, subfolder: str, dtype,
               variant: str = "", extra_files=()) -> str:
    """Cache file keyed by (path, subfolder, dtype, converter version) AND
    the source weight files' size+mtime, so both weights replaced in place
    and converter format changes invalidate the cache.

    ``variant`` names a derived conversion of the same subfolder (e.g. the
    IC-Light offset-merged 12-ch UNet); ``extra_files`` are additional
    inputs (e.g. the offset safetensors) whose size+mtime key the cache."""
    key = (
        f"{os.path.abspath(checkpoint_dir)}:{subfolder}:{variant}:{dtype}"
        f":v{CONVERSION_FORMAT_VERSION}"
    )
    sub = os.path.join(checkpoint_dir, subfolder)
    if os.path.isdir(sub):
        for name in sorted(os.listdir(sub)):
            if name.endswith((".safetensors", ".bin", ".pt", ".pth", ".ckpt")):
                st = os.stat(os.path.join(sub, name))
                key += f":{name}:{st.st_size}:{st.st_mtime_ns}"
    for path in extra_files:
        if path and os.path.exists(path):
            st = os.stat(path)
            key += f":{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"
    tag = hashlib.sha1(key.encode()).hexdigest()[:12]
    return os.path.join(
        checkpoint_dir, ".jax_cache", f"{subfolder}{variant}_{tag}.npz"
    )
