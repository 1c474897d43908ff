"""Device-generated random parameters for throughput benchmarking.

The real initializers (models/layers.py) sample with a host-side numpy RNG
to match torch's init layer-for-layer — correct for parity tests, but it
means ~GBs of host->device parameter upload.  Over a narrow dev transport
(the axon tunnel measures single-digit MB/s on bad days) that turns a
throughput benchmark's setup into tens of minutes.

Throughput is weight-independent, so the bench generates parameters ON
DEVICE: the structure/shapes come from a host template built on the CPU
backend (zero upload), then ONE jitted program samples every leaf with
jax.random — biases zero, norm scales one, everything else a small normal —
keeping activations bounded through GroupNorm/softmax stacks.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _leaf_kind(path) -> str:
    name = ""
    for p in reversed(path):
        if hasattr(p, "key"):
            name = str(p.key)
            break
    if name in ("bias",):
        return "zeros"
    if name in ("scale",):
        return "ones"
    return "normal"


def device_random_params(
    template_fn: Callable[[], Any],
    key: jax.Array,
    dtype=jnp.bfloat16,
    stddev: float = 0.02,
):
    """Random params with the same pytree/shapes as ``template_fn()``.

    ``template_fn`` runs on the CPU backend (cheap, no device upload); the
    returned tree is produced by a single jitted device program.
    """
    with jax.default_device(jax.devices("cpu")[0]):
        template = template_fn()
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    kinds = [_leaf_kind(path) for path, _ in flat]
    shapes = [leaf.shape for _, leaf in flat]

    @jax.jit
    def make(key):
        keys = jax.random.split(key, len(shapes))
        leaves = []
        for k, kind, shape in zip(keys, kinds, shapes):
            if kind == "zeros":
                leaves.append(jnp.zeros(shape, dtype))
            elif kind == "ones":
                leaves.append(jnp.ones(shape, dtype))
            else:
                leaves.append(stddev * jax.random.normal(k, shape, dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return make(key)
