"""Compiled-HLO evidence for the scaling design (SURVEY §2.3 / doc/architecture.md).

The dp sharding claim — "chips work on disjoint snippets with no
communication" (pipelines/rollingdepth.py:_infer_snippets) — is asserted
here against the OPTIMIZED HLO of the actual production denoise program,
not a toy: on a dp-only mesh the compiled module must contain zero
cross-chip collectives (so dp=k is linear up to the snippet count, which
is why BASELINE.md projects the 5x target from dp=2), while the Megatron
tp path must show the expected psum all-reduces (positive control: proves
the probe can see collectives at all).
"""

import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.slow

from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.parallel.mesh import make_mesh
from rollingdepth_tpu.parallel.sharding import shard_params
from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline
from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler

COLLECTIVES = re.compile(
    r"all-reduce|all-gather|collective-permute|all-to-all|reduce-scatter"
)


def _build(mesh):
    unet = UNet2DCondition(UNetConfig.tiny(in_channels=8))
    vae = AutoencoderKL(VAEConfig.tiny())
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    sched = DDIMScheduler(
        DDIMConfig(beta_schedule="scaled_linear", timestep_spacing="trailing")
    )
    return RollingDepthPipeline(
        unet, unet.init(k1), vae, vae.init(k2), sched,
        jax.random.normal(k3, (1, 2, 8)), dtype=jnp.float32,
        snippet_batch=2, mesh=mesh,
    )


def _denoise_hlo(pipe, mesh, dp):
    """Optimized HLO text of the production snippet-denoise chunk program."""
    sb, n, h, w, cap, scap = 2, 3, 4, 4, 16, 8
    fn = pipe._infer_program((h, w, 4), n, sb, dp, 1, cap, scap)
    repl = NamedSharding(mesh, P())
    src = jax.device_put(jnp.zeros((cap, h, w, 4), jnp.float32), repl)
    idx = jnp.zeros((scap, n), jnp.int32)
    noise = jnp.zeros((h, w, 4), jnp.float32)
    ts = jnp.asarray(pipe.scheduler.timesteps(1))
    lowered = fn.lower(
        pipe.unet_params, pipe.empty_text_embed, src, idx, noise, ts, 1
    )
    return lowered.compile().as_text()


def test_dp_denoise_program_has_zero_collectives():
    mesh = make_mesh(shape=(4, 2))
    pipe = _build(mesh)
    pipe.unet_params = jax.device_put(
        pipe.unet_params, NamedSharding(mesh, P())
    )
    txt = _denoise_hlo(pipe, mesh, dp=4)
    found = COLLECTIVES.findall(txt)
    assert found == [], (
        f"dp-sharded denoise program compiled {len(found)} collectives "
        f"({sorted(set(found))}) — the no-communication dp design is broken"
    )


def test_tp_denoise_program_has_megatron_allreduces():
    """Positive control: the same probe on the tp path MUST see psums —
    otherwise the zero-collective assertion above could be vacuous."""
    mesh = make_mesh(shape=(2, 4))
    pipe = _build(mesh)
    pipe.unet_params = shard_params(pipe.unet_params, mesh)
    txt = _denoise_hlo(pipe, mesh, dp=2)
    found = COLLECTIVES.findall(txt)
    assert "all-reduce" in found, (
        "tp-sharded denoise program shows no all-reduce — either the "
        "Megatron split fell back to replication or the probe is blind"
    )
