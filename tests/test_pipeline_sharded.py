"""Sharded snippet inference: dp-sharded pipeline must equal single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.parallel.mesh import make_mesh
from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline
from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler


def _build(mesh=None):
    unet = UNet2DCondition(UNetConfig.tiny(in_channels=8))
    vae = AutoencoderKL(VAEConfig.tiny())
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    sched = DDIMScheduler(DDIMConfig(beta_schedule="scaled_linear", timestep_spacing="trailing"))
    return RollingDepthPipeline(
        unet, unet.init(k1), vae, vae.init(k2), sched,
        jax.random.normal(k3, (1, 2, 8)), dtype=jnp.float32,
        snippet_batch=2, mesh=mesh,
    )


def test_dp_sharded_matches_single_device():
    frames = np.random.RandomState(0).rand(10, 3, 32, 32).astype(np.float32) * 2 - 1

    single = _build(mesh=None)
    out_single = single.forward(frames, dilations=[1, 2], seed=3)

    mesh = make_mesh(shape=(4, 2))
    sharded = _build(mesh=mesh)
    out_sharded = sharded.forward(frames, dilations=[1, 2], seed=3)

    # raw snippet predictions: tight tolerance (only XLA fusion-order noise
    # between shard_map and lax.map)
    for a, b in zip(out_single.snippet_ls, out_sharded.snippet_ls):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # post-alignment: the 2000-step L1-Adam solve amplifies float-order
    # differences (sign flips at near-zero residuals), so compare loosely
    np.testing.assert_allclose(
        out_single.depth_pred, out_sharded.depth_pred, rtol=5e-3, atol=5e-3
    )


def test_dp_sharded_refine_matches_single_device():
    frames = np.random.RandomState(1).rand(8, 3, 32, 32).astype(np.float32) * 2 - 1
    kwargs = dict(dilations=[1], refine_step=2, refine_snippet_len=3,
                  refine_start_dilation=2, seed=4)

    out_single = _build(mesh=None).forward(frames, **kwargs)
    out_sharded = _build(mesh=make_mesh(shape=(4, 2))).forward(frames, **kwargs)
    np.testing.assert_allclose(
        out_single.depth_pred, out_sharded.depth_pred, rtol=5e-3, atol=5e-3
    )


def test_tp_sharded_inference_matches_single_device():
    """dp+tp inference: Megatron-split attention/MLP params (GSPMD-managed
    tp axis inside the dp shard_map) must reproduce single-device outputs."""
    from rollingdepth_tpu.parallel.sharding import shard_params

    frames = np.random.RandomState(2).rand(8, 3, 32, 32).astype(np.float32) * 2 - 1

    single = _build(mesh=None)
    out_single = single.forward(frames, dilations=[1, 2], seed=7)

    mesh = make_mesh(shape=(2, 4))  # tp=4: tiny UNet inner dims divisible
    sharded = _build(mesh=mesh)
    sharded.unet_params = shard_params(sharded.unet_params, mesh)
    out_sharded = sharded.forward(frames, dilations=[1, 2], seed=7)

    for a, b in zip(out_single.snippet_ls, out_sharded.snippet_ls):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        out_single.depth_pred, out_sharded.depth_pred, rtol=5e-3, atol=5e-3
    )
