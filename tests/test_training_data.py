"""Training data pipeline: clips -> snippet latent pair batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler
from rollingdepth_tpu.training import (
    TrainConfig, init_train_state, make_lr_schedule, make_train_step,
)
from rollingdepth_tpu.training_data import SnippetDataConfig, SnippetLatentDataset


@pytest.fixture(scope="module")
def tiny_vae_encode():
    vae = AutoencoderKL(VAEConfig.tiny())
    params = vae.init(jax.random.PRNGKey(1))
    return lambda frames: vae.encode_mean(params, jnp.asarray(frames))


def _clips(n_clips=2, frames=10, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    rgb = [rng.rand(frames, 3, h, w).astype(np.float32) * 2 - 1 for _ in range(n_clips)]
    dep = [rng.rand(frames, 1, h, w).astype(np.float32) * 2 - 1 for _ in range(n_clips)]
    return rgb, dep


def test_dataset_windows_and_batches(tiny_vae_encode):
    rgb, dep = _clips()
    ds = SnippetLatentDataset(
        tiny_vae_encode, rgb, dep,
        SnippetDataConfig(snippet_len=3, dilations=(1, 2), cap_dilation=False,
                          batch_size=4, seed=7),
    )
    # windows: per clip d=1 -> 8, d=2 -> 6; 2 clips -> 28
    assert len(ds) == 28
    assert ds.steps_per_epoch() == 7
    batches = list(ds.epoch(0))
    assert len(batches) == 7
    b = batches[0]
    assert b["rgb_latent"].shape == (4, 3, 8, 8, 4)  # tiny VAE factor 2
    assert b["depth_latent"].shape == (4, 3, 8, 8, 4)
    # epoch order is a pure function of (seed, epoch)
    a0 = np.asarray(list(ds.epoch(0))[0]["rgb_latent"])
    a0b = np.asarray(list(ds.epoch(0))[0]["rgb_latent"])
    a1 = np.asarray(list(ds.epoch(1))[0]["rgb_latent"])
    np.testing.assert_array_equal(a0, a0b)
    assert np.abs(a0 - a1).max() > 0  # different epoch, different shuffle


@pytest.mark.slow
def test_train_loop_over_dataset(tiny_vae_encode):
    """Two steps of the real train step over real dataset batches."""
    rgb, dep = _clips(frames=8)
    ds = SnippetLatentDataset(
        tiny_vae_encode, rgb, dep,
        SnippetDataConfig(snippet_len=3, dilations=(1,), cap_dilation=True,
                          batch_size=2, seed=3),
    )
    ucfg = UNetConfig.tiny(in_channels=8)
    unet = UNet2DCondition(ucfg)
    tcfg = TrainConfig(lr_schedule="cosine", warmup_steps=2, total_steps=10)
    step = jax.jit(make_train_step(ucfg, DDIMScheduler(DDIMConfig()), tcfg))
    state = init_train_state(unet.init(jax.random.PRNGKey(0)), tcfg)
    text = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 8))
    losses = []
    for i, batch in enumerate(ds.epoch(0)):
        batch = dict(batch, text_embed=text)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        if i == 1:
            break
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert int(state.step) == 2


def test_lr_schedules():
    const = make_lr_schedule(TrainConfig())
    assert const == 3e-5
    cos = make_lr_schedule(TrainConfig(lr_schedule="cosine", warmup_steps=10,
                                       total_steps=100))
    assert float(cos(0)) == 0.0
    assert float(cos(10)) == pytest.approx(3e-5)
    assert float(cos(100)) < 1e-6
