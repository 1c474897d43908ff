"""VAE parity vs the vendored torch diffusers (tiny random configs, diffusers
test idiom: /root/reference/diffusers/tests/models/test_modeling_common.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.io.weights import state_dict_to_pytree


@pytest.fixture(scope="module")
def tiny_pair(torch_oracle):
    import torch
    from diffusers import AutoencoderKL as TorchVAE

    torch.manual_seed(0)
    tvae = TorchVAE(
        in_channels=3,
        out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        latent_channels=4,
        norm_num_groups=4,
    )
    tvae.eval()
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)
    ours = AutoencoderKL(cfg)
    params = state_dict_to_pytree(tvae.state_dict())
    return tvae, ours, params


def test_vae_encode_parity(tiny_pair):
    import torch

    tvae, ours, params = tiny_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        h = tvae.encoder(torch.from_numpy(x))
        moments_ref = tvae.quant_conv(h).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    moments = ours.encode_moments(params, x_nhwc)
    moments = np.asarray(moments).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(moments, moments_ref, rtol=1e-4, atol=1e-4)


def test_vae_decode_parity(tiny_pair):
    import torch

    tvae, ours, params = tiny_pair
    rng = np.random.RandomState(1)
    z = rng.randn(2, 4, 8, 8).astype(np.float32)

    with torch.no_grad():
        zz = tvae.post_quant_conv(torch.from_numpy(z))
        img_ref = tvae.decoder(zz).numpy()

    # ours.decode includes the 1/scaling_factor — pre-scale to cancel it
    z_nhwc = jnp.asarray(z.transpose(0, 2, 3, 1)) * ours.config.scaling_factor
    img = np.asarray(ours.decode(params, z_nhwc)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(img, img_ref, rtol=1e-4, atol=1e-4)


def test_vae_encode_mean_scaling(tiny_pair):
    import torch

    tvae, ours, params = tiny_pair
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        h = tvae.encoder(torch.from_numpy(x))
        moments = tvae.quant_conv(h)
        mean, _ = torch.chunk(moments, 2, dim=1)
        ref = (mean * 0.18215).numpy()
    out = ours.encode_mean(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)


def test_vae_odd_spatial_dims(tiny_pair):
    """Asymmetric downsample padding must match torch for odd sizes."""
    import torch

    tvae, ours, params = tiny_pair
    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 30, 42).astype(np.float32)
    with torch.no_grad():
        ref = tvae.quant_conv(tvae.encoder(torch.from_numpy(x))).numpy()
    out = ours.encode_moments(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)


def test_folded_upsample_conv_matches_explicit():
    """The parity-decomposed upsample+conv (layers.upsample_nearest_conv 2x
    path) must equal explicit nearest-2x followed by conv3x3(pad=1)."""
    import jax
    import jax.numpy as jnp

    from rollingdepth_tpu.models import layers as L

    for h, w, ci, co in [(5, 7, 8, 16), (8, 8, 16, 8), (3, 4, 4, 4)]:
        p = L.conv2d_init(jax.random.PRNGKey(h * w), ci, co, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, ci))
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = L.conv2d(p, up, padding=1)
        got = L.upsample_nearest_conv(p, x)
        assert got.shape == ref.shape
        assert float(jnp.abs(ref - got).max()) < 1e-5
