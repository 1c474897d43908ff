"""Full-architecture parity: real SD2/SD1.5 configs (channel widths, per-level
head counts, linear-vs-conv projections) at small spatial extent, vs the
vendored torch diffusers with the RollingDepth num_view modification."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rollingdepth_tpu.io.weights import state_dict_to_pytree
from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig


@pytest.mark.parametrize("variant", ["sd21", "sd15"])
def test_fullsize_unet_parity(torch_oracle, variant):
    import torch
    from diffusers import UNet2DConditionModel as TorchUNet

    torch.manual_seed(0)
    if variant == "sd21":
        tunet = TorchUNet(
            sample_size=96, in_channels=8, out_channels=4,
            down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
            block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
            cross_attention_dim=1024, attention_head_dim=(5, 10, 20, 20),
            use_linear_projection=True,
        )
        cfg = UNetConfig.sd21(in_channels=8)
        ctx_dim = 1024
    else:
        tunet = TorchUNet(
            sample_size=64, in_channels=4, out_channels=4,
            down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
            block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
            cross_attention_dim=768, attention_head_dim=8,
            use_linear_projection=False,
        )
        cfg = UNetConfig.sd15(in_channels=4)
        ctx_dim = 768
    tunet.eval()

    ours = UNet2DCondition(cfg)
    params = state_dict_to_pytree(tunet.state_dict())

    rng = np.random.RandomState(0)
    c_in = cfg.in_channels
    n = 2
    x = rng.randn(n, c_in, 16, 16).astype(np.float32)
    ctx = rng.randn(1, 2, ctx_dim).astype(np.float32)
    with torch.no_grad():
        ref = tunet(
            torch.from_numpy(x), torch.tensor([500] * n),
            encoder_hidden_states=torch.from_numpy(ctx), num_view=n,
        ).sample.numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1)).reshape(1, n, 16, 16, c_in)
    out = ours.apply(params, x_j, jnp.asarray([500]), jnp.asarray(ctx), use_flash=False)
    out = np.asarray(out).reshape(n, 16, 16, 4).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


def test_fullsize_vae_parity(torch_oracle):
    import torch
    from diffusers import AutoencoderKL as TorchVAE

    torch.manual_seed(0)
    tvae = TorchVAE(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(128, 256, 512, 512), layers_per_block=2,
        latent_channels=4,
    )
    tvae.eval()
    ours = AutoencoderKL(VAEConfig())
    params = state_dict_to_pytree(tvae.state_dict())

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        moments_ref = tvae.quant_conv(tvae.encoder(torch.from_numpy(x))).numpy()
    moments = ours.encode_moments(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(moments).transpose(0, 3, 1, 2), moments_ref, rtol=1e-3, atol=1e-3
    )

    z = rng.randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        img_ref = tvae.decoder(tvae.post_quant_conv(torch.from_numpy(z))).numpy()
    img = ours.decode(params, jnp.asarray(z.transpose(0, 2, 3, 1)) * 0.18215)
    np.testing.assert_allclose(
        np.asarray(img).transpose(0, 3, 1, 2), img_ref, rtol=1e-3, atol=1e-3
    )
