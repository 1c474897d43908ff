"""UNet parity vs the vendored torch diffusers *with the RollingDepth
cross-frame attention modification* (the `num_view` path,
/root/reference/diffusers/src/diffusers/models/attention_processor.py:
1989-2050)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.io.weights import state_dict_to_pytree
from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig


def _make_pair(torch_seed=0, use_linear_projection=True, in_channels=8):
    import torch
    from diffusers import UNet2DConditionModel as TorchUNet

    torch.manual_seed(torch_seed)
    tunet = TorchUNet(
        sample_size=8,
        in_channels=in_channels,
        out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        cross_attention_dim=8,
        attention_head_dim=2,
        norm_num_groups=4,
        use_linear_projection=use_linear_projection,
    )
    tunet.eval()
    cfg = UNetConfig.tiny(in_channels=in_channels)
    if not use_linear_projection:
        cfg = UNetConfig(
            **{**cfg.__dict__, "use_linear_projection": False}
        )
    ours = UNet2DCondition(cfg)
    params = state_dict_to_pytree(tunet.state_dict())
    return tunet, ours, params


@pytest.mark.parametrize("use_linear_projection", [True, False])
@pytest.mark.parametrize("num_view", [1, 3])
def test_unet_num_view_parity(torch_oracle, use_linear_projection, num_view):
    import torch

    tunet, ours, params = _make_pair(use_linear_projection=use_linear_projection)
    rng = np.random.RandomState(0)
    # the reference AttnProcessor2_0 cross-attn path only supports one
    # snippet per call (B=1 assumption baked into its rearranges); our
    # framework batches snippets, verified separately below.
    s = 1
    x = rng.randn(s * num_view, 8, 8, 8).astype(np.float32)  # [(s n), C, h, w]
    t = 10
    ctx = rng.randn(1, 2, 8).astype(np.float32)

    with torch.no_grad():
        ref = tunet(
            torch.from_numpy(x),
            torch.tensor([t] * (s * num_view)),
            encoder_hidden_states=torch.from_numpy(ctx),
            num_view=num_view,
        ).sample.numpy()

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1)).reshape(s, num_view, 8, 8, 8)
    out = ours.apply(params, x_j, jnp.full((s,), t), jnp.asarray(ctx), use_flash=False)
    out = np.asarray(out).reshape(s * num_view, 8, 8, 4).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_unet_cross_frame_coupling(torch_oracle):
    """Frames of one snippet must influence each other (joint attention);
    different snippets must not."""
    _, ours, params = _make_pair()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 8, 8, 8).astype(np.float32)
    ctx = jnp.asarray(rng.randn(1, 2, 8).astype(np.float32))

    base = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray([10]), ctx, use_flash=False))
    x2 = x.copy()
    x2[0, 2] += 1.0  # perturb only frame 2
    out2 = np.asarray(ours.apply(params, jnp.asarray(x2), jnp.asarray([10]), ctx, use_flash=False))
    # frame 0 must change (cross-frame attention couples the snippet)
    assert np.abs(out2[0, 0] - base[0, 0]).max() > 1e-6

    # two independent snippets: identical content -> identical outputs
    xx = np.concatenate([x, x2], axis=0)
    out_batch = np.asarray(ours.apply(params, jnp.asarray(xx), jnp.asarray([10, 10]), ctx, use_flash=False))
    np.testing.assert_allclose(out_batch[0], base[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_batch[1], out2[0], rtol=1e-5, atol=1e-5)


def test_unet_12ch_conv_in(torch_oracle):
    """IC-Light relighting uses a 12-channel conv_in
    (/root/reference/rollingdepth/rollingimg_pipeline.py:1068-1074)."""
    import torch

    tunet, ours, params = _make_pair(in_channels=12)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 12, 8, 8).astype(np.float32)
    ctx = rng.randn(1, 2, 8).astype(np.float32)
    with torch.no_grad():
        ref = tunet(
            torch.from_numpy(x), torch.tensor([500, 500]),
            encoder_hidden_states=torch.from_numpy(ctx), num_view=2,
        ).sample.numpy()  # one snippet of 2 frames (B=1 in reference terms)
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1)).reshape(1, 2, 8, 8, 12)
    out = ours.apply(params, x_j, jnp.asarray([500]), jnp.asarray(ctx), use_flash=False)
    out = np.asarray(out).reshape(2, 8, 8, 4).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_unet_odd_spatial_dims(torch_oracle):
    """Odd latent sizes exercise the upsample-to-skip-size path
    (unet_2d_condition.py forward_upsample_size)."""
    import torch

    tunet, ours, params = _make_pair()
    rng = np.random.RandomState(3)
    x = rng.randn(3, 8, 9, 13).astype(np.float32)
    ctx = rng.randn(1, 2, 8).astype(np.float32)
    with torch.no_grad():
        ref = tunet(
            torch.from_numpy(x), torch.tensor([100] * 3),
            encoder_hidden_states=torch.from_numpy(ctx), num_view=3,
        ).sample.numpy()
    x_j = jnp.asarray(x.transpose(0, 2, 3, 1)).reshape(1, 3, 9, 13, 8)
    out = ours.apply(params, x_j, jnp.asarray([100]), jnp.asarray(ctx), use_flash=False)
    out = np.asarray(out).reshape(3, 9, 13, 4).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
