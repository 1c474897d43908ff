"""W8A8 quantized serving mode (ops/quant.py).

No parity target exists (the reference has no quantized path); these tests
pin the quantization math exactly and bound the end-to-end drift of a
quantized UNet against its own fp32 forward.
"""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from rollingdepth_tpu.models import layers as L
from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.ops.quant import (
    quantize_activation,
    quantize_conv_params,
    quantize_linear_params,
    quantize_unet_params,
)


def test_linear_quant_semantics():
    """The dispatching L.linear reproduces the documented dequant math."""
    r = np.random.RandomState(0)
    p = {
        "kernel": jnp.asarray(r.randn(16, 24), jnp.float32),
        "bias": jnp.asarray(r.randn(24), jnp.float32),
    }
    x = jnp.asarray(r.randn(4, 7, 16), jnp.float32)
    qp = quantize_linear_params(p)
    assert qp["kernel_q"].dtype == jnp.int8
    assert qp["w_scale"].shape == (24,)

    got = np.asarray(L.linear(qp, x))
    xq, sx = quantize_activation(x)
    manual = (
        np.asarray(xq, np.int32).reshape(-1, 16) @ np.asarray(qp["kernel_q"], np.int32)
    ).reshape(4, 7, 24)
    manual = manual * (np.asarray(sx) * np.asarray(qp["w_scale"])) + np.asarray(p["bias"])
    np.testing.assert_allclose(got, manual.astype(np.float32), rtol=1e-6, atol=1e-5)

    # quantization error itself is bounded by the int8 grid
    ref = np.asarray(L.linear(p, x))
    assert np.abs(got - ref).max() < 0.15 * np.abs(ref).max()


def test_conv_quant_semantics():
    r = np.random.RandomState(1)
    p = {
        "kernel": jnp.asarray(r.randn(3, 3, 8, 12) * 0.2, jnp.float32),
        "bias": jnp.asarray(r.randn(12) * 0.1, jnp.float32),
    }
    x = jnp.asarray(r.randn(2, 9, 9, 8), jnp.float32)
    qp = quantize_conv_params(p)
    assert qp["kernel_q"].shape == (3, 3, 8, 12) and qp["w_scale"].shape == (12,)
    got = np.asarray(L.conv2d(qp, x, padding=1))
    ref = np.asarray(L.conv2d(p, x, padding=1))
    assert got.shape == ref.shape
    # per-channel weight + per-tensor activation int8: a few % of range
    assert np.abs(got - ref).max() < 0.1 * np.abs(ref).max()

    # symmetric grid: quantizing -x gives exactly -q(x)
    gq, _ = quantize_activation(x)
    ngq, _ = quantize_activation(-x)
    np.testing.assert_array_equal(np.asarray(gq), -np.asarray(ngq))


def test_quantized_unet_drift_bounded():
    """Full tiny-UNet forward: W8A8 output stays tightly correlated with the
    fp32 forward (structure-only transform, conv_in/out + temb untouched)."""
    cfg = UNetConfig.tiny(in_channels=8)
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(0))
    qparams = quantize_unet_params(params)

    # untouched layers keep their fp kernels
    assert "kernel" in qparams["conv_in"] and "kernel" in qparams["conv_out"]
    assert "kernel" in qparams["time_embedding"]["linear_1"]
    # quantized layers carry int8 kernels
    assert qparams["down_blocks"][0]["resnets"][0]["conv1"]["kernel_q"].dtype == jnp.int8

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16, 8), jnp.float32)
    t = jnp.asarray([500.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8), jnp.float32)

    ref = np.asarray(unet.apply(params, x, t, ctx)).ravel()
    got = np.asarray(unet.apply(qparams, x, t, ctx)).ravel()
    assert np.isfinite(got).all()
    corr = np.corrcoef(ref, got)[0, 1]
    rel_rms = np.sqrt(((got - ref) ** 2).mean()) / (ref.std() + 1e-12)
    assert corr > 0.99, f"quantized UNet decorrelated: corr={corr}"
    assert rel_rms < 0.1, f"quantized UNet drift too large: rel_rms={rel_rms}"


def test_quantized_unet_sd15_shape():
    """SD1.5-style config (conv proj_in/out instead of linear) quantizes and
    runs — covers the 1x1-conv branch of _quantize_transformer2d."""
    cfg = UNetConfig.tiny(in_channels=12)
    cfg = type(cfg)(**{**cfg.__dict__, "use_linear_projection": False})
    unet = UNet2DCondition(cfg)
    params = unet.init(jax.random.PRNGKey(3))
    qparams = quantize_unet_params(params)
    t2d = qparams["down_blocks"][0]["attentions"][0]
    assert t2d["proj_in"]["kernel_q"].ndim == 4  # 1x1 conv path
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 16, 16, 12), jnp.float32)
    out = unet.apply(qparams, x, jnp.asarray([10.0]), jnp.zeros((1, 2, 8)))
    assert out.shape == (1, 3, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_quantized_pipeline_close_to_fp32():
    """Depth pipeline with a W8A8 UNet: finite, close to the fp32 pipeline
    (VAE + aligner untouched, so drift enters only through the denoise)."""
    from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
    from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline
    from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler

    unet = UNet2DCondition(UNetConfig.tiny(in_channels=8))
    vae = AutoencoderKL(VAEConfig.tiny())
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    unet_params = unet.init(k1)
    vae_params = vae.init(k2)
    text = jax.random.normal(k3, (1, 2, 8), dtype=jnp.float32)
    sched = DDIMScheduler(DDIMConfig(
        beta_schedule="scaled_linear", timestep_spacing="trailing",
        prediction_type="epsilon",
    ))

    rng = np.random.RandomState(0)
    frames = rng.rand(8, 3, 32, 32).astype(np.float32) * 2 - 1

    ref_pipe = RollingDepthPipeline(
        unet, unet_params, vae, vae_params, sched, text,
        dtype=jnp.float32, snippet_batch=4,
    )
    q_pipe = RollingDepthPipeline(
        unet, quantize_unet_params(unet_params), vae, vae_params, sched, text,
        dtype=jnp.float32, snippet_batch=4,
    )
    # int8 kernels and fp32 scales must survive the pipeline's dtype cast
    qp = q_pipe.unet_params["down_blocks"][0]["resnets"][0]["conv1"]
    assert qp["kernel_q"].dtype == jnp.int8
    assert qp["w_scale"].dtype == jnp.float32

    ref = ref_pipe.forward(frames, dilations=[1], seed=0).depth_pred
    got = q_pipe.forward(frames, dilations=[1], seed=0).depth_pred
    assert got.shape == ref.shape
    assert np.isfinite(got).all()
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(got).ravel())[0, 1]
    assert corr > 0.95, f"quantized pipeline decorrelated: corr={corr}"
