"""Minimal SD t2i/i2i pipeline tests (tiny models)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.pipelines.stable_diffusion import (
    StableDiffusionImg2ImgPipeline,
    StableDiffusionPipeline,
)
from rollingdepth_tpu.schedulers.dpmsolver import DPMSolverConfig, DPMSolverMultistepScheduler


class FakeTokenizer:
    model_max_length = 7
    bos_token_id = 0
    eos_token_id = 1

    def tokenize_ids(self, text):
        return [2 + (ord(c) % 5) for c in text.replace(" ", "")][:10]


@pytest.fixture(scope="module")
def tiny_sd():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    cfg = dataclasses.replace(UNetConfig.tiny(in_channels=4), cross_attention_dim=16)
    unet = UNet2DCondition(cfg)
    vae = AutoencoderKL(VAEConfig.tiny())
    text_model = CLIPTextModel(CLIPTextConfig.tiny())
    text_params = text_model.init(ks[2])
    sched = DPMSolverMultistepScheduler(DPMSolverConfig(
        beta_start=0.00085, beta_end=0.012, algorithm_type="sde-dpmsolver++",
        use_karras_sigmas=True, steps_offset=1,
    ))
    return StableDiffusionPipeline(
        unet, unet.init(ks[0]), vae, vae.init(ks[1]), sched,
        FakeTokenizer(), lambda ids: text_model.apply(text_params, ids),
        dtype=jnp.float32,
    )


def test_t2i(tiny_sd):
    img = tiny_sd("a scene", height=32, width=32, num_inference_steps=4,
                  guidance_scale=3.0, batch=2, seed=1)
    assert img.shape == (2, 3, 32, 32)
    assert np.isfinite(img).all()


def test_t2i_latents_and_determinism(tiny_sd):
    a = tiny_sd("x", height=32, width=32, num_inference_steps=3, seed=5,
                output_latents=True)
    b = tiny_sd("x", height=32, width=32, num_inference_steps=3, seed=5,
                output_latents=True)
    assert a.shape == (1, 16, 16, 4)  # tiny VAE downsamples by 2
    np.testing.assert_array_equal(a, b)
    c = tiny_sd("x", height=32, width=32, num_inference_steps=3, seed=6,
                output_latents=True)
    assert np.abs(a - c).max() > 1e-4


def test_t2i_init_latents_are_unit_variance(tiny_sd, monkeypatch):
    """DPM-Multistep is VP-parameterized (init_noise_sigma == 1.0): t2i init
    latents must be plain N(0,1), not scaled by the raw Karras sigma (~15-25x)."""
    captured = {}
    orig = tiny_sd._denoise

    def spy(latents, *a, **k):
        captured["std"] = float(jnp.std(latents.astype(jnp.float32)))
        return orig(latents, *a, **k)

    monkeypatch.setattr(tiny_sd, "_denoise", spy)
    tiny_sd("x", height=32, width=32, num_inference_steps=2, seed=3,
            output_latents=True)
    assert 0.7 < captured["std"] < 1.3, captured


def test_img2img(tiny_sd):
    rng = np.random.RandomState(0)
    src = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    i2i = StableDiffusionImg2ImgPipeline(
        tiny_sd.unet, tiny_sd.unet_params, tiny_sd.vae, tiny_sd.vae_params,
        tiny_sd.scheduler, tiny_sd.tokenizer, tiny_sd.text_apply, dtype=jnp.float32,
    )
    out = i2i("restyle", image=src, strength=0.5, num_inference_steps=4, seed=2)
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# torch-oracle parity (VERDICT r2 #9): the vendored diffusers
# StableDiffusionPipeline / Img2ImgPipeline on the same tiny SD1.5
# checkpoint, deterministic dpmsolver++ scheduler, shared init noise
# ---------------------------------------------------------------------------

DET_SCHED = dict(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    algorithm_type="dpmsolver++", use_karras_sigmas=True, steps_offset=1,
)


@pytest.fixture(scope="module")
def sd_pair(torch_oracle, tiny_sd15_checkpoint):
    """(torch components, our pipeline) over the same checkpoint."""
    import torch
    from diffusers import (
        AutoencoderKL as TorchVAE,
        DPMSolverMultistepScheduler as TorchDPM,
        UNet2DConditionModel as TorchUNet,
    )
    from transformers import CLIPTextModel as TorchText, CLIPTokenizer

    ckpt = tiny_sd15_checkpoint
    torch_parts = dict(
        vae=TorchVAE.from_pretrained(ckpt, subfolder="vae").eval(),
        text_encoder=TorchText.from_pretrained(ckpt, subfolder="text_encoder").eval(),
        tokenizer=CLIPTokenizer.from_pretrained(ckpt, subfolder="tokenizer"),
        unet=TorchUNet.from_pretrained(ckpt, subfolder="unet").eval(),
        safety_checker=None, requires_safety_checker=False,
        feature_extractor=None, image_encoder=None,
    )
    torch.set_grad_enabled(False)

    from rollingdepth_tpu.io.pretrained_relight import load_relight_pipeline

    rp = load_relight_pipeline(ckpt, dtype="fp32")
    ours = StableDiffusionPipeline(
        rp.base_unet, rp.base_unet_params, rp.vae, rp.vae_params,
        DPMSolverMultistepScheduler(DPMSolverConfig(beta_schedule="linear", **DET_SCHED)),
        rp.tokenizer, rp.text_apply, dtype=jnp.float32,
    )
    return torch_parts, ours


def test_t2i_latent_parity_vs_torch(sd_pair, monkeypatch):
    import torch
    from diffusers import DPMSolverMultistepScheduler as TorchDPM
    from diffusers import StableDiffusionPipeline as TorchSD
    import diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion as sd_mod

    torch_parts, ours = sd_pair
    pipe = TorchSD(scheduler=TorchDPM(**DET_SCHED), **torch_parts)

    noise = np.random.RandomState(3).randn(1, 4, 16, 16).astype(np.float32)
    monkeypatch.setattr(
        sd_mod, "randn_tensor",
        lambda shape, generator=None, device=None, dtype=None, layout=None:
        torch.from_numpy(noise).to(dtype=dtype or torch.float32),
    )
    ref = pipe(
        prompt="a man doing sports", negative_prompt="lowres, cropped",
        height=32, width=32, num_inference_steps=6, guidance_scale=7.0,
        output_type="latent",
    ).images.numpy()  # [1, 4, 16, 16]

    got = ours(
        "a man doing sports", negative_prompt="lowres, cropped",
        height=32, width=32, num_inference_steps=6, guidance_scale=7.0,
        seed=0, output_latents=True, init_noise=noise,
    ).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_i2i_latent_parity_vs_torch(sd_pair, monkeypatch):
    import torch
    from diffusers import DPMSolverMultistepScheduler as TorchDPM
    from diffusers import StableDiffusionImg2ImgPipeline as TorchI2I
    import diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion_img2img as i2i_mod
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution

    torch_parts, ours = sd_pair
    pipe = TorchI2I(scheduler=TorchDPM(**DET_SCHED), **torch_parts)

    rng = np.random.RandomState(5)
    image = (rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1).round(3)
    noise = rng.randn(1, 4, 16, 16).astype(np.float32)

    # deterministic encode (our side uses the mean latent) + shared noise
    monkeypatch.setattr(
        DiagonalGaussianDistribution, "sample", lambda self, generator=None: self.mode()
    )
    monkeypatch.setattr(
        i2i_mod, "randn_tensor",
        lambda shape, generator=None, device=None, dtype=None, layout=None:
        torch.from_numpy(noise).to(dtype=dtype or torch.float32),
    )
    ref = pipe(
        prompt="relit scene", image=torch.from_numpy(image), strength=0.5,
        num_inference_steps=8, guidance_scale=4.0, output_type="latent",
    ).images.numpy()

    ours_i2i = StableDiffusionImg2ImgPipeline(
        ours.unet, ours.unet_params, ours.vae, ours.vae_params, ours.scheduler,
        ours.tokenizer, ours.text_apply, dtype=jnp.float32,
    )
    got = ours_i2i(
        "relit scene", image=image, strength=0.5, num_inference_steps=8,
        guidance_scale=4.0, seed=0, output_latents=True, init_noise=noise,
    ).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)
