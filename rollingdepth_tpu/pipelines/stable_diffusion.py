"""Minimal Stable Diffusion text-to-image / image-to-image pipelines.

Behavioral reference: the relight pipeline instantiates
``StableDiffusionPipeline`` (t2i) and ``StableDiffusionImg2ImgPipeline``
(i2i) over its SD1.5 components
(/root/reference/rollingdepth/rollingimg_pipeline.py:165-187); they produce
the precomputed init latents (the missing ``t2i_latents_8090.pt`` blob) and
back the commented-out highres regeneration path (:1508-1616).  This is the
TPU-native equivalent: classifier-free guidance, strength-skip img2img, and
the same chunked prompt encoding — denoising as one ``lax.scan``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet import UNet2DCondition, unet_apply
from ..models.vae import AutoencoderKL
from ..schedulers.dpmsolver import DPMSolverMultistepScheduler, DPMState
from .rollingimg import encode_prompt_pair

Params = Dict[str, Any]


class StableDiffusionPipeline:
    """Text-to-image (and image-to-image via ``strength < 1``)."""

    def __init__(
        self,
        unet: UNet2DCondition,  # 4-channel base UNet
        unet_params: Params,
        vae: AutoencoderKL,
        vae_params: Params,
        scheduler: DPMSolverMultistepScheduler,
        tokenizer,
        text_apply,
        dtype=jnp.bfloat16,
    ):
        self.unet = unet
        self.vae = vae
        self.scheduler = scheduler
        self.tokenizer = tokenizer
        self.text_apply = text_apply
        self.dtype = dtype
        cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dtype), t)
        self.unet_params = cast(unet_params)
        self.vae_params = cast(vae_params)
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    def _embed(self, prompt: str, negative_prompt: str, batch: int):
        # chunk-balanced [1, 77*k, D] pair (shared with the relight path)
        c, uc = encode_prompt_pair(self.tokenizer, self.text_apply, prompt, negative_prompt)
        c = jnp.broadcast_to(c, (batch,) + c.shape[1:])
        uc = jnp.broadcast_to(uc, (batch,) + uc.shape[1:])
        return c.astype(self.dtype), uc.astype(self.dtype)

    def _denoise(
        self,
        latents: jnp.ndarray,  # [B, h, w, 4]
        cond: jnp.ndarray,
        uncond: jnp.ndarray,
        timesteps: np.ndarray,
        sigmas: np.ndarray,
        begin_index: int,
        num_steps: int,
        guidance_scale: float,
        seed: int,
        return_intermediate_at: Optional[int] = None,
    ) -> jnp.ndarray:
        b, h, w, _ = latents.shape
        n_run = len(timesteps)
        key = ("denoise", latents.shape, cond.shape, begin_index, n_run,
               guidance_scale, return_intermediate_at)
        if key not in self._jit_cache:
            unet, cfg = self.unet, self.unet.config
            scheduler = self.scheduler
            dtype = self.dtype
            gs = guidance_scale

            @jax.jit
            def fn(unet_params, lat, cond, uncond, ts, sig, seed_arr):
                state = DPMState.init(lat.shape)

                def body(carry, inp):
                    lat, state = carry
                    i, t = inp
                    x = lat[:, None]  # single-frame snippets
                    # classifier-free guidance: two UNet passes
                    eps_c = unet_apply(unet_params, cfg, x, jnp.full((b,), t), cond)[:, 0]
                    if gs != 1.0:
                        eps_u = unet_apply(unet_params, cfg, x, jnp.full((b,), t), uncond)[:, 0]
                        eps = eps_u + gs * (eps_c - eps_u)
                    else:
                        eps = eps_c
                    rng = jax.random.fold_in(jax.random.PRNGKey(seed_arr[0]), i)
                    prev, state = scheduler.step(
                        eps.astype(jnp.float32), begin_index + i,
                        lat.astype(jnp.float32), sig, num_steps, state, rng=rng,
                    )
                    return (prev.astype(dtype), state), None

                steps = jnp.arange(n_run)
                if return_intermediate_at is not None:
                    steps = steps[:return_intermediate_at]
                    ts = ts[:return_intermediate_at]
                (lat, _), _ = jax.lax.scan(body, (lat, state), (steps, ts))
                return lat

            self._jit_cache[key] = fn
        return self._jit_cache[key](
            self.unet_params, latents, cond, uncond,
            jnp.asarray(timesteps), jnp.asarray(sigmas), jnp.asarray([seed], jnp.int32),
        )

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 25,
        guidance_scale: float = 7.0,
        batch: int = 1,
        seed: int = 0,
        image: Optional[np.ndarray] = None,  # [B, 3, H, W] in [-1, 1] -> img2img
        strength: float = 0.8,
        output_latents: bool = False,
        init_noise: Optional[np.ndarray] = None,  # [B, 4, h, w] explicit
        # Gaussian draw — cross-framework parity hook (replaces the PRNG)
    ) -> np.ndarray:
        """Generate images [B, 3, H, W] in [-1, 1] (or latents)."""
        timesteps, sigmas = self.scheduler.schedule(num_inference_steps)
        key = jax.random.PRNGKey(seed)
        if init_noise is not None:
            noise_override = jnp.asarray(
                np.transpose(np.asarray(init_noise, np.float32), (0, 2, 3, 1))
            )
        else:
            noise_override = None

        if image is not None:
            # img2img: encode + noise at the strength-skipped sigma
            # (diffusers get_timesteps semantics, rollingimg :1035-1044)
            init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
            t_start = max(num_inference_steps - init_timestep, 0)
            img = jnp.asarray(image.transpose(0, 2, 3, 1), dtype=self.dtype)
            lat0 = self.vae.encode_mean(self.vae_params, img)
            noise = (
                noise_override
                if noise_override is not None
                else jax.random.normal(key, lat0.shape, jnp.float32)
            )
            latents = self.scheduler.add_noise(
                lat0.astype(jnp.float32), noise, jnp.float32(sigmas[t_start])
            ).astype(self.dtype)
        else:
            t_start = 0
            # spatial scale = 2^(num VAE levels - 1); 8 for the SD VAE
            factor = 2 ** (len(self.vae.config.block_out_channels) - 1)
            h, w = height // factor, width // factor
            # DPMSolverMultistep is VP-parameterized: init_noise_sigma == 1.0
            # (diffusers pipeline_stable_diffusion.py:683 scales by 1.0), so
            # t2i init latents are plain N(0,1) — NOT scaled by the raw
            # k-diffusion sigma.
            if noise_override is not None:
                latents = noise_override.astype(self.dtype)
            else:
                latents = jax.random.normal(key, (batch, h, w, 4), jnp.float32).astype(
                    self.dtype
                )

        cond, uncond = self._embed(prompt, negative_prompt, latents.shape[0])
        latents = self._denoise(
            latents, cond, uncond, timesteps[t_start:], sigmas, t_start,
            num_inference_steps, guidance_scale, seed,
        )
        if output_latents:
            return np.asarray(latents, dtype=np.float32)
        img = self.vae.decode(self.vae_params, latents)
        return np.asarray(img, dtype=np.float32).transpose(0, 3, 1, 2)


class StableDiffusionImg2ImgPipeline(StableDiffusionPipeline):
    """API alias: img2img is the ``image=...`` path of the base pipeline."""

    def __call__(self, prompt: str, image: np.ndarray, strength: float = 0.8, **kw):
        return super().__call__(prompt, image=image, strength=strength, **kw)
