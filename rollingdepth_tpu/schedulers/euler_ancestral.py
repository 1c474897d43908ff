"""Functional Euler-Ancestral scheduler.

Behavioral reference: vendored diffusers EulerAncestralDiscreteScheduler
(/root/reference/diffusers/src/diffusers/schedulers/
scheduling_euler_ancestral_discrete.py: set_timesteps :277-319,
scale_model_input :246-275, step :345-443).  Constructed (but not registered)
by the relight pipeline (/root/reference/rollingdepth/rollingimg_pipeline.py:
149-154); included for scheduler-zoo parity.

Design: sigma table precomputed host-side; ``step`` is a pure function of
(model_output, step_index, sample, rng) and is driven by the *step index*
rather than mutable internal counters, so it drops straight into
``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import make_alphas_cumprod, spaced_timesteps


@dataclasses.dataclass(frozen=True)
class EulerAncestralConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    prediction_type: str = "epsilon"
    timestep_spacing: str = "linspace"
    steps_offset: int = 0
    rescale_betas_zero_snr: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "EulerAncestralConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class EulerAncestralScheduler:
    def __init__(self, config: EulerAncestralConfig = EulerAncestralConfig()):
        self.config = config
        self.alphas_cumprod = make_alphas_cumprod(
            config.num_train_timesteps,
            config.beta_start,
            config.beta_end,
            config.beta_schedule,
            config.rescale_betas_zero_snr,
        )
        if config.rescale_betas_zero_snr:
            # zero-SNR rescale makes the terminal alphas_cumprod exactly 0,
            # which would put sigma[0] at inf; diffusers patches it to the
            # smallest fp16-representable positive value
            # (scheduling_euler_ancestral_discrete.py:204)
            self.alphas_cumprod[-1] = 2**-24

    def schedule(self, num_inference_steps: int) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side (timesteps [T] float32, sigmas [T+1]) for a run.

        Euler-A keeps *float* timesteps for linspace spacing
        (scheduling_euler_ancestral_discrete.py:289-309)."""
        cfg = self.config
        if cfg.timestep_spacing == "linspace":
            timesteps = np.linspace(
                0, cfg.num_train_timesteps - 1, num_inference_steps, dtype=np.float32
            )[::-1].copy()
        else:
            timesteps = spaced_timesteps(
                cfg.num_train_timesteps,
                num_inference_steps,
                cfg.timestep_spacing,
                cfg.steps_offset,
            ).astype(np.float32)
        sigmas_all = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        sigmas = np.interp(timesteps, np.arange(len(sigmas_all)), sigmas_all)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return timesteps, sigmas

    @staticmethod
    def scale_model_input(sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        return sample / jnp.sqrt(sigma.astype(jnp.float32) ** 2 + 1).astype(sample.dtype)

    def step(
        self,
        model_output: jnp.ndarray,
        step_index: jnp.ndarray,
        sample: jnp.ndarray,
        sigmas: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One ancestral step at ``step_index``.  Returns (prev_sample, pred_x0)."""
        sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
        sigma = sigmas[step_index]
        sigma_to = sigmas[step_index + 1]
        sample_f = sample.astype(jnp.float32)
        out_f = model_output.astype(jnp.float32)

        if self.config.prediction_type == "epsilon":
            pred_x0 = sample_f - sigma * out_f
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = out_f * (-sigma / jnp.sqrt(sigma**2 + 1)) + sample_f / (sigma**2 + 1)
        else:
            raise ValueError(f"prediction_type {self.config.prediction_type!r}")

        sigma_up = jnp.sqrt(sigma_to**2 * (sigma**2 - sigma_to**2) / sigma**2)
        sigma_down = jnp.sqrt(sigma_to**2 - sigma_up**2)

        derivative = (sample_f - pred_x0) / sigma
        prev = sample_f + derivative * (sigma_down - sigma)
        noise = jax.random.normal(rng, model_output.shape, dtype=jnp.float32)
        prev = prev + noise * sigma_up
        return prev.astype(model_output.dtype), pred_x0.astype(model_output.dtype)

    def add_noise(
        self,
        original_samples: jnp.ndarray,
        noise: jnp.ndarray,
        sigma: jnp.ndarray,
    ) -> jnp.ndarray:
        """sigma-space noising: x = x0 + sigma * eps (euler_discrete add_noise)."""
        out = original_samples.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
        return out.astype(original_samples.dtype)
