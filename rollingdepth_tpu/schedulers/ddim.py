"""Functional DDIM scheduler.

Behavioral reference: the vendored diffusers DDIMScheduler
(/root/reference/diffusers/src/diffusers/schedulers/scheduling_ddim.py:
set_timesteps :296-340, step :342-469, add_noise :471-495).  The pipeline
uses it with eta=0 and resets timesteps before every snippet
(/root/reference/rollingdepth/rollingdepth_pipeline.py:392,421-422) — with a
functional scheduler that reset is a no-op by construction.

TPU-first design: the scheduler is a frozen config + precomputed numpy
schedule constants.  ``step`` is a pure jnp function of
(model_output, timestep_index, sample); it is safe inside ``lax.scan`` /
``lax.fori_loop`` because per-step scalars are gathered from constant tables
with traced indices.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import make_alphas_cumprod, spaced_timesteps


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    prediction_type: str = "epsilon"
    timestep_spacing: str = "leading"
    rescale_betas_zero_snr: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "DDIMConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class DDIMScheduler:
    """Stateless DDIM. All methods are jit-safe pure functions of their args."""

    def __init__(self, config: DDIMConfig = DDIMConfig()):
        self.config = config
        self.alphas_cumprod = make_alphas_cumprod(
            config.num_train_timesteps,
            config.beta_start,
            config.beta_end,
            config.beta_schedule,
            config.rescale_betas_zero_snr,
        )
        self.final_alpha_cumprod = np.float32(
            1.0 if config.set_alpha_to_one else self.alphas_cumprod[0]
        )

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timestep grid (host-side, static)."""
        return spaced_timesteps(
            self.config.num_train_timesteps,
            num_inference_steps,
            self.config.timestep_spacing,
            self.config.steps_offset,
        )

    def step(
        self,
        model_output: jnp.ndarray,
        timestep: jnp.ndarray,
        sample: jnp.ndarray,
        num_inference_steps: int,
        eta: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One reverse-diffusion step.  Returns (prev_sample, pred_x0)."""
        cfg = self.config
        ac = jnp.asarray(self.alphas_cumprod)
        timestep = jnp.asarray(timestep, dtype=jnp.int32)
        prev_timestep = timestep - cfg.num_train_timesteps // num_inference_steps

        alpha_prod_t = ac[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            ac[jnp.clip(prev_timestep, 0)],
            jnp.asarray(self.final_alpha_cumprod),
        )
        beta_prod_t = 1.0 - alpha_prod_t

        compute_dtype = jnp.float32
        sample_f = sample.astype(compute_dtype)
        out_f = model_output.astype(compute_dtype)
        a_t = alpha_prod_t.astype(compute_dtype)
        a_prev = alpha_prod_t_prev.astype(compute_dtype)
        b_t = beta_prod_t.astype(compute_dtype)

        if cfg.prediction_type == "epsilon":
            pred_x0 = (sample_f - jnp.sqrt(b_t) * out_f) / jnp.sqrt(a_t)
            pred_eps = out_f
        elif cfg.prediction_type == "sample":
            pred_x0 = out_f
            pred_eps = (sample_f - jnp.sqrt(a_t) * pred_x0) / jnp.sqrt(b_t)
        elif cfg.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(a_t) * sample_f - jnp.sqrt(b_t) * out_f
            pred_eps = jnp.sqrt(a_t) * out_f + jnp.sqrt(b_t) * sample_f
        else:
            raise ValueError(f"prediction_type {cfg.prediction_type!r}")

        if cfg.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        if eta > 0.0:
            variance = (1.0 - a_prev) / b_t * (1.0 - a_t / a_prev)
            std_dev_t = eta * jnp.sqrt(variance)
        else:
            std_dev_t = jnp.zeros_like(a_t)

        pred_dir = jnp.sqrt(1.0 - a_prev - std_dev_t**2) * pred_eps
        prev_sample = jnp.sqrt(a_prev) * pred_x0 + pred_dir

        if eta > 0.0:
            if rng is None:
                raise ValueError("eta > 0 requires an explicit PRNG key")
            noise = jax.random.normal(rng, model_output.shape, dtype=compute_dtype)
            prev_sample = prev_sample + std_dev_t * noise

        return prev_sample.astype(sample.dtype), pred_x0.astype(sample.dtype)

    def add_noise(
        self,
        original_samples: jnp.ndarray,
        noise: jnp.ndarray,
        timesteps: jnp.ndarray,
    ) -> jnp.ndarray:
        """Forward-noise clean samples to the given timesteps
        (scheduling_ddim.py:471-495)."""
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        t = jnp.asarray(timesteps, dtype=jnp.int32)
        sqrt_a = jnp.sqrt(ac[t])
        sqrt_1ma = jnp.sqrt(1.0 - ac[t])
        # broadcast per-sample scalars over trailing dims
        extra = original_samples.ndim - sqrt_a.ndim
        sqrt_a = sqrt_a.reshape(sqrt_a.shape + (1,) * extra)
        sqrt_1ma = sqrt_1ma.reshape(sqrt_1ma.shape + (1,) * extra)
        out = (
            sqrt_a * original_samples.astype(jnp.float32)
            + sqrt_1ma * noise.astype(jnp.float32)
        )
        return out.astype(original_samples.dtype)

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """v-prediction target (scheduling_ddim.py:497-515)."""
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        t = jnp.asarray(timesteps, dtype=jnp.int32)
        sqrt_a = jnp.sqrt(ac[t])
        sqrt_1ma = jnp.sqrt(1.0 - ac[t])
        extra = sample.ndim - sqrt_a.ndim
        sqrt_a = sqrt_a.reshape(sqrt_a.shape + (1,) * extra)
        sqrt_1ma = sqrt_1ma.reshape(sqrt_1ma.shape + (1,) * extra)
        v = sqrt_a * noise.astype(jnp.float32) - sqrt_1ma * sample.astype(jnp.float32)
        return v.astype(sample.dtype)
