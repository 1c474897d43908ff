"""Shared diffusion-schedule math (pure numpy/jnp, no state objects).

Behavioral reference: the beta schedules of the vendored diffusers fork
(/root/reference/diffusers/src/diffusers/schedulers/scheduling_ddim.py:204-236).
All schedule constants are precomputed host-side in float64 numpy and baked
into jitted programs as static constants — nothing here traces.
"""

from __future__ import annotations

import numpy as np


def make_betas(
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
    beta_schedule: str,
) -> np.ndarray:
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        # SD schedule: linear in sqrt-beta space
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        betas = _betas_for_alpha_bar(num_train_timesteps)
    else:
        raise NotImplementedError(f"beta_schedule {beta_schedule!r}")
    return betas


def _betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    t1 = np.arange(num_steps) / num_steps
    t2 = (np.arange(num_steps) + 1) / num_steps
    return np.minimum(1 - alpha_bar(t2) / alpha_bar(t1), max_beta)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift the schedule so the terminal SNR is exactly zero.

    Mirrors diffusers' ``rescale_zero_terminal_snr``
    (scheduling_ddim.py:95-140 in the vendored fork).
    """
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].copy()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - alphas_bar_sqrt_T
    alphas_bar_sqrt = alphas_bar_sqrt * alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = np.concatenate([alphas_bar[0:1], alphas])
    return 1.0 - alphas


def make_alphas_cumprod(
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
    beta_schedule: str,
    rescale_betas_zero_snr: bool = False,
) -> np.ndarray:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    if rescale_betas_zero_snr:
        betas = rescale_zero_terminal_snr(betas)
    return np.cumprod(1.0 - betas).astype(np.float32)


def spaced_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    timestep_spacing: str,
    steps_offset: int = 0,
) -> np.ndarray:
    """Inference timestep grid, descending int32.

    Mirrors DDIMScheduler.set_timesteps
    (/root/reference/diffusers/src/diffusers/schedulers/scheduling_ddim.py:316-340).
    """
    if num_inference_steps > num_train_timesteps:
        raise ValueError(
            f"num_inference_steps {num_inference_steps} > num_train_timesteps {num_train_timesteps}"
        )
    if timestep_spacing == "linspace":
        timesteps = (
            np.linspace(0, num_train_timesteps - 1, num_inference_steps)
            .round()[::-1]
            .astype(np.int64)
        )
    elif timestep_spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        timesteps = timesteps + steps_offset
    elif timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        timesteps = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64)
        timesteps = timesteps - 1
    else:
        raise ValueError(f"timestep_spacing {timestep_spacing!r} not supported")
    return timesteps.astype(np.int32)
