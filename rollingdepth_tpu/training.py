"""Diffusion fine-tuning step for the RollingDepth UNet.

The reference performs no training (checkpoint load only, SURVEY.md §5), but
the upstream model IS a fine-tuned SD2 — this module provides the TPU-native
fine-tuning story: Marigold/RollingDepth-style (rgb latent, depth latent)
pair training where the UNet learns eps/v prediction of the depth latent
conditioned on the rgb latent, with cross-frame snippet attention active.

The step is a pure function usable under ``jax.jit`` with dp+tp shardings
(parallel/sharding.py): batch over ``dp``, attention projections over ``tp``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .models.unet import UNetConfig, unet_apply
from .schedulers.ddim import DDIMScheduler

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 3e-5
    weight_decay: float = 1e-2
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0
    prediction_type: str = "epsilon"  # epsilon | v_prediction
    # LR schedule: "constant" | "cosine" (linear warmup, cosine decay to 0)
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 10_000  # cosine horizon


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: TrainConfig):
    if cfg.lr_schedule == "constant" and cfg.warmup_steps == 0:
        return cfg.learning_rate
    if cfg.lr_schedule == "constant":
        return optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.total_steps,
        )
    raise ValueError(f"lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(make_lr_schedule(cfg), b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )


def init_train_state(params: Params, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(unet_cfg: UNetConfig, scheduler: DDIMScheduler, cfg: TrainConfig):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"rgb_latent": [B, n, h, w, 4], "depth_latent": [B, n, h, w, 4],
            "text_embed": [1, L, D]}
    """
    opt = make_optimizer(cfg)
    num_train_timesteps = scheduler.config.num_train_timesteps

    def loss_fn(params, batch, rng):
        rgb_lat = batch["rgb_latent"]
        depth_lat = batch["depth_latent"]
        b = rgb_lat.shape[0]
        k_t, k_noise = jax.random.split(rng)
        t = jax.random.randint(k_t, (b,), 0, num_train_timesteps)
        noise = jax.random.normal(k_noise, depth_lat.shape, dtype=jnp.float32)
        noisy = scheduler.add_noise(
            depth_lat.astype(jnp.float32), noise, t[:, None].repeat(depth_lat.shape[1], 1)
        ).astype(rgb_lat.dtype)
        x = jnp.concatenate([rgb_lat, noisy], axis=-1)
        pred = unet_apply(params, unet_cfg, x, t, batch["text_embed"])
        if cfg.prediction_type == "epsilon":
            target = noise
        elif cfg.prediction_type == "v_prediction":
            target = scheduler.get_velocity(
                depth_lat.astype(jnp.float32), noise, t[:, None].repeat(depth_lat.shape[1], 1)
            )
        else:
            raise ValueError(cfg.prediction_type)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


# ---------------------------------------------------------------------------
# checkpointing (orbax)
# ---------------------------------------------------------------------------


def save_train_state(state: TrainState, path: str) -> None:
    """Persist params/opt_state/step with orbax (async-safe, atomic)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state._asdict(), force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState saved by ``save_train_state``; ``template``
    provides the tree structure/shapes (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template._asdict())
    return TrainState(**restored)
