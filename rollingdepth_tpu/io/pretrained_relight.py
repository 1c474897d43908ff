"""Relight pipeline assembly from checkpoints.

Reference behavior: the relight pipeline loads RealisticVision SD1.5
components + RMBG-1.4 at module import (rollingimg_pipeline.py:84-89),
re-loads them per call (:504-508), then at inference start performs conv_in
4->12ch surgery (:1068-1074) and the IC-Light fbc additive offset merge
(:1077-1087).  Here both weight transforms happen once at conversion time.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax.numpy as jnp

import dataclasses as _dc

from ..models.rmbg import BriaRMBG
from ..models.unet import UNet2DCondition, UNetConfig
from ..schedulers.dpmsolver import DPMSolverConfig, DPMSolverMultistepScheduler
from .pretrained import DTYPE_MAP, load_text_encoder, load_vae
from .tokenizer import CLIPTokenizer
from .weights import (
    expand_conv_in,
    load_config,
    load_module_state_dict,
    load_safetensors,
    merge_offset,
    state_dict_to_pytree,
)

logger = logging.getLogger(__name__)

# scheduler kwargs the reference registers (rollingimg_pipeline.py:156-163)
RELIGHT_SCHEDULER_CONFIG = DPMSolverConfig(
    num_train_timesteps=1000,
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="linear",  # diffusers default, not overridden by the reference
    algorithm_type="sde-dpmsolver++",
    use_karras_sigmas=True,
    steps_offset=1,
)


def load_relight_unet(
    checkpoint_dir: str,
    iclight_offset_path: Optional[str] = None,
    dtype=jnp.float32,
):
    """SD1.5 UNet with 12-ch conv_in surgery + IC-Light fbc offset merge.

    Returns (merged_12ch_model, merged_params, base_model, base_params);
    the base 4-ch UNet serves the t2i init-latent generator (replacing the
    reference's StableDiffusionPipeline t2i_pipe, rollingimg :165-175).
    """
    from .pretrained import _cached_convert

    cfg_dict = load_config(checkpoint_dir, "unet")
    base_cfg = UNetConfig.from_dict(cfg_dict)
    base_model = UNet2DCondition(base_cfg)

    # the raw state dict is loaded at most once, and not at all when both
    # conversions hit the .npz cache (warm start skips torch entirely)
    sd_box: dict = {}

    def get_sd():
        if "sd" not in sd_box:
            sd_box["sd"] = load_module_state_dict(checkpoint_dir, "unet")
        return sd_box["sd"]

    base_params = _cached_convert(
        checkpoint_dir, "unet", dtype,
        lambda: state_dict_to_pytree(get_sd(), dtype=dtype),
    )

    offset_exists = bool(iclight_offset_path) and os.path.exists(iclight_offset_path)
    if iclight_offset_path and not offset_exists:
        logger.warning("IC-Light offset %s not found; using unmerged weights", iclight_offset_path)

    def convert_merged():
        sd12 = expand_conv_in(get_sd(), 12)
        if offset_exists:
            sd12 = merge_offset(sd12, load_safetensors(iclight_offset_path))
        return state_dict_to_pytree(sd12, dtype=dtype)

    merged_cfg = _dc.replace(base_cfg, in_channels=12)
    merged_model = UNet2DCondition(merged_cfg)
    merged_params = _cached_convert(
        checkpoint_dir, "unet", dtype, convert_merged,
        variant="_iclight12" if offset_exists else "_12ch",
        extra_files=[iclight_offset_path] if offset_exists else (),
    )
    return merged_model, merged_params, base_model, base_params


def load_rmbg(model_dir: str, dtype=jnp.float32):
    model = BriaRMBG()
    sd = load_module_state_dict(model_dir)
    return model, state_dict_to_pytree(sd, dtype=dtype)


def load_relight_pipeline(
    checkpoint_dir: str,
    iclight_offset_path: Optional[str] = None,
    rmbg_dir: Optional[str] = None,
    dtype="fp16",
    snippet_batch: int = 4,
    pipeline_cls=None,
    quantize=None,
):
    from ..pipelines.rollingimg import RollingImgPipeline

    if pipeline_cls is None:
        pipeline_cls = RollingImgPipeline

    jdtype = DTYPE_MAP[str(dtype)] if isinstance(dtype, str) else dtype
    if iclight_offset_path is None:
        cand = os.path.join(checkpoint_dir, "iclight_sd15_fbc.safetensors")
        iclight_offset_path = cand if os.path.exists(cand) else None

    unet, unet_params, base_unet, base_params = load_relight_unet(
        checkpoint_dir, iclight_offset_path, jdtype
    )
    # quantize the 12-ch relight UNet only (20 denoise evals/snippet — the
    # hot path); the base t2i UNet runs once per clip for init latents
    from .pretrained import apply_quantize

    unet_params = apply_quantize(unet_params, quantize)
    # no_max attention safety calibration on the MERGED (IC-Light offset)
    # weights — the offset merge is exactly the kind of checkpoint transform
    # that could shift attention scales (ops/score_probe.py); TPU-only, as
    # in load_rollingdepth_pipeline
    import jax

    if quantize in (None, "none") and jax.default_backend() == "tpu":
        from ..ops.score_probe import calibrate_nomax

        calibrate_nomax(unet, unet_params)
    vae, vae_params = load_vae(checkpoint_dir, jdtype)
    text_model, text_params = load_text_encoder(checkpoint_dir)
    tokenizer = CLIPTokenizer.from_pretrained(checkpoint_dir)
    scheduler = DPMSolverMultistepScheduler(RELIGHT_SCHEDULER_CONFIG)

    rmbg = rmbg_params = None
    if rmbg_dir and os.path.isdir(rmbg_dir):
        rmbg, rmbg_params = load_rmbg(rmbg_dir, jnp.float32)

    import jax

    text_apply = jax.jit(lambda ids: text_model.apply(text_params, ids))
    return pipeline_cls(
        unet, unet_params, vae, vae_params, scheduler, tokenizer,
        text_apply,
        base_unet_params=base_params, base_unet=base_unet,
        rmbg=rmbg, rmbg_params=rmbg_params,
        dtype=jdtype, snippet_batch=snippet_batch,
    )
