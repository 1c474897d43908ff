"""Diffusers-layout checkpoint loading -> assembled TPU pipelines.

Behavioral reference: ``DiffusionPipeline.from_pretrained`` with
``model_index.json`` subfolders (unet/vae/scheduler/text_encoder/tokenizer)
— /root/reference/run_video.py:530-532 and the vendored
diffusers/pipeline_utils.py.  Here loading is a one-time torch->pytree
conversion per module.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax.numpy as jnp

from ..models.clip_text import CLIPTextConfig, CLIPTextModel
from ..models.unet import UNet2DCondition, UNetConfig
from ..models.vae import AutoencoderKL, VAEConfig
from ..schedulers.ddim import DDIMConfig, DDIMScheduler
from .tokenizer import CLIPTokenizer
from .weights import load_config, load_module_state_dict, state_dict_to_pytree

logger = logging.getLogger(__name__)

DTYPE_MAP = {
    "fp16": jnp.bfloat16,  # TPU-native half precision (SURVEY.md §7)
    "bf16": jnp.bfloat16,
    "fp32": jnp.float32,
    "float16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
}


def _clip_key_filter(key: str) -> Optional[str]:
    if "position_ids" in key:
        return None
    return key.removeprefix("text_model.")


def load_text_encoder(checkpoint_dir: str, dtype=jnp.float32):
    cfg = CLIPTextConfig.from_dict(load_config(checkpoint_dir, "text_encoder"))
    model = CLIPTextModel(cfg)
    params = _cached_convert(
        checkpoint_dir, "text_encoder", dtype,
        lambda: state_dict_to_pytree(
            load_module_state_dict(checkpoint_dir, "text_encoder"),
            dtype=dtype, key_filter=_clip_key_filter,
        ),
    )
    return model, params


def _cached_convert(checkpoint_dir: str, subfolder: str, dtype, convert_fn,
                    variant: str = "", extra_files=()):
    """Run the torch->pytree conversion once; reload from .npz afterwards."""
    from .cache import cache_path, load_params, save_params

    path = cache_path(checkpoint_dir, subfolder, jnp.dtype(dtype).name,
                      variant=variant, extra_files=extra_files)
    if os.path.exists(path):
        try:
            return load_params(path)
        except Exception as e:  # noqa: BLE001
            logger.warning("stale param cache %s (%s); reconverting", path, e)
    params = convert_fn()
    try:
        save_params(params, path)
    except OSError as e:
        logger.debug("cannot write param cache: %s", e)
    return params


def load_unet(checkpoint_dir: str, dtype=jnp.float32, subfolder: str = "unet"):
    cfg = UNetConfig.from_dict(load_config(checkpoint_dir, subfolder))
    model = UNet2DCondition(cfg)
    params = _cached_convert(
        checkpoint_dir, subfolder, dtype,
        lambda: state_dict_to_pytree(load_module_state_dict(checkpoint_dir, subfolder), dtype=dtype),
    )
    return model, params


def load_vae(checkpoint_dir: str, dtype=jnp.float32, subfolder: str = "vae"):
    cfg = VAEConfig.from_dict(load_config(checkpoint_dir, subfolder))
    model = AutoencoderKL(cfg)
    params = _cached_convert(
        checkpoint_dir, subfolder, dtype,
        lambda: state_dict_to_pytree(load_module_state_dict(checkpoint_dir, subfolder), dtype=dtype),
    )
    return model, params


def apply_quantize(unet_params, quantize):
    """Optional load-time weight transform for the serving path."""
    if quantize in (None, "none"):
        return unet_params
    if quantize == "w8a8":
        from ..ops.quant import quantize_unet_params

        return quantize_unet_params(unet_params)
    raise ValueError(f"unknown quantize mode {quantize!r} (expected 'w8a8')")


def load_rollingdepth_pipeline(
    checkpoint_dir: str,
    dtype="fp16",
    snippet_batch: int = 8,
    quantize=None,
):
    """Assemble the depth pipeline from a rollingdepth-v1-0-style checkpoint.

    Equivalent of RollingDepthPipeline.from_pretrained in the reference
    (run_video.py:530-532): reads model_index.json subfolders, converts each
    torch module, precomputes the empty-prompt embedding."""
    from ..pipelines.rollingdepth import RollingDepthPipeline

    jdtype = DTYPE_MAP[str(dtype)] if isinstance(dtype, str) else dtype

    unet, unet_params = load_unet(checkpoint_dir, jdtype)
    unet_params = apply_quantize(unet_params, quantize)
    # calibrate the max-free attention kernel's score-bound contract on the
    # REAL weights (a pathological checkpoint auto-falls-back to the safe
    # online-softmax kernel — ops/score_probe.py); quantized trees carry
    # int8 leaves the eager probe can't run, they keep the current gate.
    # TPU-only: the no_max kernel never dispatches elsewhere, and the eager
    # probe pays per-op latency on remote transports.
    import jax

    if quantize in (None, "none") and jax.default_backend() == "tpu":
        from ..ops.score_probe import calibrate_nomax

        calibrate_nomax(unet, unet_params)
    vae, vae_params = load_vae(checkpoint_dir, jdtype)
    sched_cfg = DDIMConfig.from_dict(load_config(checkpoint_dir, "scheduler"))
    scheduler = DDIMScheduler(sched_cfg)

    # empty-prompt embedding, computed once
    # (/root/reference/rollingdepth/rollingdepth_pipeline.py:178-191)
    import jax

    text_model, text_params = load_text_encoder(checkpoint_dir)
    tokenizer = CLIPTokenizer.from_pretrained(checkpoint_dir)
    ids = jnp.asarray([tokenizer("", padding="do_not_pad")])
    empty_embed = jax.jit(text_model.apply)(text_params, ids)

    pipe = RollingDepthPipeline(
        unet, unet_params, vae, vae_params, scheduler, empty_embed,
        dtype=jdtype, snippet_batch=snippet_batch,
    )
    pipe.tokenizer = tokenizer
    pipe.text_model = text_model
    pipe.text_params = text_params
    return pipe


def load_pipeline(checkpoint_dir: str, dtype="fp16", **kwargs):
    """Dispatch on model_index.json's _class_name, like diffusers'
    DiffusionPipeline.from_pretrained (pipeline_utils.py)."""
    index_path = os.path.join(checkpoint_dir, "model_index.json")
    class_name = "RollingDepthPipeline"
    if os.path.exists(index_path):
        with open(index_path) as f:
            class_name = json.load(f).get("_class_name", class_name)
    if class_name in ("RollingDepthPipeline", "DiffusionPipeline"):
        return load_rollingdepth_pipeline(checkpoint_dir, dtype=dtype, **kwargs)
    if class_name in ("RollingImgPipeline", "StableDiffusionPipeline",
                      "StableDiffusionImg2ImgPipeline"):
        from .pretrained_relight import load_relight_pipeline

        return load_relight_pipeline(checkpoint_dir, dtype=dtype, **kwargs)
    if class_name == "MyRollingDepthPipeline":
        from ..pipelines.my_rollingdepth import MyRollingDepthPipeline
        from .pretrained_relight import load_relight_pipeline

        return load_relight_pipeline(
            checkpoint_dir, dtype=dtype, pipeline_cls=MyRollingDepthPipeline, **kwargs
        )
    raise ValueError(f"Unknown pipeline class {class_name!r} in {index_path}")
