#!/usr/bin/env python
"""Generate FULL-SIZE synthetic diffusers-layout checkpoints (VERDICT r5 #7).

No released checkpoint is downloadable in this environment (zero egress), so
this writes random-weight checkpoints with the exact structure and scale a
reference user's day-one weights have:

  depth  — rollingdepth-v1-0 shape (/root/reference README + run_video.py:530):
           SD2 UNet (8-ch conv_in, 865M params) saved as SHARDED safetensors
           with a hub index.json; SD VAE saved as an fp16 VARIANT file only;
           CLIP-H-sized text encoder; DDIM scheduler config; byte-level
           tokenizer with real CLIP special-token ids.
  relight — RealisticVision SD1.5 shape (rollingimg_pipeline.py:84-89):
           4-ch SD1.5 UNet + SD VAE + CLIP-L text encoder + an
           iclight_sd15_fbc.safetensors ADDITIVE OFFSET file over the
           12-ch-expanded UNet keys (fp16, like the released file).

Exercises, at real scale, the same load path a released checkpoint takes:
sharded-index resolution, dtype-variant fallback, OIHW->HWIO conversion,
conv_in 4->12 surgery + offset merge, .npz param cache, and the load-time
flash-attention score probe (run_video.py:530-540 equivalent).

Usage:
  python scripts/make_synthetic_checkpoint.py depth   OUTDIR [--shard-mb 500]
  python scripts/make_synthetic_checkpoint.py relight OUTDIR
"""

import json
import os
import sys

sys.path.insert(0, "/root/reference/diffusers/src")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_tokenizer(root: str) -> None:
    """Byte-level BPE vocab with the released CLIP special-token ids."""
    from rollingdepth_tpu.io.tokenizer import bytes_to_unicode

    tok_dir = os.path.join(root, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    vocab = {}
    for u in bytes_to_unicode().values():
        vocab[u] = len(vocab)
    for u in bytes_to_unicode().values():
        vocab[u + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 49406
    vocab["<|endoftext|>"] = 49407
    with open(os.path.join(tok_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"model_max_length": 77,
                   "bos_token": "<|startoftext|>",
                   "eos_token": "<|endoftext|>",
                   "unk_token": "<|endoftext|>",
                   "pad_token": "<|endoftext|>"}, f)


def make_depth(root: str, shard_mb: int = 500) -> None:
    import torch
    from diffusers import AutoencoderKL, DDIMScheduler, UNet2DConditionModel
    from transformers import CLIPTextConfig, CLIPTextModel

    os.makedirs(root, exist_ok=True)
    torch.manual_seed(0)

    # SD2 UNet, rollingdepth-v1-0 8-ch conv_in (rgb + depth latents)
    print("[make] SD2 unet (sharded safetensors)...", file=sys.stderr)
    unet = UNet2DConditionModel(
        sample_size=96, in_channels=8, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
        up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
        block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
        cross_attention_dim=1024, attention_head_dim=(5, 10, 20, 20),
        use_linear_projection=True,
    )
    unet.save_pretrained(os.path.join(root, "unet"),
                         max_shard_size=f"{shard_mb}MB")

    # SD VAE as an fp16 VARIANT file only (diffusion_pytorch_model.fp16.safetensors)
    print("[make] SD vae (fp16 variant)...", file=sys.stderr)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(128, 256, 512, 512), layers_per_block=2,
        latent_channels=4, norm_num_groups=32, sample_size=768,
    )
    vae.to(torch.float16).save_pretrained(os.path.join(root, "vae"),
                                          variant="fp16")

    DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        clip_sample=False, set_alpha_to_one=False, steps_offset=1,
        timestep_spacing="trailing", prediction_type="v_prediction",
    ).save_pretrained(os.path.join(root, "scheduler"))

    # CLIP-H-sized text encoder (SD2's OpenCLIP ViT-H text tower shape)
    print("[make] CLIP-H text encoder...", file=sys.stderr)
    CLIPTextModel(CLIPTextConfig(
        vocab_size=49408, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=23, num_attention_heads=16,
        max_position_embeddings=77, hidden_act="gelu",
    )).save_pretrained(os.path.join(root, "text_encoder"))

    write_tokenizer(root)
    with open(os.path.join(root, "model_index.json"), "w") as f:
        json.dump({"_class_name": "RollingDepthPipeline"}, f)
    print(f"[make] depth checkpoint at {root}", file=sys.stderr)


def make_relight(root: str) -> None:
    import numpy as np
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    os.makedirs(root, exist_ok=True)
    torch.manual_seed(1)

    print("[make] SD1.5 unet...", file=sys.stderr)
    UNet2DConditionModel(
        sample_size=64, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
        up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
        block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
        cross_attention_dim=768, attention_head_dim=8,
        use_linear_projection=False,
    ).save_pretrained(os.path.join(root, "unet"))

    print("[make] SD vae...", file=sys.stderr)
    AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        block_out_channels=(128, 256, 512, 512), layers_per_block=2,
        latent_channels=4, norm_num_groups=32, sample_size=512,
    ).save_pretrained(os.path.join(root, "vae"))

    print("[make] CLIP-L text encoder...", file=sys.stderr)
    CLIPTextModel(CLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )).save_pretrained(os.path.join(root, "text_encoder"))

    write_tokenizer(root)

    # IC-Light fbc additive offset over the 12-ch-expanded UNet keys, fp16
    # like the released iclight_sd15_fbc.safetensors
    # (rollingimg_pipeline.py:1077-1087)
    print("[make] IC-Light offset (fp16)...", file=sys.stderr)
    from rollingdepth_tpu.io.weights import expand_conv_in, load_module_state_dict

    sd = expand_conv_in(load_module_state_dict(root, "unet"), 12)
    rng = np.random.RandomState(42)
    offset = {
        k: (rng.standard_normal(v.shape) * 0.002).astype(np.float16)
        for k, v in sd.items()
    }
    save_file(offset, os.path.join(root, "iclight_sd15_fbc.safetensors"))
    print(f"[make] relight checkpoint at {root}", file=sys.stderr)


if __name__ == "__main__":
    kind = sys.argv[1]
    out = sys.argv[2]
    shard_mb = 500
    if "--shard-mb" in sys.argv:
        shard_mb = int(sys.argv[sys.argv.index("--shard-mb") + 1])
    if kind == "depth":
        make_depth(out, shard_mb)
    elif kind == "relight":
        make_relight(out)
    else:
        raise SystemExit(f"unknown kind {kind!r}; expected depth|relight")
