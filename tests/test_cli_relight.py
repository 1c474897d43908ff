"""End-to-end relight CLI test with a tiny SD1.5-style checkpoint + IC-Light
offset file."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_sd15_checkpoint(tmp_path_factory, torch_oracle):
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import CLIPTextConfig, CLIPTextModel

    root = tmp_path_factory.mktemp("sd15")
    torch.manual_seed(0)
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=4,
        use_linear_projection=False,  # SD1.5 style
    )
    unet.save_pretrained(root / "unet")
    AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        latent_channels=4, norm_num_groups=4,
    ).save_pretrained(root / "vae")
    CLIPTextModel(CLIPTextConfig(
        vocab_size=512, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )).save_pretrained(root / "text_encoder")

    from rollingdepth_tpu.io.tokenizer import bytes_to_unicode

    tok_dir = root / "tokenizer"
    tok_dir.mkdir()
    vocab = {}
    for u in bytes_to_unicode().values():
        vocab[u] = len(vocab)
    for u in bytes_to_unicode().values():
        vocab[u + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = 510
    vocab["<|endoftext|>"] = 511
    with open(tok_dir / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tok_dir / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")

    # IC-Light-style additive offset over the 12-ch-expanded UNet weights
    from safetensors.numpy import save_file
    from rollingdepth_tpu.io.weights import expand_conv_in, load_module_state_dict

    sd = expand_conv_in(load_module_state_dict(str(root), "unet"), 12)
    offset = {k: (0.001 * np.ones_like(v)).astype(np.float32) for k, v in sd.items()}
    save_file(offset, str(root / "iclight_sd15_fbc.safetensors"))
    return str(root)


@pytest.fixture(scope="module")
def fg_bg_videos(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("relvid")
    paths = []
    for name, seed in (("fg", 0), ("bg", 1)):
        p = str(d / f"{name}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
        rng = np.random.RandomState(seed)
        base = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
        for i in range(6):
            w.write(np.roll(base, i * 3, axis=1))
        w.release()
        paths.append(p)
    return paths


def test_relight_loader_and_pipeline(tiny_sd15_checkpoint, fg_bg_videos):
    from rollingdepth_tpu.io.pretrained_relight import load_relight_pipeline

    pipe = load_relight_pipeline(tiny_sd15_checkpoint, dtype="fp32", snippet_batch=2)
    assert pipe.unet.config.in_channels == 12
    assert pipe.base_unet.config.in_channels == 4

    fg, bg = fg_bg_videos
    out = pipe(
        input_fg_video_path=fg, input_bg_video_path=bg,
        width=32, height=32, dilations=[1], init_mode="shared_noise",
        frame_count=6, seed=1,
    )
    assert out.R_pred.shape == (6, 1, 32, 32)
    assert np.isfinite(out.R_pred).all()


def test_relight_cli_end_to_end(tiny_sd15_checkpoint, fg_bg_videos, tmp_path, monkeypatch):
    """The -fi/-bi CLI path writes the combined RGB video."""
    import rollingdepth_tpu.pipelines.rollingimg as ri

    # shrink the fixed working resolution for the tiny test
    monkeypatch.setattr(ri, "RELIGHT_WIDTH", 32)
    monkeypatch.setattr(ri, "RELIGHT_HEIGHT", 32)
    monkeypatch.setattr(ri, "NUM_INFERENCE_STEPS", 4)

    from rollingdepth_tpu.cli import main

    fg, bg = fg_bg_videos
    out_dir = tmp_path / "out"
    main([
        "-fi", fg, "-bi", bg, "-o", str(out_dir), "-p", "none",
        "-c", tiny_sd15_checkpoint, "--dilations", "1", "--dtype", "fp32",
        "--frame-count", "6", "--seed", "1",
    ])
    outs = list(out_dir.glob("*_rgb.mp4"))
    assert len(outs) == 1 and outs[0].stat().st_size > 0
