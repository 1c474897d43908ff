"""End-to-end CLI test: tiny diffusers-layout checkpoint on disk -> run_video
CLI -> npy + colorized mp4 + side-by-side outputs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory, torch_oracle):
    """Write a structurally complete rollingdepth-style checkpoint dir."""
    import torch
    from diffusers import AutoencoderKL, DDIMScheduler, UNet2DConditionModel
    from transformers import CLIPTextConfig, CLIPTextModel

    root = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)

    unet = UNet2DConditionModel(
        sample_size=8, in_channels=8, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=4,
        use_linear_projection=True,
    )
    unet.save_pretrained(root / "unet")

    vae = AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        latent_channels=4, norm_num_groups=4,
    )
    vae.save_pretrained(root / "vae")

    DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        clip_sample=False, set_alpha_to_one=False, steps_offset=1,
        timestep_spacing="trailing",
    ).save_pretrained(root / "scheduler")

    text_cfg = CLIPTextConfig(
        vocab_size=512, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=77,
    )
    CLIPTextModel(text_cfg).save_pretrained(root / "text_encoder")

    # synthetic tokenizer files (byte-level vocab, no merges)
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

    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "RollingDepthPipeline"}, f)
    return str(root)


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("vid")
    path = str(d / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    rng = np.random.RandomState(0)
    base = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    for i in range(8):
        frame = np.roll(base, i * 2, axis=1)
        w.write(frame)
    w.release()
    return path


def test_cli_depth_end_to_end(tiny_checkpoint, tiny_video, tmp_path):
    from rollingdepth_tpu.cli import main

    out_dir = tmp_path / "out"
    main([
        "-i", tiny_video, "-o", str(out_dir), "-p", "none",
        "-c", tiny_checkpoint, "--res", "32", "--dilations", "1", "2",
        "--refine-step", "0", "--dtype", "fp32", "--verbose", "--seed", "0",
    ])
    stem = "clip"
    assert (out_dir / f"{stem}_pred.npy").exists()
    pred = np.load(out_dir / f"{stem}_pred.npy")
    assert pred.shape[0] == 8 and pred.ndim == 3
    assert np.isfinite(pred).all()
    assert (out_dir / f"{stem}_Spectral_r.mp4").exists()
    assert (out_dir / f"{stem}_Greys_r.mp4").exists()
    assert (out_dir / f"{stem}_rgbd.mp4").exists()
    assert os.path.getsize(out_dir / f"{stem}_Spectral_r.mp4") > 0


def test_cli_preset_merge():
    from rollingdepth_tpu.cli import resolve_args

    args, settings = resolve_args([
        "-i", "x.mp4", "-o", "out", "-p", "fast", "--res", "512",
    ])
    assert settings.res == 512  # explicit flag overrides preset
    assert settings.dilations == [1, 25]
    assert settings.refine_step == 0


def test_cli_depth_directory_input(tiny_checkpoint, tiny_video, tmp_path):
    """Directory input exercises the multi-video decode-prefetch path."""
    import shutil

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    shutil.copy(tiny_video, vid_dir / "a.mp4")
    shutil.copy(tiny_video, vid_dir / "b.mp4")

    from rollingdepth_tpu.cli import main

    out_dir = tmp_path / "out"
    main([
        "-i", str(vid_dir), "-o", str(out_dir), "-p", "none",
        "-c", tiny_checkpoint, "--res", "32", "--dilations", "1",
        "--refine-step", "0", "--dtype", "fp32", "--seed", "0",
        "--cmap", "Spectral_r", "--save-sbs", "false",
    ])
    assert (out_dir / "a_pred.npy").exists()
    assert (out_dir / "b_pred.npy").exists()
    a = np.load(out_dir / "a_pred.npy")
    b = np.load(out_dir / "b_pred.npy")
    np.testing.assert_array_equal(a, b)  # identical clips -> identical output


def test_load_pipeline_dispatch(tiny_checkpoint):
    from rollingdepth_tpu.io.pretrained import load_pipeline
    from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline

    pipe = load_pipeline(tiny_checkpoint, dtype="fp32")
    assert isinstance(pipe, RollingDepthPipeline)
