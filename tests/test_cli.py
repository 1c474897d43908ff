"""End-to-end CLI test: tiny diffusers-layout checkpoint on disk -> run_video
CLI -> npy + colorized mp4 + side-by-side outputs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
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


def test_cli_tpu_tuned_batch_defaults(monkeypatch):
    """On a TPU backend, unset --max-vae-bs/--snippet-batch bump to 16/16
    (BASELINE.md: v5e decode runs 27 TF/s at bs4 vs 78+ at bs16); explicit
    flags always win.  Regression: non-None argparse defaults used to make
    the TPU branch dead code."""
    import jax

    import rollingdepth_tpu.cli as cli

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, settings = cli.resolve_args(["-i", "x.mp4", "-o", "out", "-p", "fast"])
    assert settings.max_vae_bs == 16
    assert settings.snippet_batch == 16

    _, settings = cli.resolve_args([
        "-i", "x.mp4", "-o", "out", "-p", "fast",
        "--max-vae-bs", "4", "--snippet-batch", "8",
    ])
    assert settings.max_vae_bs == 4
    assert settings.snippet_batch == 8

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    _, settings = cli.resolve_args(["-i", "x.mp4", "-o", "out", "-p", "fast"])
    assert settings.max_vae_bs == 4
    assert settings.snippet_batch == 8


@pytest.mark.slow
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
