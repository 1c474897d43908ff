"""End-to-end relight CLI test with a tiny SD1.5-style checkpoint + IC-Light
offset file."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow


# tiny_sd15_checkpoint fixture lives in conftest.py (shared with the
# composed relight parity test)


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
