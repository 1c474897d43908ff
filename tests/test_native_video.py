"""Native C++ video decode/encode tests (skipped if the toolchain can't
build the library)."""

import numpy as np
import pytest

from rollingdepth_tpu.io import native_video as nv
from rollingdepth_tpu.io.video import get_video_fps, load_video_frames, write_video_from_numpy

pytestmark = pytest.mark.skipif(not nv.available(), reason="native library unavailable")


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    d = tmp_path_factory.mktemp("nv")
    path = str(d / "clip.mp4")
    yy, xx = np.mgrid[0:64, 0:96]
    frames = np.stack([((yy + xx + 7 * i) % 255).astype(np.uint8) for i in range(20)])
    frames = np.repeat(frames[..., None], 3, -1)
    nv.encode_video(frames, path, fps=10, codec="libx264")
    return path, frames


def test_roundtrip_frame_count_and_fps(sample_video):
    path, frames = sample_video
    dec, orig, fps = nv.decode_video(path)
    assert dec.shape == (20, 3, 64, 96)
    assert orig == (64, 96)
    assert abs(fps - 10.0) < 0.01
    assert nv.probe_fps(path) == pytest.approx(10.0, abs=0.01)


def test_roundtrip_content(sample_video):
    path, frames = sample_video
    dec, _, _ = nv.decode_video(path)
    du8 = (dec.transpose(0, 2, 3, 1) + 1) * 127.5
    err = np.abs(du8 - frames.astype(np.float32)).mean()
    assert err < 4.0  # x264 crf23 on smooth gradients


def test_windowed_decode_and_resize(sample_video):
    path, _ = sample_video
    dec, _, _ = nv.decode_video(path, start_frame=5, frame_count=8)
    assert dec.shape[0] == 8
    dec2, orig, _ = nv.decode_video(path, max_edge=48)
    assert max(dec2.shape[2:]) == 48
    assert orig == (64, 96)


def test_video_io_uses_native_backend(sample_video, tmp_path):
    path, frames = sample_video
    loaded, orig = load_video_frames(path, processing_res=48)
    assert loaded.shape[0] == 20 and max(loaded.shape[2:]) == 48
    assert orig == (64, 96)
    assert get_video_fps(path) == pytest.approx(10.0, abs=0.01)

    out = str(tmp_path / "out.mp4")
    write_video_from_numpy(frames, out, fps=10)
    redec, _, _ = nv.decode_video(out)
    assert redec.shape[0] == 20


def test_prefetching_loader(sample_video):
    path, _ = sample_video
    loader = nv.PrefetchingFrameLoader([path, path], max_edge=48)
    items = list(loader)
    assert len(items) == 2
    for p, arr, orig, fps in items:
        assert arr.shape == (20, 48, 72, 3) or arr.shape[0] == 20
        assert orig == (64, 96)
