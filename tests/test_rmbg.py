"""RMBG U²-Net parity vs the reference briarmbg.py (torch oracle)."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rollingdepth_tpu.io.weights import state_dict_to_pytree
from rollingdepth_tpu.models.rmbg import BriaRMBG


@pytest.fixture(scope="module")
def torch_rmbg(torch_oracle):
    spec = importlib.util.spec_from_file_location("ref_briarmbg", "/root/reference/briarmbg.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import torch

    torch.manual_seed(0)
    m = mod.BriaRMBG()
    m.eval()
    return m


def test_rmbg_parity(torch_rmbg):
    import torch

    params = state_dict_to_pytree(torch_rmbg.state_dict())
    ours = BriaRMBG()

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        sides_ref, _feats = torch_rmbg(torch.from_numpy(x))

    outs = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs) == 6
    for i, (ref, got) in enumerate(zip(sides_ref, outs)):
        got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(
            got_nchw, ref.numpy(), rtol=5e-3, atol=2e-3,
            err_msg=f"side output {i}",
        )


def test_rmbg_odd_input(torch_rmbg):
    """ceil-mode pooling + upsample-to-size must handle odd dims (the relight
    pipeline feeds 720x640 or arbitrary fg crops)."""
    import torch

    params = state_dict_to_pytree(torch_rmbg.state_dict())
    ours = BriaRMBG()
    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 50, 70).astype(np.float32)
    with torch.no_grad():
        sides_ref, _ = torch_rmbg(torch.from_numpy(x))
    outs = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(outs[0]).transpose(0, 3, 1, 2)
    assert got.shape == tuple(sides_ref[0].shape)
    np.testing.assert_allclose(got, sides_ref[0].numpy(), rtol=5e-3, atol=2e-3)


def test_rmbg_sequence_batched_matches_per_frame(torch_rmbg):
    """The batched run_rmbg_sequence (one compiled program per frame chunk)
    must reproduce the per-frame run_rmbg loop it replaced (VERDICT r2)."""
    from rollingdepth_tpu.pipelines.rollingimg import run_rmbg, run_rmbg_sequence

    params = state_dict_to_pytree(torch_rmbg.state_dict())
    ours = BriaRMBG()
    rng = np.random.RandomState(3)
    frames = rng.rand(5, 3, 24, 32).astype(np.float32)  # [N, 3, H, W] in [0,1]

    matted, alphas = run_rmbg_sequence(ours, params, frames, sigma=0.0, chunk=2)
    assert matted.shape == (5, 3, 24, 32)
    assert alphas.shape == (5, 1, 24, 32)

    for i in range(5):
        img = (frames[i].transpose(1, 2, 0) * 255).astype(np.uint8)
        m_ref, a_ref = run_rmbg(ours, params, img, sigma=0.0)
        np.testing.assert_allclose(
            alphas[i], a_ref.transpose(2, 0, 1), atol=1e-4, rtol=1e-4
        )
        # per-frame path truncates through uint8; allow one quantum
        assert np.abs(matted[i] - m_ref.astype(np.float32).transpose(2, 0, 1)).max() <= 1.0
