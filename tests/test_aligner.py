"""Co-alignment solver parity vs the reference torch DepthAligner
(/root/reference/rollingdepth/depth_aligner.py), loaded directly from file
as a numerical oracle."""

import importlib.util
import io
import contextlib

import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.aligner import AlignerConfig, DepthAligner


def load_reference_aligner():
    spec = importlib.util.spec_from_file_location(
        "ref_depth_aligner", "/root/reference/rollingdepth/depth_aligner.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.DepthAligner


def make_snippets(seq_len=20, dilations=(1, 4), h=26, w=26, seed=0):
    """Synthetic per-dilation snippet stacks with plausible scale/shift
    distortions of a shared ground-truth depth video."""
    rng = np.random.RandomState(seed)
    gt = rng.rand(seq_len, h, w).astype(np.float32) + 0.5
    out = []
    for d in dilations:
        s_count = seq_len - 2 * d
        snips = []
        for i in range(s_count):
            idx = [i, i + d, i + 2 * d]
            scale = 1.0 + 0.3 * rng.randn()
            shift = 0.1 * rng.randn()
            snips.append(gt[idx] * scale + shift)
        out.append(np.stack(snips)[:, :, None])  # [S, 3, 1, H, W]
    return out


@pytest.mark.parametrize("iters", [40])
def test_aligner_matches_torch_reference(iters):
    import torch

    RefAligner = load_reference_aligner()
    snippets = make_snippets()
    dilations = [1, 4]

    ref = RefAligner(device=torch.device("cpu"), num_iterations=iters, factor=4)
    with contextlib.redirect_stdout(io.StringIO()):  # reference has debug prints
        merged_ref, scales_ref, trans_ref, hist_ref = ref.run(
            [torch.from_numpy(s) for s in snippets], dilations
        )

    ours = DepthAligner(AlignerConfig(num_iterations=iters, factor=4))
    merged, scales, trans, hist = ours.run([jnp.asarray(s) for s in snippets], dilations)

    for s_ours, s_ref in zip(scales, scales_ref):
        np.testing.assert_allclose(
            np.asarray(s_ours), s_ref.detach().numpy().reshape(-1), rtol=5e-4, atol=5e-4
        )
    for t_ours, t_ref in zip(trans, trans_ref):
        np.testing.assert_allclose(
            np.asarray(t_ours), t_ref.detach().numpy().reshape(-1), rtol=5e-4, atol=5e-4
        )
    # loss trajectory
    ref_losses = np.array([x[0] for x in hist_ref])
    np.testing.assert_allclose(np.asarray(hist[:, 0]), ref_losses, rtol=1e-3, atol=1e-5)
    # merged output: reference returns [N*1, 1, H, W] after frame-mean
    ref_m = merged_ref.detach().numpy()
    ours_m = np.asarray(merged)
    np.testing.assert_allclose(ours_m.reshape(ref_m.shape), ref_m, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("iters", [20])
def test_aligner_matches_torch_reference_multichunk(iters):
    """Clip long enough that the padded window rows exceed one merge chunk
    (S=78/72 -> s_pad=128 = 2 fori_loop trips of _MERGE_CHUNK=64): exercises
    the chunk-streamed full-res merge the production relight sizes run
    (aligner.py _merge), which the 20-frame tests above never reach."""
    import torch

    from rollingdepth_tpu.aligner import _MERGE_CHUNK

    RefAligner = load_reference_aligner()
    snippets = make_snippets(seq_len=80, h=18, w=18, seed=1)
    dilations = [1, 4]
    assert snippets[0].shape[0] > _MERGE_CHUNK  # multi-trip by construction

    ref = RefAligner(device=torch.device("cpu"), num_iterations=iters, factor=4)
    with contextlib.redirect_stdout(io.StringIO()):
        merged_ref, _, _, _ = ref.run(
            [torch.from_numpy(s) for s in snippets], dilations
        )

    ours = DepthAligner(AlignerConfig(num_iterations=iters, factor=4))
    merged, _, _, _ = ours.run([jnp.asarray(s) for s in snippets], dilations)
    ref_m = merged_ref.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(merged).reshape(ref_m.shape), ref_m, rtol=5e-4, atol=5e-4
    )


def test_aligner_bf16_groups_match_fp32():
    """The relight serving path feeds bf16 channel slices; prep keeps the
    source dtype and the merge casts per chunk, so a bf16-source run must
    equal an fp32 run over the SAME (bf16-rounded) values exactly."""
    snippets = [s.astype(np.float32) for s in make_snippets(seed=2)]
    bf16 = [jnp.asarray(s).astype(jnp.bfloat16) for s in snippets]
    as_f32 = [np.asarray(b, np.float32) for b in bf16]

    ours = DepthAligner(AlignerConfig(num_iterations=15, factor=4))
    merged_bf, _, _, _ = ours.run(bf16, [1, 4])
    merged_f32, _, _, _ = ours.run([jnp.asarray(s) for s in as_f32], [1, 4])
    np.testing.assert_allclose(
        np.asarray(merged_bf), np.asarray(merged_f32), rtol=1e-5, atol=1e-6
    )


def test_aligner_multichannel():
    """C>1 snippets align per-pixel across channels (subsumes my_aligner.py,
    used by the relight pipeline's per-RGB-channel runs)."""
    snippets = make_snippets()
    rgb = [np.repeat(s, 3, axis=2) for s in snippets]  # [S, 3, 3, H, W]
    ours = DepthAligner(AlignerConfig(num_iterations=10, factor=4))
    merged, scales, trans, hist = ours.run([jnp.asarray(s) for s in rgb], [1, 4])
    assert merged.shape == (20, 3, 26, 26)
    assert np.isfinite(np.asarray(merged)).all()


def test_aligner_improves_consistency():
    """After alignment, per-frame disagreement between covering windows
    should drop substantially."""
    snippets = make_snippets(seed=3)
    ours = DepthAligner(AlignerConfig(num_iterations=300, factor=2))
    merged, scales, trans, hist = ours.run([jnp.asarray(s) for s in snippets], [1, 4])
    losses = np.asarray(hist[:, 0])
    assert losses[-1] < 0.5 * losses[0]
