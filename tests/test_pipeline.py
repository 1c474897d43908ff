"""End-to-end depth pipeline smoke tests on tiny models (CPU-runnable,
BASELINE.json config[0] idiom: small snippet, 1-step denoise, dilation [1])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline
from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler


@pytest.fixture(scope="module")
def tiny_pipeline():
    unet = UNet2DCondition(UNetConfig.tiny(in_channels=8))
    vae = AutoencoderKL(VAEConfig.tiny())
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    unet_params = unet.init(k1)
    vae_params = vae.init(k2)
    text = jax.random.normal(k3, (1, 2, 8), dtype=jnp.float32)
    sched = DDIMScheduler(
        DDIMConfig(beta_schedule="scaled_linear", timestep_spacing="trailing", prediction_type="epsilon")
    )
    return RollingDepthPipeline(
        unet, unet_params, vae, vae_params, sched, text,
        dtype=jnp.float32, snippet_batch=4,
    )


def _frames(n=8, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(n, 3, h, w).astype(np.float32) * 2 - 1


def test_pipeline_single_dilation(tiny_pipeline):
    out = tiny_pipeline.forward(_frames(), dilations=[1], seed=0)
    assert out.depth_pred.shape == (8, 1, 32, 32)
    assert out.depth_coaligned.shape == (8, 1, 32, 32)
    assert len(out.snippet_ls) == 1
    assert out.snippet_ls[0].shape == (6, 3, 1, 32, 32)  # S = 8 - 2*1
    assert np.isfinite(out.depth_pred).all()
    # renormalized to [-1, 1]
    assert out.depth_pred.min() >= -1.0001 and out.depth_pred.max() <= 1.0001


def test_pipeline_multi_dilation_and_refine(tiny_pipeline):
    out = tiny_pipeline.forward(
        _frames(n=10), dilations=[1, 3], refine_step=2,
        refine_snippet_len=3, refine_start_dilation=2, seed=1,
    )
    assert out.depth_pred.shape == (10, 1, 32, 32)
    assert len(out.snippet_ls) == 2
    assert np.isfinite(out.depth_pred).all()


def test_pipeline_latent_merge_turbo(tiny_pipeline):
    """merge_in_latent: snippet latents aligned+merged in latent space, ONE
    decode of N frames.  Output must stay close to the decode-all-snippets
    reference merge path (exact drift bound vs the torch oracle lives in
    test_e2e_parity.py::test_latent_merge_close_to_reference)."""
    frames = _frames(n=10)
    ref = tiny_pipeline.forward(frames, dilations=[1, 3], seed=2)
    turbo = tiny_pipeline.forward(
        frames, dilations=[1, 3], seed=2, merge_in_latent=True,
        latent_coalign_kwargs=dict(factor=1),
    )
    assert turbo.depth_pred.shape == (10, 1, 32, 32)
    assert turbo.snippet_ls == []
    assert np.isfinite(turbo.depth_pred).all()
    corr = np.corrcoef(ref.depth_pred.ravel(), turbo.depth_pred.ravel())[0, 1]
    assert corr > 0.99, f"turbo vs standard merge corr={corr}"

    # turbo composes with refinement (merged latents -> decode -> normalize
    # -> re-encode -> refine), same as the reference refine entry
    turbo_ref = tiny_pipeline.forward(
        frames, dilations=[1, 3], refine_step=2, refine_snippet_len=3,
        refine_start_dilation=2, seed=2, merge_in_latent=True,
        latent_coalign_kwargs=dict(factor=1),
    )
    assert np.isfinite(turbo_ref.depth_pred).all()


def test_mixed_chunk_matches_uniform(tiny_pipeline):
    """11 snippets at snippet_batch=8 take the mixed-chunk path (one 8-chunk
    trip + a 4-chunk remainder program); deterministic DDIM denoise must give
    the same depth as a single uniformly-chunked program."""
    frames = _frames(n=13)  # dilation [1] -> S = 11 snippets
    old = tiny_pipeline.snippet_batch
    try:
        tiny_pipeline.snippet_batch = 8
        a = tiny_pipeline.forward(frames, dilations=[1], seed=3)
        tiny_pipeline.snippet_batch = 16  # small-s clamp -> one 12-chunk
        b = tiny_pipeline.forward(frames, dilations=[1], seed=3)
    finally:
        tiny_pipeline.snippet_batch = old
    np.testing.assert_allclose(
        np.asarray(a.depth_pred), np.asarray(b.depth_pred), atol=1e-5, rtol=1e-5
    )


def test_pipeline_deterministic(tiny_pipeline):
    a = tiny_pipeline.forward(_frames(), dilations=[1], seed=7)
    b = tiny_pipeline.forward(_frames(), dilations=[1], seed=7)
    np.testing.assert_array_equal(a.depth_pred, b.depth_pred)


def test_pipeline_cap_dilation(tiny_pipeline):
    # dilation 25 must be capped for 8 frames: floor(8/3)-1 = 1
    out = tiny_pipeline.forward(_frames(), dilations=[1, 25], cap_dilation=True, seed=0)
    assert len(out.snippet_ls) == 2
    assert out.snippet_ls[1].shape[0] == 8 - 2 * 1


def test_pipeline_shared_init_noise_consistency(tiny_pipeline):
    """All snippets start from the same init noise (temporal-consistency
    trick, reference rollingdepth_pipeline.py:282-288): identical frames must
    yield identical per-frame depth."""
    f = _frames(n=6)
    f[:] = f[0]  # constant video
    out = tiny_pipeline.forward(f, dilations=[1], seed=0)
    # raw snippets must be bit-identical across frames and windows
    sn = out.snippet_ls[0]
    np.testing.assert_array_equal(sn[0, 1], sn[0, 0])
    np.testing.assert_array_equal(sn[1], sn[0])
    # after alignment: tiny drift is expected (float rounding of the
    # per-frame mean target feeds 2000 L1-Adam steps — same as reference)
    d = out.depth_coaligned
    for i in range(1, 6):
        np.testing.assert_allclose(d[i], d[0], rtol=5e-3, atol=5e-3)


def test_iclight_passthrough_pipeline(tiny_pipeline):
    """Gen-2 experiment: output reconstructs the input through the VAE
    (iclight_pipeline.py semantics)."""
    from rollingdepth_tpu.pipelines.iclight import ICLightPassthroughPipeline

    pipe = ICLightPassthroughPipeline(tiny_pipeline)
    frames = _frames(n=6)
    out = pipe.forward(frames, dilations=[1, 2], seed=0)
    assert out.shape == (6, 3, 32, 32)
    assert np.isfinite(out).all()
    assert out.min() >= -1.001 and out.max() <= 1.001


def test_pipeline_device_input_and_deferred_fetch(tiny_pipeline):
    """Pipelined-serving path: a device-resident uint8 clip (upload done by
    the caller, e.g. while the previous clip computed) plus
    ``fetch_output=False`` must produce the exact same depth as the plain
    host-roundtrip call once fetched with ``fetch_depth``."""
    from rollingdepth_tpu.pipelines.rollingdepth import _upload

    frames8 = (np.random.RandomState(3).rand(8, 3, 32, 32) * 255).astype(np.uint8)
    ref = tiny_pipeline.forward(frames8, dilations=[1], seed=0)
    out = tiny_pipeline.forward(
        _upload(frames8), dilations=[1], seed=0, fetch_output=False
    )
    assert not isinstance(out.depth_pred, np.ndarray)  # still on device
    got = RollingDepthPipeline.fetch_depth(out.depth_pred)
    np.testing.assert_allclose(got, ref.depth_pred, atol=1e-6)


def test_dilation_batching_matches_per_dilation(tiny_pipeline):
    """The batched all-dilations denoise (forward's concat fast path) must
    equal running each dilation's snippet set through _infer_snippets
    separately — the snippets are independent work items, so only chunking
    changes."""
    frames = _frames(n=10)
    from rollingdepth_tpu.pipelines.snippets import snippet_index_matrix

    dev = jnp.asarray(frames)
    nhwc = jnp.transpose(dev, (0, 2, 3, 1))
    rgb_latent = tiny_pipeline._encode_frames(nhwc, 4)
    h, w = rgb_latent.shape[1:3]
    noise = jax.random.normal(jax.random.PRNGKey(3), (h, w, 4), jnp.float32)

    idx_ls = [snippet_index_matrix(10, 3, d) for d in (1, 3)]
    sep = [
        np.asarray(tiny_pipeline._infer_snippets(rgb_latent, noise, idx, 1))
        for idx in idx_ls
    ]
    batched = np.asarray(
        tiny_pipeline._infer_snippets(
            rgb_latent, noise, np.concatenate(idx_ls, axis=0), 1
        )
    )
    ofs = 0
    for idx, ref in zip(idx_ls, sep):
        got = batched[ofs : ofs + idx.shape[0]]
        ofs += idx.shape[0]
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_pipeline_strided_windows(tiny_pipeline):
    """strides > 1 (EXCEEDS the reference, whose pipeline raises
    NotImplementedError for any stride != 1 at rollingdepth_pipeline.py:
    240-241): chain-strided windows run end-to-end, cut the window count
    ~stride x, and stay correlated with the stride-1 prediction."""
    frames = _frames(n=12, seed=3)
    kwargs = dict(dilations=[1, 2], cap_dilation=False, seed=7)
    out1 = tiny_pipeline.forward(frames, strides=[1], **kwargs)
    out2 = tiny_pipeline.forward(frames, strides=[2], **kwargs)

    # d=1: stride-1 has 10 windows, stride-2 tiles 12 frames every 2 -> 5;
    # d=2: 8 vs 2 chains of 6 -> 2*ceil((6-3)/2+1)=6... head/tail clamps
    assert out1.snippet_ls[0].shape[0] == 10
    assert out2.snippet_ls[0].shape[0] < out1.snippet_ls[0].shape[0]
    assert out2.snippet_ls[1].shape[0] < out1.snippet_ls[1].shape[0]
    assert out2.depth_pred.shape == (12, 1, 32, 32)
    assert np.isfinite(out2.depth_pred).all()

    a = np.asarray(out1.depth_pred).ravel()
    b = np.asarray(out2.depth_pred).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    # fewer covering windows = less overlap smoothing; on the random-weight
    # fixture the predictions are textures, so the bound catches wiring
    # errors (wrong indices decorrelate), not quality claims
    assert corr > 0.55, corr

    # per-dilation strides broadcast/validate like the reference's contract
    out3 = tiny_pipeline.forward(frames, strides=[1, 2], **kwargs)
    assert out3.snippet_ls[0].shape[0] == 10
    assert out3.snippet_ls[1].shape[0] == out2.snippet_ls[1].shape[0]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        tiny_pipeline.forward(frames, strides=[4], **kwargs)
