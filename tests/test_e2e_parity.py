"""Composed end-to-end numerical parity vs the reference torch pipeline.

Runs /root/reference/rollingdepth/rollingdepth_pipeline.py (torch CPU, loaded
directly from file as a numerical oracle) and our JAX RollingDepthPipeline on
the SAME tiny checkpoint, same frames, same shared init-noise draw, and
asserts the final depth maps agree — the strongest available proxy for the
"AbsRel within 1% of the PyTorch reference" target (no real checkpoints exist
in this environment).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _stub_missing_modules():
    """The reference module imports av (PyAV) and torchvision at top level;
    neither is installed and neither is used on the tested path."""
    if "av" not in sys.modules:
        sys.modules["av"] = types.ModuleType("av")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        trf = types.ModuleType("torchvision.transforms.functional")

        class InterpolationMode:  # only touched by the restore_res path
            BILINEAR = "bilinear"

        tr.InterpolationMode = InterpolationMode
        trf.resize = None
        tv.transforms = tr
        tr.functional = trf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = trf


def load_reference_pipeline_module(torch_oracle):
    _stub_missing_modules()
    pkg = types.ModuleType("ref_rollingdepth")
    pkg.__path__ = ["/root/reference/rollingdepth"]
    sys.modules.setdefault("ref_rollingdepth", pkg)
    name = "ref_rollingdepth.rollingdepth_pipeline"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/reference/rollingdepth/rollingdepth_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_pipe(torch_oracle, tiny_checkpoint):
    import torch
    from diffusers import AutoencoderKL, DDIMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer

    mod = load_reference_pipeline_module(torch_oracle)
    unet = UNet2DConditionModel.from_pretrained(tiny_checkpoint, subfolder="unet")
    vae = AutoencoderKL.from_pretrained(tiny_checkpoint, subfolder="vae")
    scheduler = DDIMScheduler.from_pretrained(tiny_checkpoint, subfolder="scheduler")
    text_encoder = CLIPTextModel.from_pretrained(tiny_checkpoint, subfolder="text_encoder")
    tokenizer = CLIPTokenizer.from_pretrained(tiny_checkpoint, subfolder="tokenizer")
    pipe = mod.RollingDepthPipeline(
        unet=unet.eval(), vae=vae.eval(), scheduler=scheduler,
        text_encoder=text_encoder.eval(), tokenizer=tokenizer,
    )
    torch.set_grad_enabled(False)
    return pipe


@pytest.fixture(scope="module")
def jax_pipe(tiny_checkpoint):
    from rollingdepth_tpu.io.pretrained import load_pipeline

    return load_pipeline(tiny_checkpoint, dtype="fp32")


def _frames(n=8, h=32, w=32, seed=3):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3, h, w).astype(np.float32) * 2 - 1).round(3)


COALIGN = dict(num_iterations=300)


def _run_ref(ref_pipe, frames, init_noise, refine_step=0):
    import torch

    out = ref_pipe.forward(
        input_frames=torch.from_numpy(frames)[None],
        dilations=[1, 2],
        cap_dilation=False,
        snippet_lengths=[3],
        init_infer_steps=[1],
        strides=[1],
        coalign_kwargs=dict(COALIGN),
        refine_step=refine_step,
        refine_snippet_len=3,
        refine_start_dilation=2,
        generator=init_noise,  # see monkeypatched torch.randn below
        verbose=False,
        max_vae_bs=4,
        unload_snippet=False,
    )
    return out


def _patched_randn(torch, init_noise):
    """Make the reference's generator-seeded randn produce our fixed noise.

    Cleaner than replaying generator state: the reference draws exactly one
    noise tensor (rollingdepth_pipeline.py:281-287); we intercept randn calls
    whose `generator` is the fixed-noise sentinel array."""
    real_randn = torch.randn

    def randn(*shape, **kw):
        gen = kw.get("generator")
        if isinstance(gen, np.ndarray):
            t = torch.from_numpy(gen)[None].to(dtype=kw.get("dtype", torch.float32))
            assert tuple(t.shape) == tuple(shape[0] if len(shape) == 1 else shape)
            return t
        return real_randn(*shape, **kw)

    return randn


def test_e2e_depth_parity(ref_pipe, jax_pipe, monkeypatch):
    """Full-stack: encode -> per-dilation 1-step snippet denoise -> decode ->
    2000-iter-style co-align (300 iters both sides) must agree end to end."""
    import torch

    frames = _frames()
    # tiny VAE has 2 blocks -> spatial factor 2: 32x32 frames -> 16x16 latents
    init_noise = np.random.RandomState(7).randn(4, 16, 16).astype(np.float32)

    monkeypatch.setattr(torch, "randn", _patched_randn(torch, init_noise))
    ref_out = _run_ref(ref_pipe, frames, init_noise, refine_step=0)
    ref_depth = ref_out.depth_pred.squeeze(0).numpy()  # [N, 1, H, W]

    jax_out = jax_pipe.forward(
        input_frames=frames,
        dilations=[1, 2],
        cap_dilation=False,
        snippet_lengths=[3],
        init_infer_steps=[1],
        strides=[1],
        coalign_kwargs=dict(COALIGN),
        refine_step=0,
        max_vae_bs=4,
        init_noise=init_noise,
    )
    jax_depth = jax_out.depth_pred  # [N, 1, H, W]

    assert ref_depth.shape == jax_depth.shape
    # both renormalized to [-1, 1]; require tight pointwise agreement
    diff = np.abs(ref_depth - jax_depth)
    corr = np.corrcoef(ref_depth.ravel(), jax_depth.ravel())[0, 1]
    assert corr > 0.999, f"corr={corr}"
    assert diff.max() < 2e-2, f"max diff {diff.max()} (mean {diff.mean()})"


def test_latent_merge_close_to_reference(ref_pipe, jax_pipe, monkeypatch):
    """TURBO latent-space merge drift bound vs the torch reference merge.

    The turbo mode (merge_in_latent=True) solves per-snippet (s, t) over
    snippet LATENTS, averages overlapping windows in latent space, and
    decodes N frames once — vs the reference's decode-all-snippets,
    align-in-depth-space merge (depth_aligner.py:231-262 after
    rollingdepth_pipeline.py:706-740).  The approximation drift on the
    composed e2e fixture must stay inside the documented tolerance
    (corr > 0.995) for turbo to be the fast-preset default."""
    import torch

    frames = _frames(seed=6)
    init_noise = np.random.RandomState(13).randn(4, 16, 16).astype(np.float32)

    monkeypatch.setattr(torch, "randn", _patched_randn(torch, init_noise))
    ref_out = _run_ref(ref_pipe, frames, init_noise, refine_step=0)
    ref_depth = ref_out.depth_pred.squeeze(0).numpy()

    jax_out = jax_pipe.forward(
        input_frames=frames,
        dilations=[1, 2],
        cap_dilation=False,
        snippet_lengths=[3],
        init_infer_steps=[1],
        strides=[1],
        refine_step=0,
        max_vae_bs=4,
        init_noise=init_noise,
        merge_in_latent=True,
        # 16x16 tiny latents: subsample 1 keeps enough pixels for the solve
        latent_coalign_kwargs=dict(factor=1, num_iterations=300),
    )
    jax_depth = jax_out.depth_pred

    assert ref_depth.shape == jax_depth.shape
    assert jax_out.snippet_ls == []  # turbo never decodes snippets
    assert np.isfinite(jax_depth).all()
    corr = np.corrcoef(ref_depth.ravel(), jax_depth.ravel())[0, 1]
    diff = np.abs(ref_depth - jax_depth)
    print(f"turbo drift: corr={corr:.5f} mean|d|={diff.mean():.4f} max|d|={diff.max():.4f}")
    assert corr > 0.995, f"corr={corr}"
    assert diff.mean() < 5e-2, f"mean diff {diff.mean()} (max {diff.max()})"


def test_e2e_depth_parity_with_refine(ref_pipe, jax_pipe, monkeypatch):
    """Same composition plus the rolling refinement loop (refine_step=2)."""
    import torch

    frames = _frames(seed=4)
    init_noise = np.random.RandomState(11).randn(4, 16, 16).astype(np.float32)

    monkeypatch.setattr(torch, "randn", _patched_randn(torch, init_noise))
    ref_out = _run_ref(ref_pipe, frames, init_noise, refine_step=2)
    ref_depth = ref_out.depth_pred.squeeze(0).numpy()

    jax_out = jax_pipe.forward(
        input_frames=frames,
        dilations=[1, 2],
        cap_dilation=False,
        snippet_lengths=[3],
        init_infer_steps=[1],
        strides=[1],
        coalign_kwargs=dict(COALIGN),
        refine_step=2,
        refine_snippet_len=3,
        refine_start_dilation=2,
        max_vae_bs=4,
        init_noise=init_noise,
    )
    jax_depth = jax_out.depth_pred

    assert ref_depth.shape == jax_depth.shape
    corr = np.corrcoef(ref_depth.ravel(), jax_depth.ravel())[0, 1]
    diff = np.abs(ref_depth - jax_depth)
    assert corr > 0.999, f"corr={corr}"
    assert diff.max() < 3e-2, f"max diff {diff.max()} (mean {diff.mean()})"


def test_turbo_refine_close_to_reference(ref_pipe, jax_pipe, monkeypatch):
    """TURBO refinement drift bound vs the full reference refine path.

    The DEFAULT turbo full/paper-preset path under test
    (pipelines/rollingdepth.py forward):
    (1) merge_in_latent — solve + merge over snippet latents;
    (2) the reference refine hand-off: decode merged latent ->
        minmax-renorm -> re-encode (refine_in_latent stays OFF — skipping
        the renormalization measurably drifts, see the experimental test
        below);
    (3) turbo_refine — partition windows (~N/n UNet evals per refine step)
        instead of stride-1 windows (~N evals), phase-rotated across steps
        (snippets.partition_index_matrix).
    The composed drift vs the torch reference's refined output must stay
    inside the documented tolerance for turbo to be the full/paper-preset
    default."""
    import torch

    frames = _frames(seed=9)
    init_noise = np.random.RandomState(17).randn(4, 16, 16).astype(np.float32)

    monkeypatch.setattr(torch, "randn", _patched_randn(torch, init_noise))
    ref_out = _run_ref(ref_pipe, frames, init_noise, refine_step=2)
    ref_depth = ref_out.depth_pred.squeeze(0).numpy()

    jax_out = jax_pipe.forward(
        input_frames=frames,
        dilations=[1, 2],
        cap_dilation=False,
        snippet_lengths=[3],
        init_infer_steps=[1],
        strides=[1],
        refine_step=2,
        refine_snippet_len=3,
        refine_start_dilation=2,
        max_vae_bs=4,
        init_noise=init_noise,
        merge_in_latent=True,
        latent_coalign_kwargs=dict(factor=1, num_iterations=300),
        # pin the defaults explicitly: reference hand-off + partition windows
        refine_in_latent=False,
        turbo_refine=True,
    )
    jax_depth = jax_out.depth_pred

    assert ref_depth.shape == jax_depth.shape
    assert jax_out.snippet_ls == []
    assert np.isfinite(jax_depth).all()
    corr = np.corrcoef(ref_depth.ravel(), jax_depth.ravel())[0, 1]
    diff = np.abs(ref_depth - jax_depth)
    print(f"turbo refine drift: corr={corr:.5f} mean|d|={diff.mean():.4f} "
          f"max|d|={diff.max():.4f}")
    assert corr > 0.99, f"corr={corr}"
    assert diff.mean() < 8e-2, f"mean diff {diff.mean()} (max {diff.max()})"


def test_refine_in_latent_experimental_drift(ref_pipe, jax_pipe, monkeypatch):
    """The EXPERIMENTAL latent-direct refine hand-off (refine_in_latent=True)
    skips the reference's minmax renormalization between co-alignment and
    refinement (rollingdepth_pipeline.py:315-343).  This documents WHY it is
    opt-in: on the composed fixture the drift is an order of magnitude above
    the default turbo path (corr ~0.87 vs >0.999) — the output must remain
    structurally sane (finite, positively correlated) but is not
    parity-grade."""
    import torch

    frames = _frames(seed=9)
    init_noise = np.random.RandomState(17).randn(4, 16, 16).astype(np.float32)

    monkeypatch.setattr(torch, "randn", _patched_randn(torch, init_noise))
    ref_out = _run_ref(ref_pipe, frames, init_noise, refine_step=2)
    ref_depth = ref_out.depth_pred.squeeze(0).numpy()

    jax_out = jax_pipe.forward(
        input_frames=frames,
        dilations=[1, 2],
        cap_dilation=False,
        refine_step=2,
        refine_start_dilation=2,
        max_vae_bs=4,
        init_noise=init_noise,
        merge_in_latent=True,
        latent_coalign_kwargs=dict(factor=1, num_iterations=300),
        refine_in_latent=True,
        turbo_refine=True,
    )
    jax_depth = jax_out.depth_pred
    assert ref_depth.shape == jax_depth.shape
    assert np.isfinite(jax_depth).all()
    corr = np.corrcoef(ref_depth.ravel(), jax_depth.ravel())[0, 1]
    print(f"refine_in_latent experimental drift: corr={corr:.5f}")
    assert corr > 0.6, f"corr={corr} — experimental path structurally broken"


def test_turbo_refine_device_serving_skips_coaligned(jax_pipe):
    """fetch_output=False + refine_in_latent (explicit opt-in): the coaligned
    depth decode is skipped entirely (depth_coaligned is None), depth_pred
    stays on device."""
    import jax.numpy as jnp

    frames = _frames(seed=12)
    out = jax_pipe.forward(
        input_frames=frames,
        dilations=[1, 2],
        cap_dilation=False,
        refine_step=2,
        refine_start_dilation=2,
        max_vae_bs=4,
        seed=0,
        merge_in_latent=True,
        latent_coalign_kwargs=dict(factor=1, num_iterations=8),
        refine_in_latent=True,
        fetch_output=False,
    )
    assert out.depth_coaligned is None
    assert isinstance(out.depth_pred, jnp.ndarray)
    fetched = jax_pipe.fetch_depth(out.depth_pred)
    assert np.isfinite(fetched).all()
    assert fetched.shape == (frames.shape[0], 1, 32, 32)
