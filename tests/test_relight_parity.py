"""Composed end-to-end parity of the ACTIVE relight pipeline vs the torch
reference (/root/reference/rollingdepth/rollingimg_pipeline.py), run on the
same tiny SD1.5 checkpoint, same frames, same init latents.

The reference module hard-codes CUDA devices, fp16 casts, module-level disk
loads (:84-89), an IC-Light offset download (:1077-1087), a precomputed
init-latent blob (torch.load at :789-791), and a debug-video write — all
intercepted with test-scoped patches so the NUMERICS run unmodified on CPU.

The registered scheduler is swapped for the deterministic ``dpmsolver++``
variant on BOTH stacks: the reference's sde-dpmsolver++ draws noise from
torch's global RNG inside ``scheduler.step`` (:1202-1208 passes no
generator), which no cross-framework run can share.  The SDE step math
itself is parity-tested with injected noise in tests/test_schedulers.py;
this test covers everything else composed: fg/bg VAE encode -> 8-ch cond,
conv_in surgery + IC-Light offset merge, chunked prompt-pair encoding,
40-step/strength-0.5 schedule entry, snippet-joint UNet denoise, RGB decode,
and per-channel co-alignment.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.test_e2e_parity import _stub_missing_modules

REF_DIR = "/root/reference/rollingdepth"


def _install_av_stub():
    """A functional (write-swallowing) PyAV stub: the reference forward
    writes an intermediate debug video (rollingimg_pipeline.py:905-912)."""
    av = types.ModuleType("av")

    class _Stream:
        width = 0
        height = 0
        pix_fmt = ""
        options = {}

        def encode(self, frame=None):
            return []

    class _Container:
        def add_stream(self, *a, **k):
            return _Stream()

        def mux(self, packet):
            pass

        def close(self):
            pass

    class _VideoFrame:
        def __init__(self, width, height, fmt="rgb24"):
            self._arr = np.zeros((height, width, 3), np.uint8)

        def to_ndarray(self):
            return self._arr

    codec_inner = types.ModuleType("av.codec.codec")

    class UnknownCodecError(Exception):
        pass

    codec_inner.UnknownCodecError = UnknownCodecError
    codec_mod = types.ModuleType("av.codec")
    codec_mod.codec = codec_inner
    av.open = lambda *a, **k: _Container()
    av.VideoFrame = _VideoFrame
    av.codec = codec_mod
    sys.modules["av"] = av
    sys.modules["av.codec"] = codec_mod
    sys.modules["av.codec.codec"] = codec_inner


@pytest.fixture(scope="module")
def ref_relight(torch_oracle, tiny_sd15_checkpoint):
    """Load the reference rollingimg module with CPU/tiny-checkpoint patches
    and construct its pipeline.  Yields (module, pipeline, monkeypatch)."""
    import torch

    mp = pytest.MonkeyPatch()

    # --- CPU redirection: the module and its methods hard-code cuda in
    # .to() calls, tensor factories (the aligner's torch.zeros(...,
    # device=cuda)), and torch.Generator.  torch.device itself is left
    # untouched (transformers does isinstance checks against it).
    mp.setattr(torch, "float16", torch.float32)  # fp16 casts -> fp32 on CPU

    def _cpu_args(args, kwargs):
        args = tuple(
            "cpu"
            if (isinstance(a, (str, torch.device)) and "cuda" in str(a))
            else a
            for a in args
        )
        if "device" in kwargs and "cuda" in str(kwargs["device"]):
            kwargs = dict(kwargs, device="cpu")
        return args, kwargs

    real_tensor_to = torch.Tensor.to
    real_module_to = torch.nn.Module.to

    def _tensor_to(self, *args, **kwargs):
        args, kwargs = _cpu_args(args, kwargs)
        return real_tensor_to(self, *args, **kwargs)

    def _module_to(self, *args, **kwargs):
        args, kwargs = _cpu_args(args, kwargs)
        return real_module_to(self, *args, **kwargs)

    mp.setattr(torch.Tensor, "to", _tensor_to)
    mp.setattr(torch.nn.Module, "to", _module_to)
    for fname in ("zeros", "ones", "randn", "tensor", "arange", "empty", "full"):
        real_f = getattr(torch, fname)
        mp.setattr(
            torch, fname,
            (lambda rf: lambda *a, **k: rf(*_cpu_args(a, k)[0], **_cpu_args(a, k)[1]))(real_f),
        )
    real_generator = torch.Generator
    mp.setattr(torch, "Generator", lambda device=None: real_generator("cpu"))

    # --- module-level from_pretrained loads -> the tiny checkpoint
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer

    ckpt = tiny_sd15_checkpoint
    for cls in (CLIPTokenizer, CLIPTextModel, AutoencoderKL, UNet2DConditionModel):
        orig = cls.from_pretrained.__func__
        mp.setattr(
            cls, "from_pretrained",
            classmethod(lambda c, path, _orig=orig, **kw: _orig(c, ckpt, **kw)),
        )

    # --- RMBG hub load -> random-init tiny instance (never used on the
    # tested path: the reference's run_rmbg call is disabled, :520-521)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import briarmbg

    mp.setattr(
        briarmbg.BriaRMBG, "from_pretrained", classmethod(lambda c, *a, **k: c())
    )

    _install_av_stub()
    _stub_missing_modules()

    pkg = types.ModuleType("ref_rollingimg")
    pkg.__path__ = [REF_DIR]
    sys.modules.setdefault("ref_rollingimg", pkg)
    name = "ref_rollingimg.rollingimg_pipeline"
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_DIR, "rollingimg_pipeline.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)

    # --- runtime patches ------------------------------------------------
    # IC-Light offset: './models/iclight_sd15_fbc.safetensors' does not
    # exist -> download_url_to_file is a no-op and sf.load_file redirects to
    # the fixture's offset file
    import safetensors.torch as real_sf

    offset_path = os.path.join(ckpt, "iclight_sd15_fbc.safetensors")
    mp.setattr(mod, "download_url_to_file", lambda url, dst: None)
    mp.setattr(
        mod, "sf",
        types.SimpleNamespace(load_file=lambda p: real_sf.load_file(offset_path)),
    )

    # deterministic scheduler on the oracle side: __init__ registers the
    # MODULE-LEVEL scheduler regardless of its argument (:455)
    from diffusers import DPMSolverMultistepScheduler as TorchDPM

    det_sched = TorchDPM(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        algorithm_type="dpmsolver++", use_karras_sigmas=True, steps_offset=1,
    )
    mp.setattr(mod, "dpmpp_2m_sde_karras_scheduler", det_sched)

    pipe = mod.RollingDepthPipeline(
        unet=mod.unet, vae=mod.vae, scheduler=det_sched,
        text_encoder=mod.text_encoder, tokenizer=mod.tokenizer,
    )
    torch.set_grad_enabled(False)
    yield mod, pipe, mp
    mp.undo()


def _frames(n=8, h=32, w=32, seed=21):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3, h, w).astype(np.float32) * 2 - 1).round(3)


def test_composed_relight_parity(ref_relight, tiny_sd15_checkpoint, monkeypatch):
    import torch

    mod, ref_pipe, _ = ref_relight
    frames_fg = _frames(seed=21)
    frames_bg = _frames(seed=22)
    n, h_lat, w_lat = 8, 16, 16  # tiny VAE: factor 2
    init_blob = np.random.RandomState(5).randn(n, 1, 4, h_lat, w_lat).astype(np.float32)

    # the reference loads its init latents from the missing
    # t2i_latents_8090.pt blob; intercept torch.load for that path
    real_load = torch.load
    monkeypatch.setattr(
        torch, "load",
        lambda path, *a, **k: (
            torch.from_numpy(init_blob)
            if "t2i_latents" in str(path) else real_load(path, *a, **k)
        ),
    )

    ref_out = ref_pipe.forward(
        input_fg_frames=torch.from_numpy(frames_fg)[None],
        input_bg_frames=torch.from_numpy(frames_bg)[None],
        dilations=[1, 2],
        cap_dilation=False,
        snippet_lengths=[3],
        init_infer_steps=[1],
        strides=[1],
        coalign_kwargs=dict(num_iterations=300),
        refine_step=0,
        refine_snippet_len=3,
        refine_start_dilation=2,
        generator=None,
        verbose=False,
        max_vae_bs=4,
        unload_snippet=False,
    )

    # ---- our stack on the same checkpoint, scheduler config, and init
    from rollingdepth_tpu.io.pretrained_relight import load_relight_pipeline
    from rollingdepth_tpu.schedulers.dpmsolver import (
        DPMSolverConfig, DPMSolverMultistepScheduler,
    )

    jax_pipe = load_relight_pipeline(tiny_sd15_checkpoint, dtype="fp32",
                                     snippet_batch=4)
    jax_pipe.scheduler = DPMSolverMultistepScheduler(DPMSolverConfig(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="linear", algorithm_type="dpmsolver++",
        use_karras_sigmas=True, steps_offset=1,
    ))
    jax_out = jax_pipe.forward(
        frames_fg, frames_bg, dilations=[1, 2], cap_dilation=False,
        coalign_kwargs=dict(num_iterations=300), seed=12345,
        max_vae_bs=4, init_latents_override=init_blob[:, 0],
    )

    # snippet predictions BEFORE alignment: the tightest composed signal
    # (encode -> surgery/merge -> prompts -> 20-step denoise -> decode)
    for i in range(2):
        ref_snip = ref_out.snippet_ls[i].numpy()  # [S, n, 3, H, W]
        jax_snip = jax_out.snippet_ls[i]
        assert ref_snip.shape == jax_snip.shape
        np.testing.assert_allclose(jax_snip, ref_snip, atol=5e-3, rtol=1e-3)

    # final per-channel coaligned outputs
    for ref_c, jax_c in (
        (ref_out.R_pred.numpy(), jax_out.R_pred),
        (ref_out.G_pred.numpy(), jax_out.G_pred),
        (ref_out.B_pred.numpy(), jax_out.B_pred),
    ):
        assert ref_c.shape == jax_c.shape
        corr = np.corrcoef(ref_c.ravel(), jax_c.ravel())[0, 1]
        diff = np.abs(ref_c - jax_c)
        print(f"relight parity: corr={corr:.5f} max|d|={diff.max():.4f}")
        assert corr > 0.999, f"corr={corr}"
        assert diff.max() < 3e-2, f"max diff {diff.max()}"
