"""Bisect the relight composed-program TPU worker crash (open investigation).

Symptom (2026-08-17, v5e via dev tunnel): the composed relight infer program
(640x720, 20-step SDE scan + in-program chunked decode) crashes the TPU
worker ("kernel fault") deterministically, while every component passes
standalone at identical shapes: flash kernels d=40/80/160 (parity OK), the
full 12-ch SD1.5 UNet forward (133 TF/s), the 16-frame VAE decode
(142 TF/s).  The composed program is the only place the UNet Pallas kernels
and the VAE mid-block Pallas kernel share one XLA module — the variants
below discriminate that hypothesis.  Each crashing run can take down the
tunnel relay: run the LEAST likely to crash first.

variants:
  xla       - whole pipeline, all attention on the XLA path
  flash     - as-shipped (auto flash)           [known crash at 24f; repro]
  nodecode  - flash UNet scan, decode stubbed to zeros
  xladecode - UNet attention XLA, decode real (flash in VAE mid-block auto)
  decpass   - flash everywhere, decode as its OWN program (decode_in_program=False)
  flash40 / flash80 / flash160 - force flash ONLY at that head dim, XLA rest
usage: python bisect_relight.py <variant> [n_frames]
"""
import os, sys, time
import numpy as np

variant = sys.argv[1]
nf = int(sys.argv[2]) if len(sys.argv) > 2 else 6

if variant == "xla":
    os.environ["ROLLINGDEPTH_ATTN"] = "xla"

import jax, jax.numpy as jnp
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import rollingdepth_tpu.models.layers as layers
_orig_dpa = layers.dot_product_attention
if variant in ("flash40", "flash80", "flash160"):
    want_d = int(variant[5:])
    def sel(q, k, v, use_flash=None):
        if q.shape[-1] == want_d and q.shape[1] == k.shape[1]:
            return _orig_dpa(q, k, v, use_flash=True)
        return _orig_dpa(q, k, v, use_flash=False)
    layers.dot_product_attention = sel
elif variant == "xladecode":
    layers.dot_product_attention = lambda q, k, v, use_flash=None: _orig_dpa(
        q, k, v, use_flash=(None if q.shape[-1] > 256 else False))

from rollingdepth_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
from rollingdepth_tpu.pipelines.rollingimg import RollingImgPipeline
import rollingdepth_tpu.pipelines.rollingimg as ri
from rollingdepth_tpu.schedulers.dpmsolver import DPMSolverConfig, DPMSolverMultistepScheduler
from rollingdepth_tpu.utils.bench_init import device_random_params

class Tok:
    model_max_length = 77
    bos_token_id = 49406
    eos_token_id = 49407
    def tokenize_ids(self, text):
        return [hash(t) % 49000 for t in text.split()]

h, w = 640, 720
unet = UNet2DCondition(UNetConfig.sd15(in_channels=12))
vae = AutoencoderKL(VAEConfig())
text_model = CLIPTextModel(CLIPTextConfig.sd15())
up = device_random_params(lambda: unet.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(0), jnp.bfloat16)
vp = device_random_params(lambda: vae.init(jax.random.PRNGKey(1)), jax.random.PRNGKey(1), jnp.bfloat16)
tp = device_random_params(lambda: text_model.init(jax.random.PRNGKey(2)), jax.random.PRNGKey(2), jnp.bfloat16)

sched = DPMSolverMultistepScheduler(DPMSolverConfig(
    beta_start=0.00085, beta_end=0.012, algorithm_type="sde-dpmsolver++",
    use_karras_sigmas=True, steps_offset=1))
pipe = RollingImgPipeline(unet, up, vae, vp, sched, Tok(),
                          lambda ids: text_model.apply(tp, ids),
                          dtype=jnp.bfloat16, snippet_batch=4)

if variant == "decpass":
    pipe.decode_in_program = False

if variant == "nodecode":
    class StubVAE:
        def __init__(self, real): self._real = real
        def __getattr__(self, a): return getattr(self._real, a)
        def decode(self, params, z):
            return jnp.zeros(z.shape[:1] + (z.shape[1] * 8, z.shape[2] * 8, 3), z.dtype)
    pipe.vae = StubVAE(vae)

print(f"[bisect:{variant}] setup done", flush=True)
r = np.random.RandomState(0)
fg = (r.rand(nf, 3, h, w).astype(np.float32) * 2 - 1)
bg = (r.rand(nf, 3, h, w).astype(np.float32) * 2 - 1)
init = r.randn(nf, 4, h // 8, w // 8).astype(np.float32)
t0 = time.perf_counter()
out = pipe.forward(fg, bg, init_latents_override=init, dilations=[1],
                   max_vae_bs=8, fetch_output=False, verbose=True, seed=7)
for chan in (out.R_pred, out.G_pred, out.B_pred):
    ok = np.isfinite(np.asarray(chan)).all()
    assert ok or variant == "nodecode", "non-finite output"
print(f"[bisect:{variant}] OK {time.perf_counter()-t0:.1f}s phases={pipe.last_timings}", flush=True)
