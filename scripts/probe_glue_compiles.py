#!/usr/bin/env python
"""Probe: count per-new-clip-length glue compiles on the depth pipeline.

The heavy programs are keyed on chunk/bucket shapes (compile-stable across
clip lengths — tests/test_compile_stability.py); what remains at a NEW
length is "glue": eager pad/slice/reshape dispatches plus any program still
keyed on raw shapes.  On the 28 ms-dispatch tunnel each glue compile costs
~1.7 s serialized, so ~120 glue programs = ~3.5 min of new-length latency
(doc/ROADMAP.md "New-length compile cost").  This probe prints the exact
compile list for (cold, same length, new length) so reductions can be
verified program-by-program.

Usage: python scripts/probe_glue_compiles.py [--turbo|--reference] [--refine N]
Runs on CPU (JAX_PLATFORMS=cpu recommended).
"""
import collections
import logging
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


class CompileLog(logging.Handler):
    """Records compiled-program names; with trace=True also the repo-side
    call site (compiles happen synchronously inside the eager op call, so
    the Python stack at emit time names the source line)."""

    def __init__(self, trace=False):
        super().__init__()
        self.compiled = []
        self.sites = []
        self.trace = trace

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling "):
            name = msg.split(" with ")[0].removeprefix("Compiling ")
            self.compiled.append(name)
            if self.trace:
                import traceback

                site = "?"
                for fr in reversed(traceback.extract_stack()):
                    if "/rollingdepth_tpu/" in fr.filename or fr.filename.endswith(
                        ("aligner.py", "rollingdepth.py", "rollingimg.py")
                    ):
                        site = f"{fr.filename.split('/')[-1]}:{fr.lineno}"
                        break
                self.sites.append((name, site))


def main():
    args = sys.argv[1:]
    turbo = "--reference" not in args
    refine = 2
    if "--refine" in args:
        refine = int(args[args.index("--refine") + 1])
    # --dilations 1,10,25 --frames 60,60,66,73: reproduce a preset's window
    # structure (e.g. paper = uncapped [1,10,25]) at tiny model scale
    dilations = [1, 2, 3]
    if "--dilations" in args:
        dilations = [int(d) for d in args[args.index("--dilations") + 1].split(",")]
    frame_seq = [20, 20, 26, 31]
    if "--frames" in args:
        frame_seq = [int(n) for n in args[args.index("--frames") + 1].split(",")]

    from rollingdepth_tpu.models.unet import UNet2DCondition, UNetConfig
    from rollingdepth_tpu.models.vae import AutoencoderKL, VAEConfig
    from rollingdepth_tpu.pipelines.rollingdepth import RollingDepthPipeline, _upload
    from rollingdepth_tpu.schedulers.ddim import DDIMConfig, DDIMScheduler

    unet = UNet2DCondition(UNetConfig(
        sample_size=8, in_channels=8, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=4,
    ))
    vae = AutoencoderKL(VAEConfig.tiny())
    pipe = RollingDepthPipeline(
        unet, unet.init(jax.random.PRNGKey(0)),
        vae, vae.init(jax.random.PRNGKey(1)),
        DDIMScheduler(DDIMConfig(beta_schedule="scaled_linear",
                                 timestep_spacing="trailing")),
        jnp.zeros((1, 2, 16), jnp.float32),
        dtype=jnp.float32, snippet_batch=4, vae_batch=4,
    )
    kwargs = dict(
        dilations=dilations, cap_dilation=False, refine_step=refine, seed=0,
        max_vae_bs=4, fetch_output=False, merge_in_latent=turbo,
        coalign_kwargs={"num_iterations": 8},
        latent_coalign_kwargs={"num_iterations": 8, "factor": 1},
    )
    rng = np.random.RandomState(0)

    handler = CompileLog()
    jax.config.update("jax_log_compiles", True)
    pxla_logger = logging.getLogger("jax._src.interpreters.pxla")
    pxla_logger.setLevel(logging.DEBUG)
    pxla_logger.addHandler(handler)

    def run(n_frames):
        clip = (rng.rand(n_frames, 3, 64, 48) * 255).astype(np.uint8)
        out = pipe.forward(_upload(clip), **kwargs)
        np.asarray(out.depth_pred[0, 0, 0, 0])

    mode = "turbo" if turbo else "reference"
    handler.trace = "--trace" in args
    labels = [f"cold({frame_seq[0]})"] + [
        (f"same({n})" if n in frame_seq[:i + 1] else f"new({n})")
        for i, n in enumerate(frame_seq[1:])
    ]
    first_new = next((l for l in labels if l.startswith("new")), None)
    for label, n in zip(labels, frame_seq):
        handler.compiled.clear()
        handler.sites.clear()
        run(n)
        counts = collections.Counter(handler.compiled)
        print(f"[{mode} refine={refine}] {label}: {len(handler.compiled)} compiles")
        for name, c in counts.most_common():
            print(f"    {c:4d}  {name}")
        if handler.trace and label == first_new:
            print("  call sites:")
            for (name, site), c in collections.Counter(handler.sites).most_common():
                print(f"    {c:4d}  {name:30s} {site}")


if __name__ == "__main__":
    main()
