"""New-clip-length compile stability (VERDICT r2 missing #3).

The reference serves ANY clip length with zero recompilation
(/root/reference/run_video.py:550-585 loops arbitrary inputs through one
torch pipeline).  Our XLA equivalent keys every compute-heavy program by
chunk/bucket shapes only (pipelines/chunking.py), so a clip of a NEW length
must (a) recompile nothing at all when re-run at a seen length and (b) pay
only trivial glue compiles (eager pad/slice/reshape dispatches) — never a
UNet / VAE / aligner-solve / merge / refine recompile — at an unseen one.

Measured composition on the tunnel (doc/ROADMAP.md): the glue is ~120
sub-0.3s programs; the heavy programs are minutes each, so one regression
here costs two orders of magnitude more than all glue combined.
"""

import logging

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

# jitted program names of the compute-heavy pipeline/aligner/chunking
# programs (pipelines/rollingdepth.py, pipelines/chunking.py, aligner.py);
# 'prep' (aligner pre-shift, raw-shape-keyed data movement) is documented
# glue — see doc/ROADMAP.md "New-length compile cost"
HEAVY = ("jit(fn)", "jit(step_fn)", "jit(solve)", "jit(merge)")


class _CompileLog(logging.Handler):
    def __init__(self):
        super().__init__()
        self.compiled = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling "):
            self.compiled.append(msg.split(" with ")[0].removeprefix("Compiling "))


@pytest.fixture()
def compile_log():
    handler = _CompileLog()
    jax.config.update("jax_log_compiles", True)
    pxla_logger = logging.getLogger("jax._src.interpreters.pxla")
    old_level = pxla_logger.level
    pxla_logger.setLevel(logging.DEBUG)
    pxla_logger.addHandler(handler)
    try:
        yield handler
    finally:
        pxla_logger.removeHandler(handler)
        pxla_logger.setLevel(old_level)
        jax.config.update("jax_log_compiles", False)


def test_new_length_compiles_no_heavy_program(compile_log):
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
    # the paper-preset shape of the problem: multi-dilation, reference
    # (decode-all) merge path, refinement on — exercises every program
    # family; tiny solver iteration count keeps the solve compile fast
    # (iteration count changes trip counts, not cache keys)
    kwargs = dict(
        dilations=[1, 2, 3], cap_dilation=False, refine_step=2, seed=0,
        max_vae_bs=4, fetch_output=False, merge_in_latent=False,
        coalign_kwargs={"num_iterations": 8},
    )
    rng = np.random.RandomState(0)

    def run(n_frames):
        clip = (rng.rand(n_frames, 3, 64, 48) * 255).astype(np.uint8)
        out = pipe.forward(_upload(clip), **kwargs)
        np.asarray(out.depth_pred[0, 0, 0, 0])  # sync

    run(20)  # cold: compiles everything

    # guard the guard: HEAVY is a list of inner jit names — if one of those
    # functions gets renamed, the new-length assertion below would go
    # vacuously green.  The cold run must have compiled every HEAVY name.
    missing = [h for h in HEAVY if h not in compile_log.compiled]
    assert missing == [], (
        f"cold run never compiled {missing} — HEAVY names are stale "
        f"(observed: {sorted(set(compile_log.compiled))})"
    )

    compile_log.compiled.clear()
    run(20)  # same length again: NOTHING may compile
    assert compile_log.compiled == [], (
        f"re-running a seen clip length recompiled {compile_log.compiled}"
    )

    compile_log.compiled.clear()
    run(26)  # new length, same buckets: glue only
    heavy = [c for c in compile_log.compiled if c in HEAVY]
    assert heavy == [], (
        f"new clip length recompiled heavy programs {heavy} "
        f"(all compiles: {len(compile_log.compiled)})"
    )
