"""Generation-3 relighting pipeline (my_rollingdepth_pipeline).

Behavioral reference: /root/reference/rollingdepth/my_rollingdepth_pipeline.py
— the fork's third iteration, superseded by rollingimg_pipeline but part of
the public pipeline zoo.  It shares gen-4's skeleton (module-level
RealisticVision SD1.5 + RMBG load :70-120, IC-Light fbc offset merge +
conv_in 4->12ch surgery :832-848, fg/bg 8-ch conditioning, per-RGB-channel
co-alignment) and differs in exactly four behaviors, each mapped to a
``RollingImgPipeline`` parameter here:

| gen-3 behavior (file:line)                            | parameter           |
|-------------------------------------------------------|---------------------|
| shared Gaussian init noise repeated over frames       | init_mode=          |
| (:648-654, the canonical depth-pipeline init)         |   "shared_noise"    |
| empty-prompt conditioning (batch_empty_text_embed,    | empty_text=True     |
| :942)                                                 |                     |
| full short schedule: set_timesteps(init_infer_step),  | num_inference_steps |
| no strength skip (:873, :923)                         |   + strength=1.0    |
| UNet input cat([rgb_cond, depth_latent]) — cond FIRST | cond_first=True     |
| (:1166-1173; gen-4 puts the latent first, :1430-1437) |                     |

The class below binds those defaults so gen-3 runs verbatim through the same
TPU-native machinery (snippet-batched lax.scan denoise, per-channel aligner).
"""

from __future__ import annotations

from .rollingimg import RollingImgOutput, RollingImgPipeline

__all__ = ["MyRollingDepthPipeline", "RollingImgOutput"]


class MyRollingDepthPipeline(RollingImgPipeline):
    """RollingImgPipeline configured to generation-3 semantics."""

    GEN3_DEFAULTS = dict(
        init_mode="shared_noise",
        empty_text=True,
        cond_first=True,
        strength=1.0,
    )

    def __call__(self, *args, **kwargs) -> RollingImgOutput:
        merged = {**self.GEN3_DEFAULTS, **kwargs}
        merged.setdefault("num_inference_steps", 1)  # init_infer_steps=[1]
        return super().__call__(*args, **merged)

    def forward(self, *args, **kwargs) -> RollingImgOutput:
        merged = {**self.GEN3_DEFAULTS, **kwargs}
        merged.setdefault("num_inference_steps", 1)
        return super().forward(*args, **merged)
