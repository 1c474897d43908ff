"""Generation-2 IC-Light RGB passthrough pipeline.

Behavioral reference: /root/reference/rollingdepth/iclight_pipeline.py —
the fork's first relighting experiment: the 8-ch depth UNet runs the full
snippet denoise with its input formed as ``[rgb_latent, rgb_latent]``
(:738), but the decoded output is the *rgb conditioning latents* rather than
the denoised latents (:528-541), i.e. the pipeline reconstructs the input
video through the VAE while exercising the whole snippet/denoise machinery.
Per-RGB-channel co-alignment follows (:316-369).  It is a sanity-check stage
of the relighting work, superseded by rollingimg_pipeline.py (generation 4),
and kept here for inventory completeness.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..aligner import AlignerConfig, DepthAligner
from .rollingdepth import RollingDepthPipeline
from .snippets import cap_max_dilation, snippet_index_matrix


class ICLightPassthroughPipeline:
    """Wraps a RollingDepthPipeline (8-ch UNet) with gen-2 semantics."""

    def __init__(self, depth_pipeline: RollingDepthPipeline):
        self.pipe = depth_pipeline

    def forward(
        self,
        input_frames: np.ndarray,  # [N, 3, H, W] in [-1, 1] or uint8
        dilations: List[int],
        cap_dilation: bool = True,
        snippet_length: int = 3,
        init_infer_steps: int = 1,
        coalign_kwargs: Optional[Dict] = None,
        seed: int = 0,
        max_vae_bs: int = 4,
    ):
        pipe = self.pipe
        seq_len = input_frames.shape[0]
        if cap_dilation:
            dilations = [cap_max_dilation(seq_len, snippet_length, d) for d in dilations]

        if input_frames.dtype == np.uint8:
            frames_nhwc = (
                jnp.asarray(input_frames).transpose(0, 2, 3, 1).astype(pipe.dtype) / 127.5 - 1.0
            )
        else:
            frames_nhwc = jnp.asarray(
                input_frames.transpose(0, 2, 3, 1), dtype=pipe.dtype
            )
        rgb_latent = pipe._encode_frames(frames_nhwc, max_vae_bs)

        # exercise the full snippet denoise machinery with [rgb, rgb] input
        # (iclight_pipeline.py:738) — outputs intentionally discarded
        import jax

        key = jax.random.PRNGKey(seed)
        h, w = rgb_latent.shape[1:3]
        noise = jax.random.normal(key, (h, w, 4), jnp.float32).astype(pipe.dtype)
        snippet_rgb_ls = []
        for d in dilations:
            idx = snippet_index_matrix(seq_len, snippet_length, d)
            _ = pipe._infer_snippets(rgb_latent, noise, idx, init_infer_steps)
            # gen-2 decodes the rgb snippet latents (:528-541)
            snippets = jnp.take(rgb_latent, jnp.asarray(idx), axis=0)  # [S, n, h, w, 4]
            flat = snippets.reshape((-1,) + snippets.shape[2:])
            img = pipe._decode_rgb(flat, max_vae_bs)  # [S*n, H, W, 3]
            img = img.reshape(snippets.shape[:2] + img.shape[1:])  # [S, n, H, W, 3]
            snippet_rgb_ls.append(img.transpose(0, 1, 4, 2, 3).astype(jnp.float32))

        # per-channel co-alignment (iclight_pipeline.py:316-369)
        aligner = DepthAligner(AlignerConfig(**(coalign_kwargs or {})))
        channels = []
        for ch in range(3):
            ch_snips = [s[:, :, ch : ch + 1] for s in snippet_rgb_ls]
            merged, _s, _t, _h = aligner.run(ch_snips, dilations)
            merged = merged - merged.min()
            # constant channel (e.g. pure black): 0/0 would NaN the output
            merged = merged / np.maximum(merged.max(), 1e-8)
            channels.append(np.asarray(merged * 2.0 - 1.0, dtype=np.float32))
        return np.concatenate(channels, axis=1)  # [N, 3, H, W] in [-1, 1]
