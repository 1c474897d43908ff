"""Training data pipeline: video clips -> snippet latent pair batches.

The reference performs no training (SURVEY.md §5), but the upstream model is
a fine-tuned SD2 trained Marigold-style on (rgb, depth) pairs with
cross-frame snippet attention.  This module provides the TPU-native input
pipeline for that recipe:

- clips are VAE-encoded ONCE (rgb frames and 3-channel-replicated depth
  maps through the same encoder, exactly how inference encodes depth for
  refinement — pipelines/rollingdepth.py), latents kept host-side
- training examples are dilated snippet windows over those latents, built
  with the same ``snippet_index_matrix`` machinery the inference pipelines
  use (pipelines/snippets.py), pooled across clips and dilations
- batches ``{"rgb_latent": [B, n, h, w, 4], "depth_latent": ..}`` are
  gathered on the host and uploaded while the previous step computes
  (double-buffered iterator)

Shuffling is a pure function of the epoch seed, so a run is reproducible
and resumable from (seed, step) alone — matching the checkpoint/resume
story in training.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pipelines.snippets import cap_max_dilation, snippet_index_matrix

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SnippetDataConfig:
    snippet_len: int = 3
    dilations: Tuple[int, ...] = (1, 10, 25)
    cap_dilation: bool = True
    batch_size: int = 8
    seed: int = 0


class SnippetLatentDataset:
    """Encodes clips once, then serves shuffled snippet-latent batches.

    ``encode_fn(frames_nhwc) -> latents [N, h, w, 4]`` is typically a
    pipeline's ``_encode_frames`` closure so the dataset reuses the same
    compiled chunk programs as inference.
    """

    def __init__(
        self,
        encode_fn: Callable[[np.ndarray], jnp.ndarray],
        rgb_clips: Sequence[np.ndarray],  # each [N, 3, H, W] in [-1, 1]
        depth_clips: Sequence[np.ndarray],  # each [N, 1, H, W] in [-1, 1]
        config: SnippetDataConfig = SnippetDataConfig(),
    ):
        assert len(rgb_clips) == len(depth_clips)
        self.config = config
        self.rgb_latents: List[np.ndarray] = []
        self.depth_latents: List[np.ndarray] = []
        self.windows: List[Tuple[int, np.ndarray]] = []  # (clip_id, [n] frame idx)

        for clip_id, (rgb, depth) in enumerate(zip(rgb_clips, depth_clips)):
            assert rgb.shape[0] == depth.shape[0]
            rgb_nhwc = np.transpose(np.asarray(rgb, np.float32), (0, 2, 3, 1))
            # depth replicated to 3 channels through the SAME encoder, like
            # the inference refinement path (reference encodes depth via
            # einops.repeat "N 1 H W -> N 3 H W", rollingdepth_pipeline.py)
            dep3 = np.repeat(np.asarray(depth, np.float32), 3, axis=1)
            dep_nhwc = np.transpose(dep3, (0, 2, 3, 1))
            self.rgb_latents.append(np.asarray(encode_fn(rgb_nhwc), np.float32))
            self.depth_latents.append(np.asarray(encode_fn(dep_nhwc), np.float32))

            n_frames = rgb.shape[0]
            seen_dilations = set()  # dilations capping to the same effective
            # value would duplicate every window, silently over-sampling
            for dilation in config.dilations:
                d = (
                    cap_max_dilation(n_frames, config.snippet_len, dilation, False)
                    if config.cap_dilation
                    else dilation
                )
                # short clips can cap d to 0/negative (the span guard below
                # would not catch d=0, and snippet_index_matrix needs d >= 1)
                if d < 1 or d in seen_dilations:
                    continue
                if n_frames < (config.snippet_len - 1) * d + 1:
                    continue
                seen_dilations.add(d)
                idx = snippet_index_matrix(n_frames, config.snippet_len, d)
                for row in idx:
                    self.windows.append((clip_id, row))
        if not self.windows:
            raise ValueError("no snippet windows — clips too short for config")

    def __len__(self) -> int:
        return len(self.windows)

    def steps_per_epoch(self) -> int:
        return len(self.windows) // self.config.batch_size

    def _gather(self, order: np.ndarray, step: int) -> Dict[str, np.ndarray]:
        bs = self.config.batch_size
        rows = order[step * bs : (step + 1) * bs]
        rgb = np.stack([self.rgb_latents[c][i] for c, i in (self.windows[r] for r in rows)])
        dep = np.stack([self.depth_latents[c][i] for c, i in (self.windows[r] for r in rows)])
        return {"rgb_latent": rgb, "depth_latent": dep}

    def epoch(self, epoch_idx: int, upload: bool = True) -> Iterator[Dict[str, Any]]:
        """One shuffled epoch of batches; the NEXT batch uploads while the
        caller's current step computes (double buffering)."""
        rng = np.random.RandomState(self.config.seed + epoch_idx)
        order = rng.permutation(len(self.windows))
        n_steps = self.steps_per_epoch()
        if n_steps == 0:
            return
        put = (lambda b: {k: jnp.asarray(v) for k, v in b.items()}) if upload else (lambda b: b)
        pending = put(self._gather(order, 0))
        for step in range(n_steps):
            nxt = put(self._gather(order, step + 1)) if step + 1 < n_steps else None
            yield pending
            pending = nxt
