"""Dilated rolling-window snippet scheduling.

The reference covers a video with stride-1 sliding windows of ``snippet_len``
frames spaced ``dilation`` apart, per dilation in e.g. [1, 10, 25]
(/root/reference/rollingdepth/rollingdepth_pipeline.py:465-515).  During
refinement the gap anneals linearly from ``dilation_start-1`` to
``dilation_end-1`` with the step index (same file :482-483).

TPU-first design: instead of a Python list of per-snippet index lists driving
a Python loop of model calls, we emit a static ``[S, n]`` integer matrix once
per (seq_len, snippet_len, dilation) bucket.  The whole snippet batch is then
gathered with one ``jnp.take`` and denoised as a single (sharded) batch.
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np

logger = logging.getLogger(__name__)


def cap_max_dilation(seq_len: int, snippet_len: int, dilation: int, verbose: bool = False) -> int:
    """Cap dilation so a full window fits the clip.

    Mirrors /root/reference/rollingdepth/rollingdepth_pipeline.py:504-515:
    ``max_allowed_gap = floor(seq_len / snippet_len) - 1``.
    """
    max_allowed_gap = int(seq_len / snippet_len) - 1
    if max_allowed_gap < dilation:
        msg = f"dilation = {dilation} is too big for {seq_len} frames. Reduced to {max_allowed_gap}"
        (logger.info if verbose else logger.debug)(msg)
        dilation = min(max_allowed_gap, dilation)
    # divergence from the reference: its formula returns 0 for
    # snippet_len <= seq_len < 2*snippet_len (e.g. 5 frames, snippet 3) and
    # then crashes building range() with step 0, even though dilation=1
    # always fits such clips; clamp to the smallest valid dilation instead
    return max(1, dilation)


def current_gap(i_step: int, total_step: int, dilation_start: int, dilation_end: int) -> int:
    """Annealed inter-frame gap at refinement step ``i_step``.

    ``gap = int((1 - i_step/total_step) * (gap_start - gap_end) + gap_end)``
    (/root/reference/rollingdepth/rollingdepth_pipeline.py:475-483).
    """
    gap_start = dilation_start - 1
    gap_end = dilation_end - 1
    if gap_start < gap_end:
        raise ValueError(f"expect gap_start >= gap_end, got {gap_start} and {gap_end}")
    if gap_start < 0 or gap_end < 0:
        raise ValueError("gaps must be non-negative")
    return int((1 - i_step / total_step) * (gap_start - gap_end) + gap_end)


def snippet_indices(
    seq_len: int,
    snippet_len: int,
    dilation: int,
    stride: int = 1,
) -> List[List[int]]:
    """All window start indices for one dilation, as lists (reference-shaped).

    Equivalent to the loop at
    /root/reference/rollingdepth/rollingdepth_pipeline.py:486-502 with
    ``gap_cur = dilation - 1``: windows ``[i, i+d, ..., i+(n-1)d]`` for
    ``i in range(0, seq_len - (n-1)d, stride)`` plus a final window for
    stride > 1 so the tail is covered.
    """
    gap = dilation - 1
    total_window_size = (snippet_len - 1) * (gap + 1) + 1
    if total_window_size > seq_len:
        raise ValueError(
            f"window of len {snippet_len} with dilation {dilation} does not fit {seq_len} frames"
        )
    i_start_ls = list(range(0, seq_len - total_window_size + 1, stride))
    if i_start_ls[-1] < seq_len - total_window_size:
        i_start_ls.append(seq_len - total_window_size)
    out = [list(range(i, i + total_window_size, gap + 1)) for i in i_start_ls]

    covered = {x for window in out for x in window}
    if covered != set(range(seq_len)):
        logger.warning(
            "Not every frame is covered. Consider reducing dilation for short videos"
        )
    return out


def snippet_index_matrix(
    seq_len: int,
    snippet_len: int,
    dilation: int,
    stride: int = 1,
    pad_to: int = 0,
) -> np.ndarray:
    """Static ``[S, n]`` int32 index matrix for one dilation.

    ``pad_to`` optionally pads S up to a bucket size by repeating the last
    window, letting one jit compile serve many clip lengths.  Consumers that
    accumulate over windows must mask out rows >= the true S (see
    ``valid_window_mask``) so duplicates do not skew overlap averages.
    """
    idx = np.asarray(snippet_indices(seq_len, snippet_len, dilation, stride), dtype=np.int32)
    if pad_to and idx.shape[0] < pad_to:
        pad = np.repeat(idx[-1:], pad_to - idx.shape[0], axis=0)
        idx = np.concatenate([idx, pad], axis=0)
    return idx


def chain_stride_index_matrix(
    seq_len: int,
    snippet_len: int,
    dilation: int,
    stride: int,
    phase: int = 0,
) -> np.ndarray:
    """``[S, n]`` windows: each dilation chain tiled at chain-hop ``stride``.

    The quality/throughput dial the reference's CLI promises but never
    implements (``--strides`` raises NotImplementedError at
    /root/reference/rollingdepth/rollingimg_pipeline.py:686-687 and
    rollingdepth_pipeline.py:240-241).  A dilation chain is one residue
    class mod ``dilation``; windows cover ``n`` consecutive chain positions
    and successive windows start ``stride`` positions apart, so every frame
    is covered by ``~n/stride`` windows:

    - ``stride=1``  — the reference's stride-1 sliding-window set (same
      windows, rows grouped by chain instead of by start frame),
    - ``stride=n``  — the TURBO partition (~1 covering window per frame),
    - in between    — proportionally fewer UNet evals with proportionally
      more overlap smoothing retained.

    ``stride`` must lie in ``[1, snippet_len]`` — a larger hop would leave
    frames uncovered.  Head/tail windows clamp within their chain and may
    overlap; consumers average overlaps exactly as for stride-1.
    """
    n, d, s = snippet_len, dilation, stride
    if not 1 <= s <= n:
        raise ValueError(
            f"stride must be in [1, snippet_len={n}] for full coverage, got {s}"
        )
    wins = []
    for r in range(d):
        chain = np.arange(r, seq_len, d)
        length = len(chain)
        if length == 0:
            continue
        if length < n:
            # degenerate chain (only reachable with cap_dilation off on
            # short clips): one clamped window, duplicate indices allowed —
            # the mask-weighted scatter averages duplicates harmlessly
            wins.append(chain[np.clip(np.arange(length - n, length), 0, length - 1)])
            continue
        p0 = phase % n
        starts = list(range(p0, length - n + 1, s))
        if p0 > 0:
            starts.insert(0, 0)  # head: cover chain positions [0, p0)
        if not starts or starts[-1] + n < length:
            starts.append(length - n)  # tail: cover the last positions
        for s0 in starts:
            wins.append(chain[s0 : s0 + n])
    return np.stack(wins).astype(np.int32)


def partition_index_matrix(
    seq_len: int,
    snippet_len: int,
    dilation: int,
    phase: int = 0,
) -> np.ndarray:
    """``[S, n]`` windows covering every frame with ~1x (not ~n x) overlap.

    TURBO-refine scheduling: the reference's refinement emits stride-1
    windows (every frame starts one —
    /root/reference/rollingdepth/rollingdepth_pipeline.py:572-580), so each
    frame is denoised by ~``snippet_len`` overlapping windows per step and
    the overlaps are averaged (:586-629).  That costs ~n x the minimum UNet
    work per step.  This builder instead TILES each dilation chain (the
    frames of one residue class mod ``dilation``) with consecutive length-n
    windows, giving ~seq_len/n windows per step — every frame still covered
    every step (the noise schedule stays uniform), cross-window coupling
    restored by rotating ``phase`` across steps so window boundaries never
    pin to the same frames.  Head/tail windows clamp within their chain and
    may overlap; consumers average overlaps exactly as for stride-1.
    """
    return chain_stride_index_matrix(
        seq_len, snippet_len, dilation, stride=snippet_len, phase=phase
    )


def coverage_count(index_matrix: np.ndarray, seq_len: int) -> np.ndarray:
    """Per-frame count of covering windows, ``[seq_len]`` int32."""
    return np.bincount(index_matrix.reshape(-1), minlength=seq_len).astype(np.int32)


def valid_window_mask(num_valid: int, padded: int) -> np.ndarray:
    """``[padded]`` float32 mask: 1 for true windows, 0 for bucket padding."""
    return (np.arange(padded) < num_valid).astype(np.float32)
