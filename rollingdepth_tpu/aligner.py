"""Snippet co-alignment solver (scale/shift per snippet).

Behavioral reference: /root/reference/rollingdepth/depth_aligner.py:29-262
(and its multi-channel variant my_aligner.py).  Per snippet window a scalar
scale s (init 1) and shift t (init 0) are optimized with Adam
(lr 1e-3, betas (0.5, 0.9), 2000 iterations) so that all windows covering a
frame agree, measured by L1 in depth and inverse-depth against the detached
per-frame mean, plus soft constraints lmda2*relu(1-s)^2 + lmda3*t^2
(depth_aligner.py:163-214).  The solver sees border-cropped (2px),
spatially ::factor-subsampled snippets (:82-92); the solved (s, t) are then
applied at full resolution and overlapping windows averaged per frame
(:231-262).

TPU-first redesign:
- the whole 2000-step Adam run is ONE ``lax.scan`` under jit (zero host
  round-trips), cached per shape bucket so repeat calls never recompile
- scatter/gather become one-hot matmuls (MXU streams instead of serialized
  VPU row scatters), including the full-resolution merge
- equal-window groups are stacked into single tensors (one op set serves
  all dilations)
- channels are native (C>=1), which subsumes the my_aligner.py variant used
  for per-RGB-channel alignment
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .pipelines.snippets import snippet_index_matrix


@dataclasses.dataclass(frozen=True)
class AlignerConfig:
    """Hyperparameters, defaults from depth_aligner.py:30-54."""

    factor: int = 10  # spatial subsample stride for the solve
    lmda: float = 1e-1  # unused by the reference objective; kept for API parity
    lmda2: float = 1e-1  # soft constraint weight on (1 - s)
    lmda3: float = 1e1  # soft constraint weight on t
    lr: float = 1e-3
    num_iterations: int = 2000
    border: int = 2
    depth_loss_weight: float = 1.0
    loss_scale: float = 1.0


# jit caches shared across aligner instances (keyed by shapes + config)
_SOLVE_CACHE: Dict[Any, Any] = {}
_MERGE_CACHE: Dict[Any, Any] = {}

# full-resolution merge streaming granularity (window rows per fori_loop
# trip): at the relight production size one 64-row fp32 chunk is ~350 MB vs
# ~2.8 GB for a full-group copy; must divide S_BUCKET so every padded group
# splits evenly
_MERGE_CHUNK = 64


# Shape buckets: solver inputs are padded (zero rows + zero one-hot rows +
# masks) so the jitted solve/merge programs are keyed by BUCKETS, not the
# exact clip length / window counts — a different-length clip reuses the
# compiled 2000-iteration solver (the per-length recompile cost minutes on a
# remote-compile backend).
S_BUCKET = 64  # snippet-window rows (S ~ N, so this tracks the frame bucket:
#                a 44f and a 60f clip must land in the SAME solve program)
T_BUCKET = 64  # frames


def _round_up(x: int, m: int) -> int:
    return m * (-(-x // m))


def _onehot_tables(index_mats, seq_len: int, s_pads, t_pad: int):
    """[S_pad*w, T_pad] assignment matrices (zero rows for padded windows)
    + per-frame coverage counts over [T_pad] (zero for padded frames)."""
    onehots = []
    counts = np.zeros((t_pad,), np.float32)
    for idx, s_pad in zip(index_mats, s_pads):
        idx_np = np.asarray(idx)
        s, w = idx_np.shape
        oh = np.zeros((s_pad * w, t_pad), np.float32)
        oh[np.arange(s * w), idx_np.reshape(-1)] = 1.0
        onehots.append(jnp.asarray(oh))
        counts[:seq_len] += np.bincount(idx_np.reshape(-1), minlength=seq_len)
    return onehots, jnp.asarray(counts)


class DepthAligner:
    def __init__(self, config: AlignerConfig = AlignerConfig(), verbose: bool = False):
        self.config = config
        self.verbose = verbose

    # ------------------------------------------------------------------
    def run(
        self,
        snippet_ls: Sequence[jnp.ndarray],  # per dilation: [S_g, w_g, C, H, W]
        dilations: Sequence[int],
        restore_shift: bool = False,
        channels_last: bool = False,
        return_st: bool = True,
        index_mats: Sequence[np.ndarray] = None,  # explicit [S_g, w_g] window
        # indices per group; default reconstructs the reference's stride-1
        # windows from (S, dilation) exactly like depth_aligner.py:57-66.
        # Non-stride-1 schedules (turbo partition windows) MUST pass their
        # true matrices along with seq_len.
        seq_len: int = None,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray], jnp.ndarray]:
        """Returns (merged [N, C, H, W], scales, translations, loss_history).

        ``return_st=False`` skips slicing the per-dilation (s, t) back to
        their true counts (2 eager slices per dilation = glue compiles per
        new clip length on remote transports) and returns empty lists —
        for callers that only consume ``merged``.

        ``loss_history`` is [iters, 3]: (loss, per-frame-mean min, max) per
        step, matching the tuples the reference records
        (depth_aligner.py:213).

        ``restore_shift=True`` adds the solver's internal global min-shift
        back onto the merged output, so it lives in the input's original
        value space instead of the shifted solver space.  Depth callers
        min-max-normalize afterwards and don't care; the latent-space merge
        (pipelines/rollingdepth.py turbo mode) needs real latents back.
        Aligned windows are ``s*(x - mn) + t``, so the per-frame average is
        the shifted-space merge plus ``mn`` exactly.

        ``channels_last=True`` takes groups as [S, w, H, W, C] and returns
        merged [N, H, W, C] — the pipelines' native latent layout, avoiding
        host-side transposes (dispatch latency on remote transports).

        All preprocessing (min-shift, border crop, subsample, bucket pad)
        runs inside ONE jitted program per shape bucket; solve and merge are
        one program each — 3-4 dispatches per call total."""
        cfg = self.config
        snippet_ls = [jnp.asarray(s) for s in snippet_ls]  # f32 cast in prep
        if index_mats is None:
            w0 = snippet_ls[0].shape[1]
            gap0 = dilations[0] - 1
            # N = S_0 + (w0-1)*gap0 + (w0-1)  (depth_aligner.py:72-76)
            seq_len = snippet_ls[0].shape[0] + (w0 - 1) * gap0 + (w0 - 1)
            index_mats = [
                snippet_index_matrix(seq_len, s.shape[1], d)
                for s, d in zip(snippet_ls, dilations)
            ]
        else:
            assert seq_len is not None, "explicit index_mats require seq_len"
            # groups may arrive born-padded to the S_BUCKET row bucket
            # (pipelines keep them padded so THIS aligner's prep/solve/merge
            # programs never key on a raw window count); the index matrix
            # carries the true count
            assert all(
                s.shape[0] in (m.shape[0], _round_up(m.shape[0], S_BUCKET))
                and m.shape[1] == s.shape[1]
                for m, s in zip(index_mats, snippet_ls)
            ), "index_mats must match snippet group shapes (raw or S_BUCKET-padded)"
        # bucket padding: zero window rows + zero one-hot rows + masks keep
        # the solve/merge programs length-independent
        s_true = [m.shape[0] for m in index_mats]
        s_pads = [_round_up(s, S_BUCKET) for s in s_true]
        t_pad = _round_up(seq_len, T_BUCKET)
        onehots, counts = _onehot_tables(index_mats, seq_len, s_pads, t_pad)
        masks = [
            jnp.asarray((np.arange(sp) < st).astype(np.float32))
            for sp, st in zip(s_pads, s_true)
        ]

        # ---- jitted prep: global min shift (:78-79), border crop +
        # spatial subsample (:82-92; b:-b:f == crop-then-stride), row pad.
        # HBM discipline (the 253-frame relight OOM, doc/ROADMAP.md): only
        # the ::factor-subsampled solver views are cast to fp32 and shifted;
        # the full-resolution groups are row-padded in their SOURCE dtype and
        # the min-shift is folded into the merge's per-window (s, t) instead
        # — at production sizes the old full-res fp32 shifted copy was
        # ~2x the input on top of the input itself.
        b, f = cfg.border, cfg.factor
        pkey = ("prep", tuple((s.shape, str(s.dtype)) for s in snippet_ls),
                tuple(s_pads), b, f, channels_last)
        if pkey not in _SOLVE_CACHE:
            pads = list(s_pads)

            @jax.jit
            def prep(groups, row_masks):
                # global min over TRUE rows only: born-padded groups carry
                # zero rows that must not clamp the shift (the raw path's
                # masks are all-ones, so this is the same min)
                mn = jnp.min(jnp.stack([
                    jnp.min(jnp.where(
                        m[: g.shape[0]].reshape(
                            (g.shape[0],) + (1,) * (g.ndim - 1)
                        ) > 0,
                        g.astype(jnp.float32), jnp.inf,
                    ))
                    for g, m in zip(groups, row_masks)
                ])).astype(jnp.float32)
                padded, views = [], []
                for g, sp in zip(groups, pads):
                    if channels_last:
                        v = g[:, :, b:-b:f, b:-b:f, :]
                    else:
                        v = g[:, :, :, b:-b:f, b:-b:f]
                    v = v.astype(jnp.float32) - mn
                    widths = [(0, sp - g.shape[0])] + [(0, 0)] * (g.ndim - 1)
                    padded.append(jnp.pad(g, widths))
                    views.append(
                        jnp.pad(v, widths).reshape(sp, g.shape[1], -1)
                    )
                return mn, tuple(padded), tuple(views)

            _SOLVE_CACHE[pkey] = prep
        mn, padded_full, solver_views = _SOLVE_CACHE[pkey](
            tuple(snippet_ls), tuple(masks)
        )

        scales, translations, history = self._optimize(
            solver_views, onehots, counts, masks, s_true, seq_len, t_pad
        )
        merged = self._merge(
            padded_full, index_mats, s_pads, scales, translations, seq_len,
            t_pad, mn, restore_shift, channels_last,
        )
        if not return_st:
            return merged, [], [], history
        scales = [s[:st] for s, st in zip(scales, s_true)]
        translations = [t[:st] for t, st in zip(translations, s_true)]
        return merged, scales, translations, history

    # ------------------------------------------------------------------
    def _optimize(self, views, onehots, counts, masks, s_true, seq_len: int, t_pad: int):
        cfg = self.config
        # flatten pixels: [S_pad, w, P] with P = C*H'*W'  (C-native
        # generalization of depth_aligner.py:140-143 / my_aligner.py:148-153)
        flat = [v.reshape(v.shape[0], v.shape[1], -1) for v in views]
        shapes = tuple(v.shape for v in flat)
        # keyed by PADDED bucket shapes: the true sizes travel as operands
        key = ("solve", shapes, t_pad, cfg)

        if key not in _SOLVE_CACHE:
            sizes = [v.shape[0] for v in flat]
            widths = [v.shape[1] for v in flat]
            p_dim = flat[0].shape[-1]
            # equal-window groups stack into single tensors
            stacked = len(set(widths)) == 1
            bounds = np.concatenate([[0], np.cumsum(sizes)])
            opt = optax.adam(cfg.lr, b1=0.5, b2=0.9, eps=1e-8)  # :159
            # the inverse-depth term is depth-semantic (clip(a, 1e-3)^-1
            # assumes positive depth); latent-space solves set its weight to
            # 0 and must not even compute it (negative latents would clip
            # to a flat 1e-3 wall)
            use_inv = cfg.depth_loss_weight != 0.0

            def loss_fn(params, flat_t, oh_t, counts, mask_t, strue_t, denom):
                # params are ONE (s, t) vector pair over all windows — like
                # the reference's single scales/translations tensors
                # (depth_aligner.py:155-157); groups view into it by bounds.
                # Padded windows have zero one-hot rows (no scatter), are
                # masked out of every loss term, and get no gradient.
                s_all, t_all = params
                s_list = [s_all[bounds[i] : bounds[i + 1]] for i in range(len(sizes))]
                t_list = [t_all[bounds[i] : bounds[i + 1]] for i in range(len(sizes))]
                cnt_safe = jnp.maximum(counts, 1.0)[:, None]
                if stacked:
                    flat_all = jnp.concatenate(flat_t, axis=0)
                    oh_all = jnp.concatenate(oh_t, axis=0)
                    mask_all = jnp.concatenate(mask_t, axis=0)
                    a = flat_all * s_all[:, None, None] + t_all[:, None, None]
                    a_inv = jnp.clip(a, 1e-3, None) ** -1 if use_inv else None
                    sum_m = oh_all.T @ a.reshape(-1, p_dim)
                    sum_inv = (
                        oh_all.T @ a_inv.reshape(-1, p_dim) if use_inv else None
                    )
                    groups = [(a, a_inv, oh_all, mask_all)]
                else:
                    sum_m = jnp.zeros((t_pad, p_dim), jnp.float32)
                    sum_inv = jnp.zeros((t_pad, p_dim), jnp.float32) if use_inv else None
                    groups = []
                    for v, oh, m, s, t in zip(flat_t, oh_t, mask_t, s_list, t_list):
                        a = v * s[:, None, None] + t[:, None, None]
                        a_inv = jnp.clip(a, 1e-3, None) ** -1 if use_inv else None
                        sum_m = sum_m + oh.T @ a.reshape(-1, p_dim)
                        if use_inv:
                            sum_inv = sum_inv + oh.T @ a_inv.reshape(-1, p_dim)
                        groups.append((a, a_inv, oh, m))

                target = jax.lax.stop_gradient(sum_m / cnt_safe)
                scale = jax.lax.stop_gradient(jnp.abs(target).mean(-1, keepdims=True))
                if use_inv:
                    target_inv = jax.lax.stop_gradient(sum_inv / cnt_safe)
                    scale_inv = jax.lax.stop_gradient(
                        jnp.abs(target_inv).mean(-1, keepdims=True)
                    )

                loss_m = 0.0
                loss_inv = 0.0
                for a, a_inv, oh, m in groups:
                    shape = a.shape
                    wmask = m[:, None, None]
                    tgt = (oh @ target).reshape(shape)  # gather via matmul
                    sc = jnp.maximum((oh @ scale).reshape(shape[:2] + (1,)), 1e-12)
                    loss_m += (wmask * jnp.abs((a - tgt) / sc)).sum()
                    if use_inv:
                        tgt_inv = (oh @ target_inv).reshape(shape)
                        sc_inv = jnp.maximum(
                            (oh @ scale_inv).reshape(shape[:2] + (1,)), 1e-12
                        )
                        loss_inv += (wmask * jnp.abs((a_inv - tgt_inv) / sc_inv)).sum()
                loss = loss_m / denom + cfg.depth_loss_weight * (loss_inv / denom)

                # soft constraints are PER dilation group, then summed — the
                # reference keeps per-group scale/translation tensors and
                # sums per-tensor means (depth_aligner.py:150-155, 205-208);
                # masked sums / true counts reproduce the unpadded means
                soft = 0.0
                for s, t, m, st in zip(s_list, t_list, mask_t, strue_t):
                    soft += cfg.lmda2 * (m * jnp.maximum(0.0, 1.0 - s) ** 2).sum() / st
                    soft += cfg.lmda3 * (m * t**2).sum() / st
                total = cfg.loss_scale * loss + soft
                covered = counts > 0
                aux = (
                    jnp.where(covered[:, None], target, jnp.inf).min(),
                    jnp.where(covered[:, None], target, -jnp.inf).max(),
                )
                return total, aux

            n_all = sum(sizes)

            @jax.jit
            def solve(flat_t, oh_t, counts, mask_t, strue_t, denom):
                params = (
                    jnp.ones((n_all,), jnp.float32),
                    jnp.zeros((n_all,), jnp.float32),
                )
                state = opt.init(params)

                def step(carry, _):
                    params, state = carry
                    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                        params, flat_t, oh_t, counts, mask_t, strue_t, denom
                    )
                    updates, state = opt.update(grads, state)
                    params = optax.apply_updates(params, updates)
                    return (params, state), jnp.stack([loss, aux[0], aux[1]])

                (params, _), history = jax.lax.scan(
                    step, (params, state), None, length=cfg.num_iterations, unroll=4
                )
                return params, history

            _SOLVE_CACHE[key] = solve

        p_dim = flat[0].shape[-1]
        denom = float(sum(v.shape[1] for v in flat) * seq_len * p_dim)
        (s_all, t_all), history = _SOLVE_CACHE[key](
            tuple(flat), tuple(onehots), counts, tuple(masks),
            tuple(jnp.float32(s) for s in s_true), jnp.float32(denom),
        )
        bounds = np.concatenate([[0], np.cumsum([v.shape[0] for v in flat])])
        s_list = [s_all[bounds[i] : bounds[i + 1]] for i in range(len(flat))]
        t_list = [t_all[bounds[i] : bounds[i + 1]] for i in range(len(flat))]
        return s_list, t_list, history

    # ------------------------------------------------------------------
    def _merge(self, snippet_ls, index_mats, s_pads, scales, translations,
               seq_len: int, t_pad: int, mn, restore_shift: bool,
               channels_last: bool = False) -> jnp.ndarray:
        """Apply (s, t) at full res; average covering windows per frame
        (depth_aligner.py:231-262) — as a one-hot matmul (MXU stream).

        Inputs are bucket-padded ([S_pad] rows, [t_pad] frames): padded
        windows have zero one-hot columns, padded frames zero counts
        (clamped); the caller slices the [t_pad] output to seq_len.

        The groups arrive UNSHIFTED in their source dtype (prep); the
        solver's (s, t) live in min-shifted space, so the merge applies
        ``s*(x - mn) + t == s*x + (t - s*mn)`` by folding ``mn`` into the
        per-window shift.  ``restore_shift`` adds ``mn`` back onto the
        averaged output.

        HBM discipline: windows stream through a ``fori_loop`` in
        ``_MERGE_CHUNK``-row chunks — each trip casts ONE chunk to fp32,
        applies (s, t) and accumulates via its one-hot column block, so the
        transient is one chunk + the [t_pad, chw] accumulator instead of a
        second full-resolution fp32 copy of every group (the 253-frame
        relight coalign OOM, doc/ROADMAP.md)."""
        frame_shape = snippet_ls[0].shape[-3:]  # (C,H,W) or (H,W,C)
        chw = int(np.prod(frame_shape))
        onehots = []
        counts = np.zeros((t_pad,), np.float32)
        for idx, s_pad in zip(index_mats, s_pads):
            idx_np = np.asarray(idx)
            s_g, w_g = idx_np.shape
            oh = np.zeros((t_pad, s_pad * w_g), np.float32)
            oh[idx_np.reshape(-1), np.arange(s_g * w_g)] = 1.0
            onehots.append(jnp.asarray(oh))
            counts[:seq_len] += np.bincount(idx_np.reshape(-1), minlength=seq_len)
        counts_j = jnp.asarray(counts)

        key = ("merge", tuple((s.shape, str(s.dtype)) for s in snippet_ls),
               t_pad, restore_shift)
        if key not in _MERGE_CACHE:

            @jax.jit
            def merge(snippets, oh_t, counts, s_list, t_list, mn):
                acc = jnp.zeros((t_pad, chw), jnp.float32)
                for v, oh, s, t in zip(snippets, oh_t, s_list, t_list):
                    sp, w = v.shape[0], v.shape[1]
                    vflat = v.reshape(sp, w * chw)
                    t_eff = t - mn * s  # fold the prep min-shift into t
                    chunk = min(_MERGE_CHUNK, sp)
                    n_chunks = sp // chunk  # sp is a multiple of S_BUCKET

                    def body(i, acc, vflat=vflat, oh=oh, s=s, t_eff=t_eff,
                             w=w, chunk=chunk):
                        r0 = i * chunk
                        vc = jax.lax.dynamic_slice_in_dim(
                            vflat, r0, chunk, 0
                        ).astype(jnp.float32)
                        sc = jax.lax.dynamic_slice_in_dim(s, r0, chunk, 0)
                        tc = jax.lax.dynamic_slice_in_dim(t_eff, r0, chunk, 0)
                        ohc = jax.lax.dynamic_slice_in_dim(
                            oh, r0 * w, chunk * w, 1
                        )
                        a = (vc * sc[:, None] + tc[:, None]).reshape(
                            chunk * w, chw
                        )
                        return acc + ohc @ a

                    acc = jax.lax.fori_loop(0, n_chunks, body, acc)
                out = acc / jnp.maximum(counts, 1.0)[:, None]
                if restore_shift:
                    out = out + mn
                return out.reshape((t_pad,) + frame_shape)

            _MERGE_CACHE[key] = merge

        return _MERGE_CACHE[key](
            tuple(snippet_ls), tuple(onehots), counts_j, tuple(scales),
            tuple(translations), mn,
        )[:seq_len]
