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


def _onehot_tables(index_mats, seq_len: int):
    """[rows, T] assignment matrices + per-frame coverage counts."""
    onehots = []
    counts = np.zeros((seq_len,), np.float32)
    for idx in index_mats:
        idx_np = np.asarray(idx)
        oh = np.zeros((idx_np.size, seq_len), np.float32)
        oh[np.arange(idx_np.size), idx_np.reshape(-1)] = 1.0
        onehots.append(jnp.asarray(oh))
        counts += np.bincount(idx_np.reshape(-1), minlength=seq_len)
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
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray], jnp.ndarray]:
        """Returns (merged [N, C, H, W], scales, translations, loss_history).

        ``loss_history`` is [iters, 3]: (loss, per-frame-mean min, max) per
        step, matching the tuples the reference records
        (depth_aligner.py:213).

        ``restore_shift=True`` adds the solver's internal global min-shift
        back onto the merged output, so it lives in the input's original
        value space instead of the shifted solver space.  Depth callers
        min-max-normalize afterwards and don't care; the latent-space merge
        (pipelines/rollingdepth.py turbo mode) needs real latents back.
        Aligned windows are ``s*(x - mn) + t``, so the per-frame average is
        the shifted-space merge plus ``mn`` exactly."""
        cfg = self.config
        snippet_ls = [jnp.asarray(s, dtype=jnp.float32) for s in snippet_ls]
        w0 = snippet_ls[0].shape[1]
        gap0 = dilations[0] - 1
        # N = S_0 + (w0-1)*gap0 + (w0-1)  (depth_aligner.py:72-76)
        seq_len = snippet_ls[0].shape[0] + (w0 - 1) * gap0 + (w0 - 1)

        # global min shift (:78-79)
        mn = jnp.min(jnp.stack([s.min() for s in snippet_ls]))
        snippet_ls = [s - mn for s in snippet_ls]

        # border crop + spatial subsample (:82-92); b:-b:f == crop-then-stride
        b, f = cfg.border, cfg.factor
        solver_views = [s[:, :, :, b:-b:f, b:-b:f] for s in snippet_ls]

        index_mats = [
            snippet_index_matrix(seq_len, s.shape[1], d)
            for s, d in zip(snippet_ls, dilations)
        ]
        onehots, counts = _onehot_tables(index_mats, seq_len)

        scales, translations, history = self._optimize(
            solver_views, onehots, counts, seq_len
        )
        merged = self._merge(snippet_ls, index_mats, scales, translations, seq_len)
        if restore_shift:
            merged = merged + mn
        return merged, scales, translations, history

    # ------------------------------------------------------------------
    def _optimize(self, views, onehots, counts, seq_len: int):
        cfg = self.config
        # flatten pixels: [S, w, P] with P = C*H'*W'  (C-native generalization
        # of depth_aligner.py:140-143 / my_aligner.py:148-153)
        flat = [v.reshape(v.shape[0], v.shape[1], -1) for v in views]
        shapes = tuple(v.shape for v in flat)
        key = ("solve", shapes, seq_len, cfg)

        if key not in _SOLVE_CACHE:
            sizes = [v.shape[0] for v in flat]
            widths = [v.shape[1] for v in flat]
            p_dim = flat[0].shape[-1]
            rows_total = sum(widths)
            denom = rows_total * seq_len * p_dim  # numel of the reference's M
            # equal-window groups stack into single tensors
            stacked = len(set(widths)) == 1
            bounds = np.concatenate([[0], np.cumsum(sizes)])
            opt = optax.adam(cfg.lr, b1=0.5, b2=0.9, eps=1e-8)  # :159
            # the inverse-depth term is depth-semantic (clip(a, 1e-3)^-1
            # assumes positive depth); latent-space solves set its weight to
            # 0 and must not even compute it (negative latents would clip
            # to a flat 1e-3 wall)
            use_inv = cfg.depth_loss_weight != 0.0

            def loss_fn(params, flat_t, oh_t, counts):
                # params are ONE (s, t) vector pair over all windows — like
                # the reference's single scales/translations tensors
                # (depth_aligner.py:155-157); groups view into it by bounds
                s_all, t_all = params
                s_list = [s_all[bounds[i] : bounds[i + 1]] for i in range(len(sizes))]
                t_list = [t_all[bounds[i] : bounds[i + 1]] for i in range(len(sizes))]
                if stacked:
                    flat_all = jnp.concatenate(flat_t, axis=0)
                    oh_all = jnp.concatenate(oh_t, axis=0)
                    a = flat_all * s_all[:, None, None] + t_all[:, None, None]
                    a_inv = jnp.clip(a, 1e-3, None) ** -1 if use_inv else None
                    sum_m = oh_all.T @ a.reshape(-1, p_dim)
                    sum_inv = (
                        oh_all.T @ a_inv.reshape(-1, p_dim) if use_inv else None
                    )
                    groups = [(a, a_inv, oh_all)]
                else:
                    sum_m = jnp.zeros((seq_len, p_dim), jnp.float32)
                    sum_inv = jnp.zeros((seq_len, p_dim), jnp.float32) if use_inv else None
                    groups = []
                    for v, oh, s, t in zip(flat_t, oh_t, s_list, t_list):
                        a = v * s[:, None, None] + t[:, None, None]
                        a_inv = jnp.clip(a, 1e-3, None) ** -1 if use_inv else None
                        sum_m = sum_m + oh.T @ a.reshape(-1, p_dim)
                        if use_inv:
                            sum_inv = sum_inv + oh.T @ a_inv.reshape(-1, p_dim)
                        groups.append((a, a_inv, oh))

                target = jax.lax.stop_gradient(sum_m / counts[:, None])
                scale = jax.lax.stop_gradient(jnp.abs(target).mean(-1, keepdims=True))
                if use_inv:
                    target_inv = jax.lax.stop_gradient(sum_inv / counts[:, None])
                    scale_inv = jax.lax.stop_gradient(
                        jnp.abs(target_inv).mean(-1, keepdims=True)
                    )

                loss_m = 0.0
                loss_inv = 0.0
                for a, a_inv, oh in groups:
                    shape = a.shape
                    tgt = (oh @ target).reshape(shape)  # gather via matmul
                    sc = (oh @ scale).reshape(shape[:2] + (1,))
                    loss_m += jnp.abs((a - tgt) / sc).sum()
                    if use_inv:
                        tgt_inv = (oh @ target_inv).reshape(shape)
                        sc_inv = (oh @ scale_inv).reshape(shape[:2] + (1,))
                        loss_inv += jnp.abs((a_inv - tgt_inv) / sc_inv).sum()
                loss = loss_m / denom + cfg.depth_loss_weight * (loss_inv / denom)

                # soft constraints are PER dilation group, then summed — the
                # reference keeps per-group scale/translation tensors and
                # sums per-tensor means (depth_aligner.py:150-155, 205-208)
                soft = 0.0
                for s, t in zip(s_list, t_list):
                    soft += cfg.lmda2 * (jnp.maximum(0.0, 1.0 - s) ** 2).mean()
                    soft += cfg.lmda3 * (t**2).mean()
                total = cfg.loss_scale * loss + soft
                aux = (target.min(), target.max())
                return total, aux

            n_all = sum(sizes)

            @jax.jit
            def solve(flat_t, oh_t, counts):
                params = (
                    jnp.ones((n_all,), jnp.float32),
                    jnp.zeros((n_all,), jnp.float32),
                )
                state = opt.init(params)

                def step(carry, _):
                    params, state = carry
                    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                        params, flat_t, oh_t, counts
                    )
                    updates, state = opt.update(grads, state)
                    params = optax.apply_updates(params, updates)
                    return (params, state), jnp.stack([loss, aux[0], aux[1]])

                (params, _), history = jax.lax.scan(
                    step, (params, state), None, length=cfg.num_iterations, unroll=4
                )
                return params, history

            _SOLVE_CACHE[key] = solve

        (s_all, t_all), history = _SOLVE_CACHE[key](
            tuple(flat), tuple(onehots), counts
        )
        bounds = np.concatenate([[0], np.cumsum([v.shape[0] for v in flat])])
        s_list = [s_all[bounds[i] : bounds[i + 1]] for i in range(len(flat))]
        t_list = [t_all[bounds[i] : bounds[i + 1]] for i in range(len(flat))]
        return s_list, t_list, history

    # ------------------------------------------------------------------
    def _merge(self, snippet_ls, index_mats, scales, translations, seq_len: int) -> jnp.ndarray:
        """Apply (s, t) at full res; average covering windows per frame
        (depth_aligner.py:231-262) — as a one-hot matmul (MXU stream)."""
        c, h, w = snippet_ls[0].shape[-3:]
        onehots = []
        counts = np.zeros((seq_len,), np.float32)
        for idx in index_mats:
            idx_np = np.asarray(idx)
            oh = np.zeros((seq_len, idx_np.size), np.float32)
            oh[idx_np.reshape(-1), np.arange(idx_np.size)] = 1.0
            onehots.append(jnp.asarray(oh))
            counts += np.bincount(idx_np.reshape(-1), minlength=seq_len)
        counts_j = jnp.asarray(counts)

        key = ("merge", tuple(s.shape for s in snippet_ls), seq_len)
        if key not in _MERGE_CACHE:

            @jax.jit
            def merge(snippets, oh_t, counts, s_list, t_list):
                acc = jnp.zeros((seq_len, c * h * w), jnp.float32)
                for v, oh, s, t in zip(snippets, oh_t, s_list, t_list):
                    a = v * s[:, None, None, None, None] + t[:, None, None, None, None]
                    acc = acc + oh @ a.reshape(-1, c * h * w)
                return (acc / counts[:, None]).reshape(seq_len, c, h, w)

            _MERGE_CACHE[key] = merge

        return _MERGE_CACHE[key](
            tuple(snippet_ls), tuple(onehots), counts_j, tuple(scales), tuple(translations)
        )
