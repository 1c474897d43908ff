"""RollingDepth video-depth pipeline — TPU-native.

Behavioral reference: the canonical depth pipeline
/root/reference/rollingdepth/rollingdepth_pipeline.py (__call__ :78-176,
forward :193-354, init_snippet_infer :356-463, refine :517-633,
single_step :635-663, encode_rgb :665-704, decode_depth :706-740).

TPU-first redesign (SURVEY.md §7):
- snippets are a *batch axis*: one ``[S, n]`` index matrix per dilation turns
  the reference's per-snippet Python loop (:415-446) into a single gather +
  chunked ``lax.map`` over a jitted denoise+decode program — one device
  dispatch per dilation instead of ~N
- the denoise loop is a ``lax.scan`` over timesteps with the functional DDIM
- the 10-step refinement with annealed dilation runs as ONE jitted
  ``lax.fori_loop`` over a precomputed ``[steps, S_pad, n]`` index tensor,
  with mask-weighted overlap averaging (replaces :571-629)
- VAE encode/decode are chunked with ``lax.map`` (static shapes) instead of
  the host-side ``max_vae_bs`` slicing loop (:679-693)
- the init noise is ONE latent map shared by every frame (:282-288) — the
  load-bearing temporal-consistency trick — generated from an explicit PRNG
  key
- alignment runs in the jitted optax solver (aligner.py)
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..aligner import S_BUCKET, AlignerConfig, DepthAligner
from ..models.unet import UNet2DCondition, unet_apply
from ..ops.attention import backend_tag
from ..models.vae import AutoencoderKL
from ..schedulers.ddim import DDIMScheduler
from ..io.video import load_video_frames
from .chunking import (
    FRAME_CAPACITY,
    block_rows,
    capacity as _capacity,
    concat_rows,
    encode_frames,
    encode_frames_padded,
    pad_zeros_dev,
    pick_chunk as _pick_chunk,
    round_up,
    row_capacity,
    run_blocked,
)
from .snippets import (
    cap_max_dilation,
    chain_stride_index_matrix,
    current_gap,
    partition_index_matrix,
    snippet_index_matrix,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


class RollingDepthOutput:
    """Mirror of the reference output container
    (/root/reference/rollingdepth/rollingdepth_pipeline.py:44-49).

    ``input_rgb`` is computed lazily: the uint8->float conversion of a full
    clip costs seconds on the host and most consumers never read it.
    ``snippet_ls`` may also be lazy (a callable producing the list): the
    per-dilation slices off the born-padded decode groups are per-clip-length
    glue programs that serving callers never need."""

    def __init__(self, input_frames, depth_pred, snippet_ls, depth_coaligned):
        self._input_frames = input_frames  # [N, 3, H, W] uint8 or f32 [-1,1]
        self.depth_pred = depth_pred  # [N, 1, H, W] in [-1, 1]
        self._snippet_ls = snippet_ls  # per dilation [S, n, 1, H, W] or thunk
        self.depth_coaligned = depth_coaligned  # [N, 1, H, W]
        self._input_rgb = None

    @property
    def snippet_ls(self):
        if callable(self._snippet_ls):
            self._snippet_ls = self._snippet_ls()
        return self._snippet_ls

    @snippet_ls.setter
    def snippet_ls(self, value):
        self._snippet_ls = value

    @property
    def input_rgb(self) -> np.ndarray:
        """[N, 3, H, W] in [0, 1]."""
        if self._input_rgb is None:
            f = self._input_frames
            if f.dtype == np.uint8:
                self._input_rgb = f.astype(np.float32) / 255.0
            else:
                self._input_rgb = np.asarray(f, dtype=np.float32) / 2.0 + 0.5
        return self._input_rgb

    @input_rgb.setter
    def input_rgb(self, value):
        self._input_rgb = value


def _pad_rows(x: np.ndarray, target: int) -> np.ndarray:
    if x.shape[0] >= target:
        return x
    reps = np.repeat(x[-1:], target - x.shape[0], axis=0)
    return np.concatenate([x, reps], axis=0)


def _round_up_sb(s: int) -> int:
    """Round a window count up to the aligner's S_BUCKET row bucket."""
    return S_BUCKET * (-(-s // S_BUCKET))


def _pad_rows_zero_np(x: np.ndarray, target: int) -> np.ndarray:
    """Zero-pad axis 0 on the HOST (free) — inputs are born bucket-padded so
    no downstream device program is keyed on the raw clip length."""
    if x.shape[0] >= target:
        return x
    widths = [(0, target - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths)




def _sync(x: jnp.ndarray) -> None:
    """True device sync via a scalar fetch (block_until_ready is a no-op on
    some remote transports)."""
    np.asarray(jax.device_get(x.ravel()[0]))


# FRAME_CAPACITY / _capacity re-exported from .chunking (shared with the
# relight pipeline)


def _upload(arr: np.ndarray, streams: int = 4) -> jnp.ndarray:
    """Host -> device over ``streams`` concurrent transfers (axis-0 split).

    Like ``_fetch_f32``, per-stream-bound transports (the dev tunnel) gain
    ~3-4x; on-host transports are unaffected."""
    n = arr.shape[0]
    if streams <= 1 or n < streams:
        return jnp.asarray(arr)
    import concurrent.futures

    bounds = np.linspace(0, n, streams + 1).astype(int)

    def up(se):
        part = jnp.asarray(arr[se[0] : se[1]])
        part.block_until_ready()
        return part

    with concurrent.futures.ThreadPoolExecutor(streams) as pool:
        parts = list(pool.map(up, zip(bounds[:-1], bounds[1:])))
    return jnp.concatenate(parts, axis=0)


def _fetch_f32(x: jnp.ndarray, streams: int = 4) -> np.ndarray:
    """Device -> host of a [-1, 1] map as uint16, dequantized to f32.

    Quarter the transfer bytes of f32 (the dominant cost on narrow
    interconnects) at a quantization error of 3e-5 — 16x more precise than
    an fp16 fetch near |x|=1.  The transfer is split across ``streams``
    concurrent fetches: narrow transports (the dev tunnel measures
    ~14-19 MB/s per stream but ~2.5-3x that with 4 parallel streams)
    are per-stream bound, while on-host transports are unaffected."""
    q = jnp.clip((x.astype(jnp.float32) + 1.0) * (65535.0 / 2.0), 0, 65535)
    dev = jnp.round(q).astype(jnp.uint16)
    n = dev.shape[0]
    if streams <= 1 or n < streams:
        host = np.asarray(dev)
    else:
        import concurrent.futures

        bounds = np.linspace(0, n, streams + 1).astype(int)
        with concurrent.futures.ThreadPoolExecutor(streams) as pool:
            parts = list(
                pool.map(lambda se: np.asarray(dev[se[0] : se[1]]), zip(bounds[:-1], bounds[1:]))
            )
        host = np.concatenate(parts, axis=0)
    return host.astype(np.float32) * (2.0 / 65535.0) - 1.0


class RollingDepthPipeline:
    """Inference pipeline: UNet (snippet-native) + VAE + DDIM + aligner."""

    def __init__(
        self,
        unet: UNet2DCondition,
        unet_params: Params,
        vae: AutoencoderKL,
        vae_params: Params,
        scheduler: DDIMScheduler,
        empty_text_embed: jnp.ndarray,  # [1, L, D] CLIP embedding of ""
        dtype=jnp.bfloat16,
        snippet_batch: int = 8,
        vae_batch: int = 4,
        mesh=None,
        use_flash: Optional[bool] = None,
    ):
        self.unet = unet
        self.vae = vae
        self.scheduler = scheduler
        self.dtype = dtype
        self.snippet_batch = snippet_batch
        self.vae_batch = vae_batch
        # attention backend: None = auto (Pallas flash on TPU), True = force
        # flash, False = force the XLA einsum path (debug / fallback knob,
        # analogous to toggling xformers on the reference)
        self.use_flash = use_flash
        # optional jax.sharding.Mesh with a "dp" axis: snippets within a
        # dilation pass are embarrassingly parallel (SURVEY.md §2.3) and are
        # sharded over dp with zero cross-chip attention traffic
        self.mesh = mesh

        # cast params to the compute dtype — except the W8A8 mode's int8
        # kernels and their fp32 dequant scales (ops/quant.py)
        def _cast_leaf(path, x):
            if jnp.issubdtype(x.dtype, jnp.integer):
                return x
            if path and getattr(path[-1], "key", None) == "w_scale":
                return x
            return x.astype(dtype)

        cast = lambda tree: jax.tree_util.tree_map_with_path(_cast_leaf, tree)
        self.unet_params = cast(unet_params)
        self.vae_params = cast(vae_params)
        self.empty_text_embed = jnp.asarray(empty_text_embed, dtype=dtype)

        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # public API (mirrors reference __call__ signature)
    # ------------------------------------------------------------------
    def __call__(
        self,
        input_video_path=None,
        input_frames: Optional[np.ndarray] = None,  # [N, 3, H, W]: [-1,1] f32 or uint8
        original_res=None,  # (H, W) before resize, for restore_res with input_frames
        start_frame: int = 0,
        frame_count: int = 0,
        processing_res: int = 1024,
        resample_method: str = "BILINEAR",
        dilations: Sequence[int] = (1, 25),
        cap_dilation: bool = True,
        snippet_lengths: Sequence[int] = (3,),
        init_infer_steps: Sequence[int] = (1,),
        strides: Sequence[int] = (1,),
        coalign_kwargs: Optional[Dict] = None,
        refine_step: int = 0,
        refine_snippet_len: int = 3,
        refine_start_dilation: int = 6,
        seed: Optional[int] = None,
        verbose: bool = False,
        max_vae_bs: int = 4,
        unload_snippet: bool = False,
        restore_res: bool = False,
        merge_in_latent: bool = False,
        latent_coalign_kwargs: Optional[Dict] = None,
        refine_in_latent: Optional[bool] = None,
        turbo_refine: Optional[bool] = None,
    ) -> RollingDepthOutput:
        if processing_res > 1024:
            logger.warning(
                "Processing at high resolution (%d) may lead to suboptimal accuracy.",
                processing_res,
            )
        if input_frames is None:
            input_frames, original_res = load_video_frames(
                input_video_path,
                start_frame=start_frame,
                frame_count=frame_count,
                processing_res=processing_res,
                resample_method=resample_method,
                verbose=verbose,
                dtype="uint8",  # normalized on device
            )
            logger.info("%d frames loaded from video %s", len(input_frames), input_video_path)
        elif original_res is None:
            original_res = input_frames.shape[-2:]

        out = self.forward(
            input_frames=np.asarray(input_frames),
            dilations=list(dilations),
            cap_dilation=cap_dilation,
            snippet_lengths=list(snippet_lengths),
            init_infer_steps=list(init_infer_steps),
            strides=list(strides),
            coalign_kwargs=coalign_kwargs,
            refine_step=refine_step,
            refine_snippet_len=refine_snippet_len,
            refine_start_dilation=refine_start_dilation,
            seed=seed,
            verbose=verbose,
            max_vae_bs=max_vae_bs,
            unload_snippet=unload_snippet,
            merge_in_latent=merge_in_latent,
            latent_coalign_kwargs=latent_coalign_kwargs,
            refine_in_latent=refine_in_latent,
            turbo_refine=turbo_refine,
        )

        if restore_res:
            import cv2

            h, w = original_res
            out.depth_pred = np.stack(
                [
                    cv2.resize(d[0], (w, h), interpolation=cv2.INTER_LINEAR)[None]
                    for d in out.depth_pred
                ]
            )
        return out

    # ------------------------------------------------------------------
    def forward(
        self,
        input_frames: np.ndarray,  # [N, 3, H, W] in [-1, 1]; uint8 or a
        # device-resident jax.Array (uint8) to skip the host->device upload
        dilations: List[int],
        cap_dilation: bool = True,
        snippet_lengths: List[int] = [3],
        init_infer_steps: List[int] = [1],
        strides: List[int] = [1],
        coalign_kwargs: Optional[Dict] = None,
        refine_step: int = 0,
        refine_snippet_len: int = 3,
        refine_start_dilation: int = 6,
        seed: Optional[int] = None,
        verbose: bool = False,
        max_vae_bs: int = 4,
        unload_snippet: bool = False,
        init_noise: Optional[np.ndarray] = None,  # [4, h, w] shared noise override
        fetch_output: bool = True,  # False: leave depth maps on device so a
        # pipelined caller can overlap the fetch with the next clip's compute
        merge_in_latent: bool = False,  # TURBO: co-align + merge snippet
        # LATENTS and decode N frames once (kills the ~3.4x snippet-decode
        # redundancy of the reference merge); snippet_ls comes back empty
        latent_coalign_kwargs: Optional[Dict] = None,  # AlignerConfig overrides
        # for the latent-space solve (defaults: factor=3, depth_loss_weight=0)
        refine_in_latent: Optional[bool] = None,  # EXPERIMENTAL: feed the
        # merged LATENT directly into refinement, skipping the reference's
        # decode -> minmax-renorm -> re-encode round trip
        # (rollingdepth_pipeline.py:315-343).  None = OFF: the skipped
        # renormalization is load-bearing (composed-fixture drift corr 0.87
        # vs >0.999 with it), and the round trip it saves is only ~7% of a
        # refine clip — opt in explicitly for serving paths that tolerate it
        turbo_refine: Optional[bool] = None,  # TURBO stage 3: refine with
        # partition windows (~N/n UNet evals per step) instead of the
        # reference's stride-1 windows (~N evals per step) — see
        # snippets.partition_index_matrix; None follows merge_in_latent
        # (zero drift on the composed parity fixture)
    ) -> RollingDepthOutput:
        # ---- argument validation/broadcast (reference :213-241)
        assert 1 in dilations, "dilations should include 1"
        assert len(snippet_lengths) == len(set(snippet_lengths))
        if len(snippet_lengths) > 1:
            assert len(snippet_lengths) == len(dilations)
        else:
            snippet_lengths = snippet_lengths * len(dilations)
        if len(init_infer_steps) > 1:
            assert len(init_infer_steps) == len(dilations)
        else:
            init_infer_steps = init_infer_steps * len(dilations)
        assert min(init_infer_steps) > 0
        if len(strides) > 1:
            assert len(strides) == len(dilations)
        else:
            strides = strides * len(dilations)
        # stride > 1 EXCEEDS the reference: its CLI accepts --strides but
        # raises NotImplementedError for any value != 1
        # (rollingdepth_pipeline.py:240-241).  Here stride s covers each
        # dilation chain with windows every s hops (s=1 reference-exact,
        # s=snippet_len the turbo partition) — see
        # snippets.chain_stride_index_matrix.  Validation happens there.

        seq_len = input_frames.shape[0]
        if cap_dilation:
            dilations = [
                cap_max_dilation(seq_len, n, d, verbose)
                for n, d in zip(snippet_lengths, dilations)
            ]
            refine_start_dilation = cap_max_dilation(
                seq_len, refine_snippet_len, refine_start_dilation, verbose
            )

        timings: Dict[str, float] = {}
        t0 = time.perf_counter()

        # ---- VAE encode all frames (reference :265-267)
        # ship the smallest possible bytes and do layout/cast on device:
        # uint8 input uploads at 1/4 the f32 cost and normalizes on-chip;
        # a jax.Array input is already device-resident (pipelined callers
        # upload clip k+1 while clip k computes) and skips the upload
        # born-padded (new-length compile fix, doc/ROADMAP.md): host inputs
        # are zero-padded to the encode row capacity BEFORE upload — numpy
        # pad is free, whereas a raw-length device array keys every
        # downstream program on the exact clip length (~22 trivial compiles
        # x ~1.7-3.5 s serialized remote compile latency per new length).
        # True counts travel as Python ints (dynamic trip counts) or tiny
        # host-built masks; ONE slice at the output boundary restores the
        # exact-length contract.
        enc_bs = _pick_chunk(seq_len, max_vae_bs)
        enc_cap = row_capacity(round_up(seq_len, enc_bs))
        if isinstance(input_frames, jax.Array):
            # device-resident serving input: one pad program per raw length
            # (serving loops reuse one length, so this compiles once)
            dev = self._pad_zeros_dev(input_frames, enc_cap)
        elif input_frames.dtype == np.uint8:
            dev = _upload(_pad_rows_zero_np(input_frames, enc_cap))
        else:
            dev = _upload(_pad_rows_zero_np(
                input_frames.astype(np.float32, copy=False), enc_cap))
        # one fused normalize program (not 4 eager transpose/cast/div/sub
        # dispatches): raw-shaped glue compiles cost ~1.7 s each serialized
        # on the tunnel, so every chain of eager ops on a clip-length-shaped
        # array is folded into a single cached program
        fkey = ("normalize_frames", dev.shape, str(dev.dtype))
        if fkey not in self._jit_cache:
            dtype = self.dtype
            if dev.dtype == jnp.uint8:
                self._jit_cache[fkey] = jax.jit(
                    lambda x: jnp.transpose(x, (0, 2, 3, 1)).astype(dtype) / 127.5 - 1.0
                )
            else:
                self._jit_cache[fkey] = jax.jit(
                    lambda x: jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)
                )
        frames_nhwc = self._jit_cache[fkey](dev)
        # [enc_cap, h, w, 4] — capacity-padded; only seq_len rows are real
        rgb_latent = encode_frames_padded(
            self._jit_cache, self.vae, self.vae_params,
            frames_nhwc, seq_len, max_vae_bs,
        )
        if verbose:
            _sync(rgb_latent)
        timings["encode"] = time.perf_counter() - t0

        # ---- shared init noise (reference :282-288 — one map for all frames);
        # an explicit override enables cross-framework parity runs with the
        # exact same Gaussian draw as a torch generator
        h, w = rgb_latent.shape[1:3]
        if init_noise is not None:
            init_noise_single = jnp.asarray(
                np.transpose(np.asarray(init_noise, np.float32), (1, 2, 0))
            ).astype(self.dtype)
        else:
            key = jax.random.PRNGKey(0 if seed is None else seed)
            init_noise_single = jax.random.normal(key, (h, w, 4), dtype=jnp.float32).astype(self.dtype)

        # ---- per-dilation snippet inference (reference :356-463)
        # decoded snippets stay ON DEVICE (the reference's default
        # unload_snippet=False keeps them in VRAM, :456-458); moving them to
        # host is opt-in, exactly as upstream
        t0 = time.perf_counter()
        # denoise every dilation pass first (latents only); decoding depends
        # on the merge mode below
        lat_ls: List[jnp.ndarray] = []  # per dilation [S, n, h, w, 4]
        idx_ls = [
            snippet_index_matrix(seq_len, snip_len, dilation)
            if stride == 1
            else chain_stride_index_matrix(seq_len, snip_len, dilation, stride)
            for dilation, snip_len, stride in zip(dilations, snippet_lengths, strides)
        ]
        if len(set(snippet_lengths)) == 1 and len(set(init_infer_steps)) == 1:
            # all dilation passes share (snippet_len, steps) — true for every
            # preset — so their snippets are interchangeable work items: run
            # them as ONE batched denoise (uniform chunking instead of a
            # short tail pass per dilation, and a single UNet program)
            idx_all = np.concatenate(idx_ls, axis=0)
            lat_all = self._infer_snippets(
                rgb_latent, init_noise_single, idx_all, init_infer_steps[0]
            )
            # split per dilation in ONE program (3 eager slices = 3 glue
            # compiles per new clip length on the tunnel); groups come out
            # BORN-PADDED to the aligner's S_BUCKET so its prep/solve/merge
            # programs key on buckets, never on raw window counts — this
            # split is the single cheap raw-keyed boundary program
            counts = tuple(idx.shape[0] for idx in idx_ls)
            skey = ("dilation_split", lat_all.shape, str(lat_all.dtype), counts)
            if skey not in self._jit_cache:
                bounds = np.concatenate([[0], np.cumsum(counts)])
                self._jit_cache[skey] = jax.jit(lambda x: tuple(
                    jnp.pad(
                        jax.lax.slice_in_dim(x, int(a), int(b), axis=0),
                        [(0, _round_up_sb(int(b - a)) - int(b - a))]
                        + [(0, 0)] * (x.ndim - 1),
                    )
                    for a, b in zip(bounds[:-1], bounds[1:])
                ))
            lat_ls.extend(self._jit_cache[skey](lat_all))
        else:
            for idx, infer_steps in zip(idx_ls, init_infer_steps):
                lat_ls.append(
                    self._infer_snippets(rgb_latent, init_noise_single, idx, infer_steps)
                )

        # TURBO stage flags.  turbo_refine (partition windows) follows
        # merge_in_latent — its drift on the composed parity fixture is zero.
        # refine_in_latent is opt-in ONLY: handing the merged latent straight
        # to refinement skips the reference's minmax renormalization, which
        # measurably matters (fixture corr drops 0.999 -> 0.87) while saving
        # just one decode+encode (~7% of a refine clip).
        if refine_in_latent is None:
            refine_in_latent = False
        if turbo_refine is None:
            turbo_refine = merge_in_latent
        refine_latent_direct = bool(
            merge_in_latent and refine_step > 0 and refine_in_latent
        )

        merged_lat = None
        if merge_in_latent:
            # ---- TURBO: latent-space co-alignment + merge.
            # The reference aligns and merges in decoded depth space
            # (depth_aligner.py:231-262 applied after decode_depth,
            # rollingdepth_pipeline.py:706-740), which decodes every snippet
            # frame — ~3.4x the clip length at the fast preset.  Here the
            # per-snippet (s, t) are solved over the snippet LATENTS (the
            # solver is C-native; inverse-depth term off, finer subsample
            # since latents are 8x smaller), overlapping windows are averaged
            # in latent space, and the VAE decodes exactly N frames once.
            # Accuracy drift vs the reference merge is bounded by
            # tests/test_e2e_parity.py::test_latent_merge_close_to_reference.
            if verbose:
                _sync(lat_ls[-1])
            timings["snippet_infer"] = time.perf_counter() - t0
            snippet_ls = []  # snippets are never decoded in turbo mode
            t0 = time.perf_counter()
            lat_kwargs: Dict[str, Any] = {"factor": 3, "depth_loss_weight": 0.0}
            lat_kwargs.update(latent_coalign_kwargs or {})
            aligner = DepthAligner(AlignerConfig(**lat_kwargs), verbose=verbose)
            # latents stay in their native [S, n, h, w, 4] layout — the
            # aligner's channels_last path avoids two full transposes;
            # explicit index_mats + seq_len because the groups may be
            # born-padded (uniform-preset branch above)
            merged_lat, scales, translations, loss_history = aligner.run(
                lat_ls, dilations, restore_shift=True, channels_last=True,
                return_st=False,  # forward only consumes merged
                index_mats=idx_ls, seq_len=seq_len,
            )  # [N, h, w, 4]
            if verbose:
                _sync(merged_lat)
            timings["coalign"] = time.perf_counter() - t0
            if refine_latent_direct and not fetch_output:
                # TURBO stage 2: refinement reads the merged latent directly;
                # the coaligned DEPTH is never materialized.  Serving callers
                # (fetch_output=False) skip its decode entirely —
                # depth_coaligned comes back None on this path.
                depth_coaligned = None
            else:
                t0 = time.perf_counter()
                depth = self._decode_depth(merged_lat.astype(self.dtype), max_vae_bs)  # [N, H, W]
                depth_coaligned = depth[:, None].astype(jnp.float32)
                if verbose:
                    _sync(depth_coaligned)
                timings["decode"] = time.perf_counter() - t0
        else:
            # decode ALL snippet latents in one flat pass: per-chunk decode
            # padding used to waste ~20% of decoder FLOPs (e.g. 288 decoded
            # frames for 240 real at the fast-preset shape); the combined
            # flat pass pads only to the final vae_bs multiple
            # flatten+concat before and split+reshape after the decode each
            # run as ONE cached program: the eager chain was 4 reshape/
            # slice/concat glue compiles PER DILATION at every new clip
            # length (~12 of the reference path's 29 new-length compiles,
            # ~1.7 s each serialized on remote transports)
            # true window counts come from the index matrices (lat_ls groups
            # may be born-padded to S_BUCKET by the uniform-preset split)
            shapes = tuple(
                (idx.shape[0], lat.shape[1]) for idx, lat in zip(idx_ls, lat_ls)
            )
            fckey = ("flatten_concat", tuple(lat.shape for lat in lat_ls),
                     shapes, tuple(str(lat.dtype) for lat in lat_ls))
            if fckey not in self._jit_cache:
                self._jit_cache[fckey] = jax.jit(lambda ls: jnp.concatenate(
                    # [:s] drops born-pad rows so the decoder below only
                    # touches REAL snippet frames
                    [lat[:s].reshape((-1,) + lat.shape[2:])
                     for lat, (s, _) in zip(ls, shapes)],
                    axis=0,
                ))
            depth_flat = self._decode_depth(
                self._jit_cache[fckey](tuple(lat_ls)), max_vae_bs
            )
            # split back per dilation; groups come out BORN-PADDED to the
            # aligner's S_BUCKET (zero rows) so prep/solve/merge key on
            # buckets — the user-facing snippet_ls below slices back to the
            # true counts
            sskey = ("snippet_split", depth_flat.shape, str(depth_flat.dtype), shapes)
            if sskey not in self._jit_cache:
                bounds = np.concatenate([[0], np.cumsum([s * n for s, n in shapes])])
                self._jit_cache[sskey] = jax.jit(lambda x: tuple(
                    jnp.pad(
                        jax.lax.slice_in_dim(x, int(a), int(b), axis=0)
                        .reshape(s_i, n_i, 1, *x.shape[1:]).astype(jnp.float32),
                        [(0, _round_up_sb(s_i) - s_i)] + [(0, 0)] * 4,
                    )
                    for (s_i, n_i), a, b in zip(shapes, bounds[:-1], bounds[1:])
                ))
            group_ls = self._jit_cache[sskey](depth_flat)
            if unload_snippet:
                snippet_ls = [
                    np.asarray(g[:s], dtype=np.float32)
                    for g, (s, _) in zip(group_ls, shapes)
                ]
            else:
                # LAZY (RollingDepthOutput property): the [:s] slices back to
                # true counts are per-clip-length glue programs serving
                # callers never touch
                snippet_ls = lambda: [  # noqa: E731
                    g[:s] for g, (s, _) in zip(group_ls, shapes)
                ]
                if verbose:
                    _sync(group_ls[-1])
            timings["snippet_infer"] = time.perf_counter() - t0

            # ---- co-alignment (reference :304-318)
            t0 = time.perf_counter()
            aligner = DepthAligner(AlignerConfig(**(coalign_kwargs or {})), verbose=verbose)
            depth_coaligned, scales, translations, loss_history = aligner.run(
                group_ls, dilations,
                return_st=False,  # forward only consumes the coaligned depth
                index_mats=idx_ls, seq_len=seq_len,
            )
            if verbose:
                _sync(depth_coaligned)
            timings["coalign"] = time.perf_counter() - t0

        # min-max renormalize to [-1, 1] (reference :315-318) as ONE program
        if depth_coaligned is not None:
            nkey = ("minmax_norm", depth_coaligned.shape, str(depth_coaligned.dtype))
            if nkey not in self._jit_cache:
                self._jit_cache[nkey] = jax.jit(
                    lambda x: ((x - x.min()) / (x.max() - x.min())) * 2.0 - 1.0
                )
            depth_coaligned = self._jit_cache[nkey](depth_coaligned)  # [N, 1, H, W]
        t0 = time.perf_counter()

        # ---- refinement (reference :323-343)
        if refine_step > 0:
            t0 = time.perf_counter()
            if refine_latent_direct:
                # TURBO stage 2: the merged latent IS the refine input.  The
                # reference round-trips through pixel space (decode the
                # coaligned depth, minmax-renorm it, re-encode —
                # rollingdepth_pipeline.py:315-343) purely to hand the
                # refiner a [-1,1]-normalized depth video; the latent merge
                # already averaged model-native latents whose decode sits in
                # that range, so the round trip buys normalization at the
                # cost of decode+encode error and two VAE passes.  Drift vs
                # the reference hand-off is bounded by
                # tests/test_e2e_parity.py::test_turbo_refine_close_to_reference.
                depth_latent = merged_lat.astype(self.dtype)
            else:
                # repeat-to-3ch + layout + cast as ONE program (3 glue
                # compiles per new length otherwise)
                dkey = ("depth3_prep", depth_coaligned.shape, str(depth_coaligned.dtype))
                if dkey not in self._jit_cache:
                    dtype = self.dtype
                    self._jit_cache[dkey] = jax.jit(lambda x: jnp.transpose(
                        jnp.repeat(x, 3, axis=1), (0, 2, 3, 1)
                    ).astype(dtype))
                depth3 = self._jit_cache[dkey](depth_coaligned)  # N H W 3
                # padded encode: the [block]-rounded latent buffer keeps
                # _refine's add_noise_pad program keyed on the bucket, not
                # the clip length (its seq_len=... arg owns the true count)
                depth_latent = encode_frames_padded(
                    self._jit_cache, self.vae, self.vae_params, depth3,
                    seq_len, max_vae_bs,
                )
            depth_latent = self._refine(
                rgb_latent,
                depth_latent,
                init_noise_single,
                refine_step=refine_step,
                snippet_len=refine_snippet_len,
                start_dilation=refine_start_dilation,
                partition=bool(turbo_refine),
                seq_len=seq_len,
            )
            depth_dev = self._decode_depth(depth_latent, max_vae_bs)[:, None]  # [N,1,H,W]
            if verbose and not fetch_output:
                _sync(depth_dev)  # timing must cover the compute, not dispatch
            if fetch_output:
                depth_pred = _fetch_f32(depth_dev[:, 0])[:, None]
            timings["refine"] = time.perf_counter() - t0
        else:
            depth_dev = depth_coaligned  # [N, 1, H, W]
            if fetch_output:
                depth_pred = _fetch_f32(depth_coaligned)
                timings["fetch"] = time.perf_counter() - t0

        if verbose:
            logger.info("phase timings: %s", {k: f"{v:.2f}s" for k, v in timings.items()})
        self.last_timings = timings
        if not fetch_output:
            # device-resident output: the caller overlaps fetch_depth() with
            # the next clip's compute (see bench.py steady-state loop)
            return RollingDepthOutput(
                input_frames=input_frames,
                depth_pred=depth_dev,
                snippet_ls=snippet_ls,
                depth_coaligned=depth_dev if refine_step <= 0 else depth_coaligned,
            )
        return RollingDepthOutput(
            input_frames=input_frames,
            depth_pred=np.asarray(depth_pred, dtype=np.float32),
            snippet_ls=snippet_ls,
            # reuse the already-fetched array when no refinement ran
            depth_coaligned=(
                depth_pred
                if refine_step <= 0
                else _fetch_f32(depth_coaligned)
            ),
        )

    @staticmethod
    def fetch_depth(depth_dev: jnp.ndarray) -> np.ndarray:
        """Fetch a device-resident depth map produced with
        ``fetch_output=False`` (uint16 quantized, multi-stream)."""
        if depth_dev.ndim == 4:  # [N, 1, H, W]
            return _fetch_f32(depth_dev[:, 0])[:, None]
        return _fetch_f32(depth_dev)

    # ------------------------------------------------------------------
    # jitted programs — LENGTH-INDEPENDENT per-chunk compilation
    #
    # Every compute-heavy program below is keyed by its CHUNK shape only
    # (plus the FRAME_CAPACITY bucket for gather sources), never by the clip
    # length: a host loop feeds fixed-shape chunks, so a second clip of a
    # different length reuses all heavy programs and pays only for trivial
    # pad/slice/concat glue (the reference runs any length with zero
    # recompilation, run_video.py:550-585).
    # ------------------------------------------------------------------
    def _pad_zeros_dev(self, x: jnp.ndarray, target: int) -> jnp.ndarray:
        return pad_zeros_dev(self._jit_cache, x, target)

    def _encode_frames(self, frames: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
        """[N, H, W, 3] -> [N, h, w, 4] scaled latents (shared chunked
        program, chunking.encode_frames)."""
        return encode_frames(self._jit_cache, self.vae, self.vae_params, frames, vae_bs)

    def _decode_depth(self, latents: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
        """[N, h, w, 4] -> [N, H, W] depth (channel-mean, reference :737).

        Fixed-row-block dispatches (chunking.run_blocked): the VAE program
        is keyed by (chunk, block) only — a new clip length / snippet count
        NEVER recompiles the decoder (at fp32 768p that recompile was the
        dominant term of the 222.8 s new-length overhead,
        BENCH/r5_paper_fp32.log).  With a mesh each chunk is dp-sharded
        like the denoise pass."""
        n = latents.shape[0]
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        bs = _pick_chunk(n, vae_bs)
        rows = bs * dp
        n_pad = n + ((-n) % rows)
        block = block_rows(rows)
        key = ("decode", latents.shape[1:], bs, dp, block, backend_tag())
        if key not in self._jit_cache:
            vae = self.vae
            mesh = self.mesh
            img_sd = jax.eval_shape(
                lambda p, c: vae.decode(p, c),
                self.vae_params,
                jax.ShapeDtypeStruct((rows,) + latents.shape[1:], latents.dtype),
            )

            @jax.jit
            def fn(params, z, nchunks):
                def dec(c):
                    return vae.decode(params, c).mean(axis=-1)

                def body(i, buf):
                    c = jax.lax.dynamic_slice_in_dim(z, i * rows, rows, 0)
                    if mesh is None:
                        img = dec(c)
                    else:
                        from jax.sharding import PartitionSpec as P

                        img = jax.shard_map(
                            dec, mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
                            check_vma=False, axis_names=frozenset({"dp"}),
                        )(c)
                    return jax.lax.dynamic_update_slice_in_dim(buf, img, i * rows, 0)

                buf = jnp.zeros((block,) + img_sd.shape[1:3], img_sd.dtype)
                return jax.lax.fori_loop(0, nchunks, body, buf)

            self._jit_cache[key] = fn
        fn = self._jit_cache[key]
        out = run_blocked(
            self._jit_cache, lambda z, t: fn(self.vae_params, z, t),
            latents, n_pad, rows, block,
        )
        return out[:n]

    def _decode_rgb(self, latents: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
        """[N, h, w, 4] -> [N, H, W, 3] full RGB decode (no channel mean) —
        the relight/passthrough decode variant (rollingimg decode_rgb).
        Fixed-row-block dispatches like ``_decode_depth``."""
        n = latents.shape[0]
        bs = _pick_chunk(n, vae_bs)
        n_pad = n + ((-n) % bs)
        block = block_rows(bs)
        key = ("decode_rgb", latents.shape[1:], bs, block, backend_tag())
        if key not in self._jit_cache:
            vae = self.vae
            img_sd = jax.eval_shape(
                lambda p, c: vae.decode(p, c),
                self.vae_params,
                jax.ShapeDtypeStruct((bs,) + latents.shape[1:], latents.dtype),
            )

            @jax.jit
            def fn(params, z, nchunks):
                def body(i, buf):
                    c = jax.lax.dynamic_slice_in_dim(z, i * bs, bs, 0)
                    img = vae.decode(params, c)
                    return jax.lax.dynamic_update_slice_in_dim(buf, img, i * bs, 0)

                buf = jnp.zeros((block,) + img_sd.shape[1:], img_sd.dtype)
                return jax.lax.fori_loop(0, nchunks, body, buf)

            self._jit_cache[key] = fn
        fn = self._jit_cache[key]
        out = run_blocked(
            self._jit_cache, lambda z, t: fn(self.vae_params, z, t),
            latents, n_pad, bs, block,
        )
        return out[:n]

    def _infer_snippets(
        self,
        rgb_latent: jnp.ndarray,  # [N, h, w, 4]
        init_noise_single: jnp.ndarray,  # [h, w, 4]
        index_matrix: np.ndarray,  # [S, n]
        infer_steps: int,
    ) -> jnp.ndarray:
        """One dilation pass: gather -> batched denoise -> snippet LATENTS.

        Replaces the per-snippet loop at reference :406-454 with one compiled
        chunk program host-looped over [sb*dp, n] index chunks; every
        snippet's denoise starts from the SAME init noise (reference
        :417-418 clones from the shared init).  With a mesh, each chunk's
        snippet axis is sharded over ``dp`` via shard_map — chips work on
        disjoint snippets with no communication.  The gather source is
        capacity-padded so the program is keyed by (chunk, n, h, w, bucket),
        NOT the clip length."""
        s, n = index_matrix.shape
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        sb = _pick_chunk(s, self.snippet_batch, dp)
        rows = sb * dp
        timesteps = jnp.asarray(self.scheduler.timesteps(infer_steps))
        cap = _capacity(rgb_latent.shape[0])
        src = self._pad_zeros_dev(rgb_latent, cap)

        def run(idx_np: np.ndarray, sb_c: int) -> jnp.ndarray:
            # fixed-row-block dispatches: the UNet program is keyed by
            # (chunk, BLOCK) — never by the snippet-count bucket, so a new
            # clip length reuses it (chunking.run_blocked rationale); idx
            # blocks are sliced on the HOST (numpy, free) and uploaded as
            # one fixed shape
            s_c = idx_np.shape[0]
            rows_c = sb_c * dp
            s_pad = s_c + ((-s_c) % rows_c)
            block = block_rows(rows_c)
            fn = self._infer_program(
                rgb_latent.shape[1:], n, sb_c, dp, infer_steps, cap, block,
            )
            nblocks = max(1, -(-s_pad // block))
            idx_full = _pad_rows(idx_np, nblocks * block)
            outs = []
            for b in range(nblocks):
                idx_b = jnp.asarray(idx_full[b * block:(b + 1) * block])
                trips = -(-min(block, s_pad - b * block) // rows_c)
                outs.append(fn(
                    self.unet_params, self.empty_text_embed, src, idx_b,
                    init_noise_single, timesteps, trips,
                ))
            return concat_rows(self._jit_cache, outs)[:s_c]

        # Mixed-chunk dispatch: full-size chunks keep the UNet batch at peak
        # MXU efficiency; a small remainder runs as dynamic trips of ONE
        # 4-chunk program (a 4-eval trip measures 264 ms vs 740 ms for a full
        # 16-chunk trip — scripts/bench_infer_chunks.py), so pad waste falls
        # from up to rows-1 evals to <= 3*dp.  Remainders past 2 small trips
        # (per-device rem > 8) pad into one more full chunk instead: by the
        # same measurements that's equally fast and compiles nothing new —
        # exactly one auxiliary program shape ever exists per config, keeping
        # new-clip-length compile overhead at zero.
        s_main = (s // rows) * rows
        rem = s - s_main
        tail_sb = 4
        if s_main == 0 or rem == 0 or -(-rem // dp) > 2 * tail_sb or sb <= tail_sb:
            logger.debug("infer %d snippets: uniform chunk %d", s, sb)
            return run(index_matrix, sb)
        logger.debug("infer %d snippets: mixed %d x %d + tail of %d (chunk %d)",
                     s, s_main // rows, sb, rem, tail_sb)
        main = run(index_matrix[:s_main], sb)
        tail = run(index_matrix[s_main:], tail_sb)
        return jnp.concatenate([main, tail], axis=0)  # [S, n, h, w, 4]

    def _infer_program(self, lat_hw4, n, sb, dp, infer_steps, cap, block):
        rows = sb * dp
        key = ("infer", lat_hw4, n, sb, dp, infer_steps, cap, block,
               self.use_flash, backend_tag())
        if key not in self._jit_cache:
            unet, unet_cfg = self.unet, self.unet.config
            scheduler = self.scheduler
            dtype = self.dtype
            mesh = self.mesh
            use_flash = self.use_flash

            @jax.jit
            def fn(unet_params, text, src, idx, noise_single, ts, nchunks):
                def denoise_chunk(rgb_chunk):  # [sb, n, h, w, 4]
                    noise = jnp.broadcast_to(noise_single, rgb_chunk.shape).astype(dtype)

                    def body(depth_lat, t):
                        x = jnp.concatenate([rgb_chunk, depth_lat], axis=-1)
                        eps = unet_apply(unet_params, unet_cfg, x, jnp.full((sb,), t), text,
                                         use_flash=use_flash)
                        prev, _ = scheduler.step(
                            eps.astype(jnp.float32),
                            t,
                            depth_lat.astype(jnp.float32),
                            num_inference_steps=infer_steps,
                        )
                        return prev.astype(dtype), None

                    depth_lat, _ = jax.lax.scan(body, noise, ts)
                    return depth_lat  # [sb, n, h, w, 4]

                def chunk_body(i, buf):
                    idx_c = jax.lax.dynamic_slice_in_dim(idx, i * rows, rows, 0)
                    snippets = jnp.take(src, idx_c, axis=0)  # [rows, n, h, w, 4]
                    if mesh is None:
                        lat = denoise_chunk(snippets)
                    else:
                        from jax.sharding import PartitionSpec as P

                        # manual over dp (disjoint snippet rows per device
                        # group); any other mesh axis (tp) is left to GSPMD —
                        # params placed with unet_param_sharding get
                        # Megatron-split attention/MLP matmuls + psum inside
                        # each dp shard automatically
                        lat = jax.shard_map(
                            denoise_chunk,
                            mesh=mesh,
                            in_specs=P("dp"),
                            out_specs=P("dp"),
                            check_vma=False,
                            axis_names=frozenset({"dp"}),
                        )(snippets)
                    return jax.lax.dynamic_update_slice_in_dim(buf, lat, i * rows, 0)

                buf = jnp.zeros((block, n) + src.shape[1:], dtype)
                return jax.lax.fori_loop(0, nchunks, chunk_body, buf)

            self._jit_cache[key] = fn

        return self._jit_cache[key]

    def _refine(
        self,
        rgb_latent: jnp.ndarray,  # [N, h, w, 4]
        depth_latent: jnp.ndarray,  # [N, h, w, 4] (coaligned, encoded)
        init_noise_single: jnp.ndarray,  # [h, w, 4]
        refine_step: int,
        snippet_len: int,
        start_dilation: int,
        skip_t_ratio: float = 0.5,
        partition: bool = False,
        seq_len: int = None,  # TRUE frame count; inputs may be
        # capacity-padded (born-padded pipeline), so shape[0] is a bucket
    ) -> jnp.ndarray:
        """Coarse-to-fine rolling refinement (reference :517-633).

        Host-orchestrated: each of the ``refine_step`` passes gathers
        annealed-dilation snippet windows, runs the shared per-chunk
        denoise+scatter program over them, and averages overlapping latents.
        All device programs are keyed by (chunk, n, h, w, capacity bucket) —
        compiled once, reused for every step AND every clip length.

        ``partition=True`` (TURBO) replaces each step's stride-1 window set
        (~seq_len windows, every frame denoised ~snippet_len times and
        averaged) with a phase-rotated partition (~seq_len/snippet_len
        windows, every frame denoised ~once) — snippet_len x fewer UNet
        evals per step at a bounded drift (see
        snippets.partition_index_matrix)."""
        if seq_len is None:
            seq_len = rgb_latent.shape[0]
        total_steps = int(refine_step / skip_t_ratio)
        all_ts = self.scheduler.timesteps(total_steps)
        start_idx = int(len(all_ts) * skip_t_ratio)
        timesteps = all_ts[start_idx:]  # length == refine_step
        n_steps = len(timesteps)

        # per-step snippet index matrices with annealed gap (reference :572-580)
        idx_list, true_counts = [], []
        for i_step in range(n_steps):
            gap = current_gap(i_step, n_steps, start_dilation, 1)
            if partition:
                m = partition_index_matrix(seq_len, snippet_len, gap + 1, phase=i_step)
            else:
                m = snippet_index_matrix(seq_len, snippet_len, gap + 1)
            idx_list.append(m)
            true_counts.append(m.shape[0])
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        s_max = max(true_counts)
        sb = _pick_chunk(s_max, self.snippet_batch, dp)
        rows = sb * dp
        cap = _capacity(seq_len)
        # idx/mask buffers sized by the FRAME capacity bucket, not the
        # window-count bucket: stride-1 window counts are < seq_len <= cap,
        # so scap is a function of cap and never an independent recompile
        # axis for step_fn (the buffers are tiny int32/f32 [scap, n]; the
        # per-step chunk count stays dynamic, pad rows are never computed)
        scap = round_up(cap, rows)
        idx_steps = [_pad_rows(m, scap) for m in idx_list]  # [scap, n] each
        mask_steps = [
            (np.arange(scap) < c).astype(np.float32) for c in true_counts
        ]

        src_rgb = self._pad_zeros_dev(rgb_latent, cap)
        lat_shape = rgb_latent.shape[1:]  # (h, w, 4)
        n = snippet_len

        # ONE dispatch per refinement pass: gather + UNet + DDIM step +
        # mask-weighted scatter-average over a dynamic number of fixed-size
        # chunks, keyed by (chunk, n, h, w, buckets) — never seq_len
        key = ("refine_step", lat_shape, n, sb, dp, total_steps, cap, scap,
               self.use_flash, backend_tag())
        if key not in self._jit_cache:
            unet, unet_cfg = self.unet, self.unet.config
            scheduler = self.scheduler
            dtype = self.dtype
            mesh = self.mesh
            use_flash = self.use_flash

            @jax.jit
            def step_fn(unet_params, text, src_rgb, src_depth, idx, mask, t, nchunks):
                def denoise_chunk(args):
                    rgb_chunk, depth_chunk = args  # [sb, n, h, w, 4]
                    x = jnp.concatenate([rgb_chunk, depth_chunk], axis=-1)
                    eps = unet_apply(unet_params, unet_cfg, x, jnp.full((sb,), t), text,
                                     use_flash=use_flash)
                    prev, _ = scheduler.step(
                        eps.astype(jnp.float32),
                        t,
                        depth_chunk.astype(jnp.float32),
                        num_inference_steps=total_steps,
                    )
                    return prev

                def chunk_body(i, carry):
                    acc, cnt = carry
                    idx_c = jax.lax.dynamic_slice_in_dim(idx, i * rows, rows, 0)
                    mask_c = jax.lax.dynamic_slice_in_dim(mask, i * rows, rows, 0)
                    rgb_s = jnp.take(src_rgb, idx_c, axis=0)  # [rows, n, h, w, 4]
                    depth_s = jnp.take(src_depth, idx_c, axis=0)
                    if mesh is None:
                        preds = denoise_chunk((rgb_s, depth_s))
                    else:
                        from jax.sharding import PartitionSpec as P

                        preds = jax.shard_map(
                            denoise_chunk,
                            mesh=mesh,
                            in_specs=P("dp"),
                            out_specs=P("dp"),
                            check_vma=False,
                            axis_names=frozenset({"dp"}),
                        )((rgb_s, depth_s))

                    # mask-weighted overlap scatter (reference :586-629)
                    wmask = mask_c[:, None]
                    flat_idx = idx_c.reshape(-1)
                    acc = acc.at[flat_idx].add(
                        (preds * wmask[:, :, None, None, None]).reshape(
                            (-1,) + preds.shape[2:]
                        )
                    )
                    cnt = cnt.at[flat_idx].add(
                        jnp.broadcast_to(wmask, idx_c.shape).reshape(-1)
                    )
                    return acc, cnt

                acc = jnp.zeros(src_depth.shape, jnp.float32)
                cnt = jnp.zeros((src_depth.shape[0],), jnp.float32)
                acc, cnt = jax.lax.fori_loop(0, nchunks, chunk_body, (acc, cnt))
                # frames covered by no refine window (possible with
                # cap_dilation=False on short clips) keep their previous
                # latent instead of propagating 0/0 NaNs; the reference
                # asserts coverage instead (rollingdepth_pipeline.py:628)
                cnt4 = cnt[:, None, None, None]
                return jnp.where(
                    cnt4 > 0, acc / jnp.maximum(cnt4, 1.0),
                    src_depth.astype(jnp.float32),
                ).astype(dtype)

            self._jit_cache[key] = step_fn
        step_fn = self._jit_cache[key]

        nkey = ("refine_noise", depth_latent.shape, cap)
        if nkey not in self._jit_cache:
            scheduler = self.scheduler
            dtype = self.dtype
            n_true = depth_latent.shape[0]

            # add noise at the first kept timestep (reference :548-552);
            # the shared-noise broadcast AND the capacity pad are folded in
            # (vs an eager broadcast_to + a separate padzeros program = 2
            # extra glue compiles per new clip length)
            @jax.jit
            def add_noise_pad(d, nz, t):
                noisy = scheduler.add_noise(
                    d.astype(jnp.float32),
                    jnp.broadcast_to(nz.astype(jnp.float32), d.shape),
                    t,
                ).astype(dtype)
                widths = [(0, cap - n_true)] + [(0, 0)] * (noisy.ndim - 1)
                return jnp.pad(noisy, widths)

            self._jit_cache[nkey] = add_noise_pad

        depth_cap = self._jit_cache[nkey](
            depth_latent, init_noise_single, jnp.asarray(timesteps[0])
        )  # [cap, h, w, 4]

        for i_step in range(n_steps):
            # dynamic chunk count per step: annealed-gap steps have fewer
            # true windows, and masked rows beyond the last needed chunk are
            # never computed at all
            c_true = true_counts[i_step]
            nchunks = (c_true + ((-c_true) % rows)) // rows
            depth_cap = step_fn(
                self.unet_params, self.empty_text_embed, src_rgb, depth_cap,
                jnp.asarray(idx_steps[i_step]), jnp.asarray(mask_steps[i_step]),
                jnp.asarray(timesteps[i_step]), nchunks,
            )

        return depth_cap[:seq_len]
