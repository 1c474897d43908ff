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

from ..aligner import AlignerConfig, DepthAligner
from ..models.unet import UNet2DCondition, unet_apply
from ..models.vae import AutoencoderKL
from ..schedulers.ddim import DDIMScheduler
from ..io.video import load_video_frames
from .snippets import cap_max_dilation, current_gap, snippet_index_matrix

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


class RollingDepthOutput:
    """Mirror of the reference output container
    (/root/reference/rollingdepth/rollingdepth_pipeline.py:44-49).

    ``input_rgb`` is computed lazily: the uint8->float conversion of a full
    clip costs seconds on the host and most consumers never read it."""

    def __init__(self, input_frames, depth_pred, snippet_ls, depth_coaligned):
        self._input_frames = input_frames  # [N, 3, H, W] uint8 or f32 [-1,1]
        self.depth_pred = depth_pred  # [N, 1, H, W] in [-1, 1]
        self.snippet_ls = snippet_ls  # per dilation [S, n, 1, H, W]
        self.depth_coaligned = depth_coaligned  # [N, 1, H, W]
        self._input_rgb = None

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


def _pick_chunk(s: int, max_chunk: int, dp: int = 1) -> int:
    """Largest chunk size <= max_chunk whose padding waste stays small.

    E.g. 22 snippets with max 16 would pad to 32 (45% wasted compute);
    chunk 8 pads to 24 instead."""
    hi = max(1, min(max_chunk, s))
    lo = max(1, hi // 2)  # chunks below half-size underutilize the MXU
    best, best_waste = hi, float("inf")
    for cand in range(hi, lo - 1, -1):
        waste = (-s) % (cand * dp)
        if waste < best_waste:
            best, best_waste = cand, waste
        if waste == 0:
            break
    return best


def _sync(x: jnp.ndarray) -> None:
    """True device sync via a scalar fetch (block_until_ready is a no-op on
    some remote transports)."""
    np.asarray(jax.device_get(x.ravel()[0]))


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
    ):
        self.unet = unet
        self.vae = vae
        self.scheduler = scheduler
        self.dtype = dtype
        self.snippet_batch = snippet_batch
        self.vae_batch = vae_batch
        # optional jax.sharding.Mesh with a "dp" axis: snippets within a
        # dilation pass are embarrassingly parallel (SURVEY.md §2.3) and are
        # sharded over dp with zero cross-chip attention traffic
        self.mesh = mesh

        cast = lambda tree: jax.tree.map(lambda x: x.astype(dtype), tree)
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
        if strides != [1] * len(dilations):
            raise NotImplementedError("Only implemented for stride 1")

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
        if isinstance(input_frames, jax.Array):
            dev = input_frames  # [N, 3, H, W]
        elif input_frames.dtype == np.uint8:
            dev = _upload(input_frames)  # [N, 3, H, W] uint8
        else:
            dev = _upload(input_frames.astype(np.float32, copy=False))
        if dev.dtype == jnp.uint8:
            frames_nhwc = jnp.transpose(dev, (0, 2, 3, 1)).astype(self.dtype) / 127.5 - 1.0
        else:
            frames_nhwc = jnp.transpose(dev, (0, 2, 3, 1)).astype(self.dtype)
        rgb_latent = self._encode_frames(frames_nhwc, max_vae_bs)  # [N, h, w, 4]
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
        # denoise every dilation pass first (latents only), then decode ALL
        # snippet latents in one flat pass: per-chunk decode padding used to
        # waste ~20% of decoder FLOPs (e.g. 288 decoded frames for 240 real
        # at the fast-preset shape); the combined flat pass pads only to the
        # final vae_bs multiple
        lat_ls: List[jnp.ndarray] = []
        shapes: List[Tuple[int, int]] = []
        idx_ls = [
            snippet_index_matrix(seq_len, snip_len, dilation)
            for dilation, snip_len in zip(dilations, snippet_lengths)
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
            ofs = 0
            for idx in idx_ls:
                lat = lat_all[ofs : ofs + idx.shape[0]]
                ofs += idx.shape[0]
                lat_ls.append(lat.reshape((-1,) + lat.shape[2:]))
                shapes.append((lat.shape[0], lat.shape[1]))
        else:
            for idx, infer_steps in zip(idx_ls, init_infer_steps):
                lat = self._infer_snippets(rgb_latent, init_noise_single, idx, infer_steps)
                lat_ls.append(lat.reshape((-1,) + lat.shape[2:]))
                shapes.append((lat.shape[0], lat.shape[1]))
        depth_flat = self._decode_depth(jnp.concatenate(lat_ls, axis=0), max_vae_bs)
        snippet_ls: List[jnp.ndarray] = []
        ofs = 0
        for s_i, n_i in shapes:
            img = depth_flat[ofs : ofs + s_i * n_i]
            ofs += s_i * n_i
            decoded = img.reshape(s_i, n_i, 1, *img.shape[1:]).astype(jnp.float32)
            snippet_ls.append(np.asarray(decoded, dtype=np.float32) if unload_snippet else decoded)
        if verbose and not unload_snippet:
            _sync(snippet_ls[-1])
        timings["snippet_infer"] = time.perf_counter() - t0

        # ---- co-alignment (reference :304-318)
        t0 = time.perf_counter()
        aligner = DepthAligner(AlignerConfig(**(coalign_kwargs or {})), verbose=verbose)
        depth_coaligned, scales, translations, loss_history = aligner.run(
            [jnp.asarray(s) for s in snippet_ls], dilations
        )
        depth_coaligned = depth_coaligned - depth_coaligned.min()
        depth_coaligned = depth_coaligned / depth_coaligned.max()
        depth_coaligned = depth_coaligned * 2.0 - 1.0  # [N, 1, H, W]
        if verbose:
            _sync(depth_coaligned)
        timings["coalign"] = time.perf_counter() - t0
        t0 = time.perf_counter()

        # ---- refinement (reference :323-343)
        if refine_step > 0:
            t0 = time.perf_counter()
            depth3 = jnp.repeat(depth_coaligned, 3, axis=1)  # N 3 H W
            depth3 = jnp.transpose(depth3, (0, 2, 3, 1)).astype(self.dtype)
            depth_latent = self._encode_frames(depth3, max_vae_bs)
            depth_latent = self._refine(
                rgb_latent,
                depth_latent,
                init_noise_single,
                refine_step=refine_step,
                snippet_len=refine_snippet_len,
                start_dilation=refine_start_dilation,
            )
            depth_dev = self._decode_depth(depth_latent, max_vae_bs)[:, None]  # [N,1,H,W]
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
    # jitted programs (cached per shape bucket)
    # ------------------------------------------------------------------
    def _encode_frames(self, frames: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
        """[N, H, W, 3] -> [N, h, w, 4] scaled latents, lax.map-chunked."""
        n = frames.shape[0]
        bs = min(vae_bs, n)
        pad = (-n) % bs
        key = ("encode", frames.shape[1:], bs)
        if key not in self._jit_cache:
            vae, cfg = self.vae, self.vae.config

            @jax.jit
            def fn(params, x):
                chunks = x.reshape((-1, bs) + x.shape[1:])
                out = jax.lax.map(lambda c: vae.encode_mean(params, c), chunks)
                return out.reshape((-1,) + out.shape[2:])

            self._jit_cache[key] = fn
        if pad:
            frames = jnp.concatenate([frames, frames[-1:].repeat(pad, axis=0)], axis=0)
        out = self._jit_cache[key](self.vae_params, frames)
        return out[:n]

    def _decode_depth(self, latents: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
        """[N, h, w, 4] -> [N, H, W] depth (channel-mean, reference :737).

        With a mesh, decode chunks are dp-sharded like the denoise pass."""
        n = latents.shape[0]
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        bs = min(vae_bs, n)
        pad = (-n) % (bs * dp)
        key = ("decode", latents.shape[1:], bs, n + pad)
        if key not in self._jit_cache:
            vae = self.vae
            mesh = self.mesh

            @jax.jit
            def fn(params, z):
                chunks = z.reshape((-1, bs) + z.shape[1:])

                def dec(c):
                    img = vae.decode(params, c)  # [bs, H, W, 3]
                    return img.mean(axis=-1)

                if mesh is None:
                    out = jax.lax.map(dec, chunks)
                else:
                    from jax.sharding import PartitionSpec as P

                    out = jax.shard_map(
                        lambda local: jax.lax.map(dec, local),
                        mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
                        check_vma=False, axis_names=frozenset({"dp"}),
                    )(chunks)
                return out.reshape((-1,) + out.shape[2:])

            self._jit_cache[key] = fn
        if pad:
            latents = jnp.concatenate([latents, latents[-1:].repeat(pad, axis=0)], axis=0)
        out = self._jit_cache[key](self.vae_params, latents)
        return out[:n]

    def _decode_rgb(self, latents: jnp.ndarray, vae_bs: int) -> jnp.ndarray:
        """[N, h, w, 4] -> [N, H, W, 3] full RGB decode (no channel mean) —
        the relight/passthrough decode variant (rollingimg decode_rgb)."""
        n = latents.shape[0]
        bs = min(vae_bs, n)
        pad = (-n) % bs
        key = ("decode_rgb", latents.shape[1:], bs)
        if key not in self._jit_cache:
            vae = self.vae

            @jax.jit
            def fn(params, z):
                chunks = z.reshape((-1, bs) + z.shape[1:])
                out = jax.lax.map(lambda c: vae.decode(params, c), chunks)
                return out.reshape((-1,) + out.shape[2:])

            self._jit_cache[key] = fn
        if pad:
            latents = jnp.concatenate([latents, latents[-1:].repeat(pad, axis=0)], axis=0)
        return self._jit_cache[key](self.vae_params, latents)[:n]

    def _infer_snippets(
        self,
        rgb_latent: jnp.ndarray,  # [N, h, w, 4]
        init_noise_single: jnp.ndarray,  # [h, w, 4]
        index_matrix: np.ndarray,  # [S, n]
        infer_steps: int,
    ) -> jnp.ndarray:
        """One dilation pass: gather -> batched denoise -> snippet LATENTS.

        Replaces the per-snippet loop at reference :406-454 with one device
        program; every snippet's denoise starts from the SAME init noise
        (reference :417-418 clones from the shared init).  With a mesh, the
        snippet-chunk axis is sharded over ``dp`` via shard_map — chips work
        on disjoint snippets with no communication.  Decoding happens in a
        separate flat pass over all dilations (forward) so decode chunking
        never pads per-denoise-chunk."""
        s, n = index_matrix.shape
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        sb = _pick_chunk(s, self.snippet_batch, dp)
        s_pad = s + ((-s) % (sb * dp))
        idx = jnp.asarray(_pad_rows(index_matrix, s_pad))
        timesteps = jnp.asarray(self.scheduler.timesteps(infer_steps))

        key = ("infer", rgb_latent.shape[1:], n, sb, infer_steps, s_pad)
        if key not in self._jit_cache:
            unet, unet_cfg = self.unet, self.unet.config
            scheduler = self.scheduler
            dtype = self.dtype
            mesh = self.mesh

            @jax.jit
            def fn(unet_params, text, rgb_latent, idx, noise_single, ts):
                snippets = jnp.take(rgb_latent, idx, axis=0)  # [S_pad, n, h, w, 4]
                chunks = snippets.reshape((-1, sb) + snippets.shape[1:])

                def denoise_chunk(rgb_chunk):
                    noise = jnp.broadcast_to(noise_single, rgb_chunk.shape).astype(dtype)

                    def body(depth_lat, t):
                        x = jnp.concatenate([rgb_chunk, depth_lat], axis=-1)
                        eps = unet_apply(unet_params, unet_cfg, x, jnp.full((sb,), t), text)
                        prev, _ = scheduler.step(
                            eps.astype(jnp.float32),
                            t,
                            depth_lat.astype(jnp.float32),
                            num_inference_steps=infer_steps,
                        )
                        return prev.astype(dtype), None

                    depth_lat, _ = jax.lax.scan(body, noise, ts)
                    return depth_lat  # [sb, n, h, w, 4]

                if mesh is None:
                    out = jax.lax.map(denoise_chunk, chunks)
                else:
                    from jax.sharding import PartitionSpec as P

                    # manual over dp (disjoint snippet chunks per device
                    # group); any other mesh axis (tp) is left to GSPMD —
                    # params placed with unet_param_sharding get
                    # Megatron-split attention/MLP matmuls + psum inside
                    # each dp shard automatically
                    out = jax.shard_map(
                        lambda local: jax.lax.map(denoise_chunk, local),
                        mesh=mesh,
                        in_specs=P("dp"),
                        out_specs=P("dp"),
                        check_vma=False,
                        axis_names=frozenset({"dp"}),
                    )(chunks)
                return out.reshape((-1,) + out.shape[2:])

            self._jit_cache[key] = fn

        out = self._jit_cache[key](
            self.unet_params, self.empty_text_embed,
            rgb_latent, idx, init_noise_single, timesteps,
        )
        return out[:s]  # [S, n, h, w, 4]

    def _refine(
        self,
        rgb_latent: jnp.ndarray,  # [N, h, w, 4]
        depth_latent: jnp.ndarray,  # [N, h, w, 4] (coaligned, encoded)
        init_noise_single: jnp.ndarray,  # [h, w, 4]
        refine_step: int,
        snippet_len: int,
        start_dilation: int,
        skip_t_ratio: float = 0.5,
    ) -> jnp.ndarray:
        """Coarse-to-fine rolling refinement (reference :517-633) as one
        jitted fori_loop over a precomputed [steps, S_pad, n] index tensor."""
        seq_len = rgb_latent.shape[0]
        total_steps = int(refine_step / skip_t_ratio)
        all_ts = self.scheduler.timesteps(total_steps)
        start_idx = int(len(all_ts) * skip_t_ratio)
        timesteps = all_ts[start_idx:]  # length == refine_step

        # per-step snippet index matrices with annealed gap (reference :572-580)
        idx_list, mask_list = [], []
        for i_step in range(len(timesteps)):
            gap = current_gap(i_step, len(timesteps), start_dilation, 1)
            m = snippet_index_matrix(seq_len, snippet_len, gap + 1)
            idx_list.append(m)
            mask_list.append(m.shape[0])
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        s_pad = max(m.shape[0] for m in idx_list)
        sb = min(self.snippet_batch, s_pad)
        s_pad = s_pad + ((-s_pad) % (sb * dp))
        idx_tensor = np.stack([_pad_rows(m, s_pad) for m in idx_list])  # [T, S_pad, n]
        masks = np.stack(
            [(np.arange(s_pad) < s_true).astype(np.float32) for s_true in mask_list]
        )  # [T, S_pad]

        key = ("refine", rgb_latent.shape, snippet_len, sb, s_pad, len(timesteps), total_steps)
        if key not in self._jit_cache:
            unet, unet_cfg = self.unet, self.unet.config
            scheduler = self.scheduler
            dtype = self.dtype
            n_steps = len(timesteps)
            mesh = self.mesh

            @jax.jit
            def fn(unet_params, text, rgb_latent, depth_latent, noise_single, idx_t, mask_t, ts):
                # add noise at the first kept timestep (reference :548-552)
                noise = jnp.broadcast_to(noise_single, depth_latent.shape)
                depth_new = scheduler.add_noise(
                    depth_latent.astype(jnp.float32), noise.astype(jnp.float32), ts[0]
                ).astype(dtype)

                def step_body(i, depth_new):
                    idx = idx_t[i]  # [S_pad, n]
                    mask = mask_t[i]  # [S_pad]
                    t = ts[i]
                    depth_old = depth_new
                    rgb_s = jnp.take(rgb_latent, idx, axis=0)
                    depth_s = jnp.take(depth_old, idx, axis=0)

                    def denoise_chunk(args):
                        rgb_chunk, depth_chunk = args
                        x = jnp.concatenate([rgb_chunk, depth_chunk], axis=-1)
                        eps = unet_apply(unet_params, unet_cfg, x, jnp.full((sb,), t), text)
                        prev, _ = scheduler.step(
                            eps.astype(jnp.float32),
                            t,
                            depth_chunk.astype(jnp.float32),
                            num_inference_steps=total_steps,
                        )
                        return prev.astype(dtype)

                    rgb_c = rgb_s.reshape((-1, sb) + rgb_s.shape[1:])
                    dep_c = depth_s.reshape((-1, sb) + depth_s.shape[1:])
                    if mesh is None:
                        preds = jax.lax.map(denoise_chunk, (rgb_c, dep_c))
                    else:
                        from jax.sharding import PartitionSpec as P

                        preds = jax.shard_map(
                            lambda local: jax.lax.map(denoise_chunk, local),
                            mesh=mesh,
                            in_specs=P("dp"),
                            out_specs=P("dp"),
                            check_vma=False,
                            axis_names=frozenset({"dp"}),
                        )((rgb_c, dep_c))
                    preds = preds.reshape((-1,) + preds.shape[2:])  # [S_pad, n, h, w, 4]

                    # mask-weighted overlap average (reference :586-629)
                    acc = jnp.zeros(depth_old.shape, jnp.float32)
                    cnt = jnp.zeros((seq_len,), jnp.float32)
                    wmask = mask[:, None]
                    flat_idx = idx.reshape(-1)
                    acc = acc.at[flat_idx].add(
                        (preds.astype(jnp.float32) * wmask[:, :, None, None, None]).reshape(
                            (-1,) + preds.shape[2:]
                        )
                    )
                    cnt = cnt.at[flat_idx].add(jnp.broadcast_to(wmask, idx.shape).reshape(-1))
                    # frames covered by no refine window (possible with
                    # cap_dilation=False on short clips) keep their previous
                    # latent instead of propagating 0/0 NaNs; the reference
                    # asserts coverage instead (rollingdepth_pipeline.py:628)
                    cnt4 = cnt[:, None, None, None]
                    return jnp.where(
                        cnt4 > 0, acc / jnp.maximum(cnt4, 1.0), depth_old.astype(jnp.float32)
                    ).astype(dtype)

                return jax.lax.fori_loop(0, n_steps, step_body, depth_new)

            self._jit_cache[key] = fn

        return self._jit_cache[key](
            self.unet_params, self.empty_text_embed, rgb_latent, depth_latent,
            init_noise_single, jnp.asarray(idx_tensor), jnp.asarray(masks),
            jnp.asarray(timesteps),
        )
