"""CLI driver — preset-compatible rebuild of /root/reference/run_video.py.

Two modes share the preset system (run_video.py:413-468):
- depth (canonical upstream path): ``-i <video>`` -> depth npy + colorized
  mp4(s) + optional side-by-side / snippets outputs (the output suite at
  run_video.py:636-701)
- relight (the fork's active path): ``-fi <fg> -bi <bg>`` -> relit RGB video
  (run_video.py:560-628)
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import numpy as np

from .io.colorize import colorize_depth_multi_thread
from .io.video import (
    concatenate_videos_horizontally,
    enumerate_videos,
    get_video_fps,
    write_video_from_numpy,
)
from .utils.presets import resolve_preset, str2bool

EXAMPLE_DOC_STRING = "python run_video.py -i video.mp4 -o output/ -p fast"


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run video depth estimation / relighting using RollingDepth (TPU)."
    )
    parser.add_argument("-i", "--input-video", type=str, default=None, dest="input_video",
                        help="Input video(s): file, .txt list, or directory (depth mode).")
    parser.add_argument("-fi", "--input-fg-video", type=str, default=None, dest="input_fg_video",
                        help="Foreground video(s) (relight mode).")
    parser.add_argument("-bi", "--input-bg-video", type=str, default=None, dest="input_bg_video",
                        help="Background video(s) (relight mode).")
    parser.add_argument("-o", "--output-dir", type=str, required=True, dest="output_dir")
    parser.add_argument("-p", "--preset", type=str, default="fast",
                        choices=["fast", "fast1024", "full", "paper", "none"])
    parser.add_argument("--start-frame", "--from", type=int, default=0, dest="start_frame")
    parser.add_argument("--frame-count", "--frames", type=int, default=0, dest="frame_count")
    parser.add_argument("-c", "--checkpoint", type=str, default="prs-eth/rollingdepth-v1-0")
    parser.add_argument("--res", "--processing-resolution", type=int, default=None, dest="res")
    parser.add_argument("--max-vae-bs", type=int, default=None,
                        help="VAE encode/decode batch (default: 4, or 16 on TPU).")
    parser.add_argument("--fps", "--output-fps", type=int, default=0, dest="output_fps")
    parser.add_argument("--restore-res", "--restore-resolution", type=str2bool,
                        default=False, dest="restore_res")
    parser.add_argument("--save-sbs", "--save-side-by-side", type=str2bool, default=True, dest="save_sbs")
    parser.add_argument("--save-npy", type=str2bool, default=True)
    parser.add_argument("--save-snippets", type=str2bool, default=False)
    parser.add_argument("--cmap", "--color-maps", type=str, nargs="+",
                        default=["Spectral_r", "Greys_r"], dest="color_maps")
    parser.add_argument("-d", "--dilations", type=int, nargs="+", default=None, dest="dilations")
    parser.add_argument("--cap-dilation", type=str2bool, default=None, dest="cap_dilation")
    parser.add_argument("--dtype", "--data-type", "--precision", type=str, default=None,
                        choices=["fp16", "fp32", "bf16", None], dest="dtype")
    parser.add_argument("--snip-len", "--snippet-lengths", type=int, nargs="+",
                        default=None, dest="snippet_lengths")
    parser.add_argument("--refine-step", type=int, default=None, dest="refine_step")
    parser.add_argument("--refine-snippet-len", type=int, default=None)
    parser.add_argument("--refine-start-dilation", type=int, default=None)
    parser.add_argument("--init-infer-steps", type=int, nargs="+", default=None)
    parser.add_argument("--strides", type=int, nargs="+", default=None,
                        help="window stride per dilation chain, 1..snippet_len "
                             "(default 1 = the reference's sliding windows; "
                             "snippet_len = the turbo partition; in between "
                             "trades overlap smoothing for ~stride x fewer "
                             "UNet evals — the dial the reference's strides "
                             "parameter declares but does not implement)")
    parser.add_argument("--resample-method", type=str, default="BILINEAR",
                        choices=["BILINEAR", "NEAREST_EXACT", "BICUBIC"])
    parser.add_argument("--unload-snippet", type=str2bool, default=False)
    parser.add_argument("--merge-in-latent", type=str2bool, default=None,
                        dest="merge_in_latent",
                        help="Turbo merge: co-align+merge snippet latents and decode "
                             "N frames once (fast presets default on); false = exact "
                             "reference decode-all-snippets merge.")
    parser.add_argument("--refine-in-latent", type=str2bool, default=None,
                        dest="refine_in_latent",
                        help="EXPERIMENTAL: feed the merged latent directly into "
                             "refinement (skips decode->minmax-renorm->re-encode). "
                             "Default OFF — the skipped renormalization carries "
                             "real drift for a ~7%% saving.")
    parser.add_argument("--turbo-refine", type=str2bool, default=None,
                        dest="turbo_refine",
                        help="Partition refine windows (~snippet_len x fewer UNet "
                             "evals per refine step); false = reference stride-1 "
                             "windows.  Default follows --merge-in-latent.")
    parser.add_argument("--snippet-batch", type=int, default=None,
                        help="Snippets denoised per device step (default: 8, or 16 on TPU).")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--quantize", type=str, default="none",
                        choices=["none", "w8a8"],
                        help="Serving-mode weight+activation quantization of the UNet "
                             "(ops/quant.py); int8 MXU path, no reference equivalent.")
    parser.add_argument("--attn-backend", type=str, default=None,
                        choices=["auto", "flash", "xla"], dest="attn_backend",
                        help="Attention kernel: auto (Pallas flash on TPU), or force "
                             "flash/xla — the fallback analogue of toggling xformers.")
    # relight-mode prompts (defaults = the reference's hardcoded set,
    # rollingimg_pipeline.py:1148-1150)
    # accuracy evaluation over the bundled data_split manifests (eval.py);
    # the reference ships the manifests but no harness (SURVEY.md C14)
    parser.add_argument("--eval", type=str, default=None, dest="eval_dataset",
                        help="run AbsRel/delta1 evaluation instead of video inference: "
                             "a dataset name (scannet|bonn_rgbd|pointodyssey|dydtof) "
                             "using the bundled data_split manifests, or a path to a "
                             "split dir of rgb,depth CSV manifests")
    parser.add_argument("--eval-data-root", type=str, default=None,
                        help="directory the manifests' relative frame paths resolve under")
    parser.add_argument("--eval-max-sequences", type=int, default=None,
                        help="evaluate only the first N manifests (deterministic order)")
    parser.add_argument("--eval-depth-scale", type=float, default=None,
                        help="override the per-dataset GT uint16->meters decode factor "
                             "(eval.py DATASET_DEPTH_SCALE; use when a GT export "
                             "deviates from the dataset's published convention)")
    parser.add_argument("--prompt", type=str, default=None)
    parser.add_argument("--a-prompt", type=str, default=None, dest="a_prompt")
    parser.add_argument("--n-prompt", type=str, default=None, dest="n_prompt")
    parser.add_argument("--init-mode", type=str, default="t2i",
                        choices=["t2i", "shared_noise", "passthrough"],
                        help="Relight init-latent source (replaces the reference's precomputed blob).")
    parser.add_argument("--turbo-relight", type=str2bool, default=False,
                        dest="turbo_relight",
                        help="Relight with partition windows (~snippet_len x fewer "
                             "20-step SDE denoises + decodes per dilation); false "
                             "(default) = the reference's stride-1 windows.")
    return parser


def resolve_args(argv=None):
    parser = build_parser()
    input_args = parser.parse_args(argv)
    overrides = {
        k: v
        for k, v in vars(input_args).items()
        if k
        in {
            "res", "snippet_lengths", "cap_dilation", "dtype", "refine_snippet_len",
            "refine_start_dilation", "dilations", "refine_step", "init_infer_steps",
            "strides",
            "max_vae_bs", "unload_snippet", "restore_res", "resample_method",
            "start_frame", "frame_count", "seed", "verbose", "snippet_batch",
            "merge_in_latent", "refine_in_latent", "turbo_refine",
        }
        and v is not None
    }
    settings = resolve_preset(input_args.preset, overrides)
    # TPU-tuned execution defaults (only when the user didn't override): the
    # reference's max_vae_bs=4 suits a 24 GB 3090, but the v5e decoder runs
    # 27 TF/s at bs4 vs 78+ at bs16 (BASELINE.md conv table), and larger
    # snippet chunks keep the UNet batch on the MXU's efficient tile sizes
    import jax

    if jax.default_backend() == "tpu":
        if "max_vae_bs" not in overrides:
            # fp32 (the paper preset's parity dtype) doubles decoder
            # activations AND weight residency (the SD2 UNet alone is
            # 3.5 GB fp32); bs 16 decode chunks exhaust v5e HBM — measured
            # 2026-08-20, BENCH/r5_paper_fp32 — so the fp32 default halves
            settings.max_vae_bs = 8 if settings.dtype == "fp32" else 16
        if "snippet_batch" not in overrides:
            settings.snippet_batch = 16
    return input_args, settings


def run_depth(args, settings) -> None:
    from .io.pretrained import load_rollingdepth_pipeline

    logging.info("Loading checkpoint from %s", args.checkpoint)
    pipe = load_rollingdepth_pipeline(
        args.checkpoint, dtype=settings.dtype, snippet_batch=settings.snippet_batch,
        quantize=args.quantize,
    )

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # multi-host runs split the video list per host group (clips are
    # embarrassingly parallel — no DCN collectives); identity on one host
    from .parallel.multihost import shard_work

    videos = shard_work(enumerate_videos(args.input_video))

    merge_in_latent = settings.merge_in_latent
    if merge_in_latent and args.save_snippets:
        # snippet predictions are a decode-all-path debug output; turbo never
        # decodes them, so honor --save-snippets over the turbo default
        logging.warning("--save-snippets requires the reference merge path; "
                        "disabling merge-in-latent turbo mode.")
        merge_in_latent = False

    # prefetch: decode video k+1 on a host thread while k computes
    import queue
    import threading

    from .io.video import load_video_frames

    decode_q: "queue.Queue" = queue.Queue(maxsize=1)

    def _decoder():
        for v in videos:
            try:
                frames, orig = load_video_frames(
                    v, start_frame=settings.start_frame,
                    frame_count=settings.frame_count,
                    processing_res=settings.res,
                    resample_method=settings.resample_method,
                    dtype="uint8",
                )
                decode_q.put((v, frames, orig, None))
            except Exception as e:  # noqa: BLE001
                decode_q.put((v, None, None, e))

    threading.Thread(target=_decoder, daemon=True).start()

    # device->host fetch + colorize + disk writes of clip k overlap clip
    # k+1's on-device compute (single worker keeps output order; exceptions
    # surface on the next iteration's result())
    import concurrent.futures

    save_pool = concurrent.futures.ThreadPoolExecutor(1)
    pending = None
    for _ in videos:
        v, frames, orig, err = decode_q.get()
        if err is not None:
            raise err
        video_path = Path(v)
        logging.info("Processing %s", video_path)
        out = pipe(
            input_frames=frames,
            original_res=orig,
            dilations=list(settings.dilations),
            cap_dilation=settings.cap_dilation,
            snippet_lengths=list(settings.snippet_lengths),
            init_infer_steps=list(settings.init_infer_steps),
            strides=list(settings.strides),
            refine_step=settings.refine_step,
            refine_snippet_len=settings.refine_snippet_len,
            refine_start_dilation=settings.refine_start_dilation,
            seed=settings.seed,
            verbose=settings.verbose,
            max_vae_bs=settings.max_vae_bs,
            unload_snippet=settings.unload_snippet,
            restore_res=settings.restore_res,
            merge_in_latent=merge_in_latent,
            refine_in_latent=settings.refine_in_latent,
            turbo_refine=settings.turbo_refine,
        )
        if pending is not None:
            pending.result()
        pending = save_pool.submit(save_depth_outputs, out, video_path, output_dir, args)
    if pending is not None:
        pending.result()
    save_pool.shutdown()
    logging.info("Finished. %d predictions are saved to %s", len(videos), output_dir)


def save_depth_outputs(pipe_out, video_path: Path, output_dir: Path, args) -> None:
    """The reference output suite (run_video.py:636-701)."""
    depth_pred = pipe_out.depth_pred  # [N, 1, H, W]
    output_fps = args.output_fps
    if not output_fps > 0:
        try:
            output_fps = int(get_video_fps(video_path))
        except Exception:
            output_fps = 0
        if output_fps <= 0:
            # containers without fps metadata probe as 0.0 (no exception);
            # fps<=0 would make every encoder open fail AFTER the pipeline ran
            output_fps = 30

    if args.save_npy:
        save_to = output_dir / f"{video_path.stem}_pred.npy"
        np.save(save_to, depth_pred.squeeze(1))  # [N, H, W]

    if args.save_snippets and pipe_out.snippet_ls is not None:
        save_to = output_dir / f"{video_path.stem}_snippets.npz"
        snippet_dict = {}
        for i_dil, snippets in enumerate(pipe_out.snippet_ls):
            snippet_dict[f"dilation{i_dil}"] = snippets.squeeze(2)
        np.savez_compressed(save_to, **snippet_dict)

    for i_cmap, cmap in enumerate(args.color_maps):
        if cmap == "":
            continue
        colored_np = colorize_depth_multi_thread(
            depth=depth_pred, valid_mask=None, chunk_size=4, num_threads=4,
            color_map=cmap, verbose=args.verbose,
        )  # [n, h, w, 3] uint8
        save_to = output_dir / f"{video_path.stem}_{cmap}.mp4"
        write_video_from_numpy(colored_np, save_to, fps=output_fps, crf=23,
                               preset="medium", verbose=args.verbose)

        if args.save_sbs and i_cmap == 0:
            rgb = (pipe_out.input_rgb * 255).astype(np.uint8)  # [N, 3, H, W]
            colored_chw = colored_np.transpose(0, 3, 1, 2)
            concat = concatenate_videos_horizontally(rgb, colored_chw, gap=10)
            concat = np.clip(concat, 0, 255).astype(np.uint8).transpose(0, 2, 3, 1)
            save_to = output_dir / f"{video_path.stem}_rgbd.mp4"
            write_video_from_numpy(concat, save_to, fps=output_fps, crf=23,
                                   preset="medium", verbose=args.verbose)


def run_eval(args, settings) -> None:
    """AbsRel/δ1 over a data_split manifest set, one command away from the
    driver-target number (BASELINE.json:5) once checkpoints/frames exist.

    Writes ``<output_dir>/eval_<dataset>.csv`` with one affine-aligned
    metric row per sequence plus a MEAN row, and prints the means."""
    from .eval import DEFAULT_SPLIT_DIR, evaluate_dataset
    from .io.pretrained import load_rollingdepth_pipeline

    if os.path.isdir(args.eval_dataset):
        split_dir = args.eval_dataset
        dataset = Path(args.eval_dataset).name
    else:
        split_dir = os.path.join(DEFAULT_SPLIT_DIR, args.eval_dataset)
        dataset = args.eval_dataset
    if not args.eval_data_root:
        raise SystemExit("--eval requires --eval-data-root <frames dir>")

    logging.info("Loading checkpoint from %s", args.checkpoint)
    pipe = load_rollingdepth_pipeline(
        args.checkpoint, dtype=settings.dtype, snippet_batch=settings.snippet_batch,
        quantize=args.quantize,
    )
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    csv_path = str(output_dir / f"eval_{dataset}.csv")
    means = evaluate_dataset(
        pipe,
        split_dir=split_dir,
        data_root=args.eval_data_root,
        dataset=dataset,
        processing_res=settings.res,
        max_sequences=args.eval_max_sequences,
        csv_path=csv_path,
        depth_scale=args.eval_depth_scale,
        dilations=list(settings.dilations),
        cap_dilation=settings.cap_dilation,
        snippet_lengths=list(settings.snippet_lengths),
        init_infer_steps=list(settings.init_infer_steps),
        strides=list(settings.strides),
        refine_step=settings.refine_step,
        refine_snippet_len=settings.refine_snippet_len,
        refine_start_dilation=settings.refine_start_dilation,
        seed=settings.seed,
        verbose=settings.verbose,
        max_vae_bs=settings.max_vae_bs,
        merge_in_latent=settings.merge_in_latent,
        refine_in_latent=settings.refine_in_latent,
        turbo_refine=settings.turbo_refine,
    )
    logging.info("eval %s means: %s (per-sequence rows in %s)", dataset, means, csv_path)
    print(json.dumps({"dataset": dataset, **means}))


def run_relight(args, settings) -> None:
    from .io.pretrained_relight import load_relight_pipeline

    pipe = load_relight_pipeline(args.checkpoint, dtype=settings.dtype,
                                 snippet_batch=settings.snippet_batch,
                                 quantize=args.quantize)
    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    from .parallel.multihost import shard_work

    fg_videos = shard_work(enumerate_videos(args.input_fg_video))
    bg_videos = enumerate_videos(args.input_bg_video)
    from .pipelines import rollingimg as ri

    prompt_kwargs = {}
    if args.prompt is not None:
        prompt_kwargs["prompt"] = args.prompt
    if args.a_prompt is not None:
        prompt_kwargs["a_prompt"] = args.a_prompt
    if args.n_prompt is not None:
        prompt_kwargs["n_prompt"] = args.n_prompt
    # frame_count=0 on the CLI means "unset": keep the pipeline's 253-frame
    # cap (rollingimg_pipeline.py's hardcoded working length) instead of
    # decoding an entire unbounded background clip into host memory
    frame_kwargs = (
        {"frame_count": settings.frame_count} if settings.frame_count > 0 else {}
    )
    for fg in fg_videos:
        for bg in bg_videos:
            fg, bg = Path(fg), Path(bg)
            out = pipe(
                input_fg_video_path=fg,
                input_bg_video_path=bg,
                start_frame=settings.start_frame,
                # infer settings forwarded like the reference relight CLI
                # (/root/reference/run_video.py:569-574 passes dilations/
                # cap_dilation/snippet_lengths; strides is our implemented
                # extension of the parameter it hardcodes to [1])
                dilations=list(settings.dilations),
                cap_dilation=settings.cap_dilation,
                snippet_lengths=list(settings.snippet_lengths),
                strides=list(settings.strides),
                resample_method=settings.resample_method,
                seed=settings.seed if settings.seed is not None else ri.DEFAULT_SEED,
                init_mode=args.init_mode,
                verbose=settings.verbose,
                max_vae_bs=settings.max_vae_bs,
                # the relight CLI only writes the combined R/G/B video; at
                # the 253-frame production length the decoded snippet buffer
                # is ~3.7 GB of HBM per clip — drop it inside the pipeline
                keep_snippets=False,
                turbo=args.turbo_relight,
                **frame_kwargs,
                **prompt_kwargs,
            )
            combined = np.concatenate([out.R_pred, out.G_pred, out.B_pred], axis=1)
            combined = np.clip(combined * 255, 0, 255).astype(np.uint8)
            combined = combined.transpose(0, 2, 3, 1)
            fps = args.output_fps if args.output_fps > 0 else 30
            # one output per (fg, bg) pair — a bare fg stem would overwrite
            # earlier results when several backgrounds are given
            stem = fg.stem if len(bg_videos) == 1 else f"{fg.stem}_{bg.stem}"
            write_video_from_numpy(combined, output_dir / f"{stem}_rgb.mp4",
                                   fps=fps, verbose=settings.verbose)
    logging.info("Finished. Saved to %s", output_dir)


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    want_platform = os.environ.get("JAX_PLATFORMS")
    if want_platform:
        # honor an explicit JAX_PLATFORMS even when a device plugin re-pins
        # jax_platforms during import (the TPU-tunnel plugin does; the test
        # conftest needs the same override) — this is what lets the CLI run
        # CPU-only when no accelerator is reachable; must happen before the
        # first backend query (resolve_args probes jax.default_backend for
        # its TPU-tuned batch defaults)
        import jax

        jax.config.update("jax_platforms", want_platform)
    # persistent XLA compilation cache: a repeat run of any previously-seen
    # (config, bucket) combination skips its compiles entirely (opt out with
    # ROLLINGDEPTH_XLA_CACHE=0 — utils/compile_cache.py)
    from .utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args, settings = resolve_args(argv)
    logging.info("arguments: %s", settings)
    if args.attn_backend and args.attn_backend != "auto":
        # global override consumed by ops.attention.dot_product_attention
        # (covers the UNet and the VAE mid-block); must be set before the
        # first trace
        os.environ["ROLLINGDEPTH_ATTN"] = args.attn_backend
    if args.eval_dataset:
        run_eval(args, settings)
    elif args.input_fg_video and args.input_bg_video:
        run_relight(args, settings)
    elif args.input_video:
        run_depth(args, settings)
    else:
        raise SystemExit(
            "Provide -i for depth estimation, -fi/-bi for relighting, "
            "or --eval for accuracy evaluation."
        )


def save_snippets_as_video(snippets, output_path, fps: int = 30) -> None:
    """Flatten [S, n, 1, H, W] snippet predictions into one grayscale video
    (reference helper, run_video.py:45-78)."""
    import numpy as np

    arr = np.asarray(snippets, dtype=np.float32)
    flat = arr.reshape(-1, *arr.shape[-2:])  # [(S n), H, W]
    lo, hi = flat.min(), flat.max()
    norm = ((flat - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)
    rgb = np.repeat(norm[..., None], 3, axis=-1)
    write_video_from_numpy(rgb, output_path, fps=fps)
