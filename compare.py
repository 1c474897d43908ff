#!/usr/bin/env python
"""Side-by-side video comparison tool.

Behavioral reference: /root/reference/compare.py (4-way resize+hstack
compositor, :5-67) and compare2.py (2-way aspect-keeping variant, :5-55).
This generalizes both: N input videos, each resized to the common minimum
frame size (optionally aspect-preserving with letterboxing), horizontally
stacked at the minimum fps.

Usage: python compare.py out.mp4 a.mp4 b.mp4 [c.mp4 ...] [--keep-aspect]
"""

import argparse
import sys

import cv2
import numpy as np


def compare_videos(output_path, video_paths, keep_aspect=False):
    caps = [cv2.VideoCapture(p) for p in video_paths]
    for p, c in zip(video_paths, caps):
        if not c.isOpened():
            raise SystemExit(f"Cannot open {p}")
    heights = [int(c.get(cv2.CAP_PROP_FRAME_HEIGHT)) for c in caps]
    widths = [int(c.get(cv2.CAP_PROP_FRAME_WIDTH)) for c in caps]
    fpss = [c.get(cv2.CAP_PROP_FPS) or 30 for c in caps]
    min_h, min_w = min(heights), min(widths)
    out_fps = min(fpss)

    writer = None
    for fourcc in ("avc1", "mp4v", "MJPG"):
        writer = cv2.VideoWriter(
            output_path, cv2.VideoWriter_fourcc(*fourcc), out_fps,
            (min_w * len(caps), min_h),
        )
        if writer.isOpened():
            break
        writer.release()
        writer = None
    if writer is None:
        raise SystemExit("No working codec")

    n = 0
    while True:
        frames = []
        ok = True
        for c in caps:
            ret, f = c.read()
            if not ret:
                ok = False
                break
            frames.append(f)
        if not ok:
            break
        tiles = []
        for f in frames:
            if keep_aspect:
                # letterbox into (min_h, min_w) preserving aspect (compare2.py)
                h, w = f.shape[:2]
                scale = min(min_w / w, min_h / h)
                nw, nh = int(w * scale), int(h * scale)
                resized = cv2.resize(f, (nw, nh))
                canvas = np.zeros((min_h, min_w, 3), np.uint8)
                y0, x0 = (min_h - nh) // 2, (min_w - nw) // 2
                canvas[y0 : y0 + nh, x0 : x0 + nw] = resized
                tiles.append(canvas)
            else:
                tiles.append(cv2.resize(f, (min_w, min_h)))
        writer.write(np.hstack(tiles))
        n += 1

    for c in caps:
        c.release()
    writer.release()
    print(f"wrote {n} frames to {output_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output")
    parser.add_argument("videos", nargs="+")
    parser.add_argument("--keep-aspect", action="store_true")
    args = parser.parse_args()
    if len(args.videos) < 2:
        raise SystemExit("need at least two input videos")
    compare_videos(args.output, args.videos, args.keep_aspect)
