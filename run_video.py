#!/usr/bin/env python
"""CLI entrypoint — preset-compatible with the reference run_video.py.

Depth:    python run_video.py -i video.mp4 -o output/ -p fast
Relight:  python run_video.py -fi fg.mp4 -bi bg.mp4 -o output/ -p fast
"""

from rollingdepth_tpu.cli import main

if __name__ == "__main__":
    main()
