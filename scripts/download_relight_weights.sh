#!/usr/bin/env bash
# Fetch the relighting-stack weights (RealisticVision SD1.5, IC-Light fbc
# offset, RMBG-1.4) — the checkpoints the reference loads at
# rollingimg_pipeline.py:84-89 and :1077-1087.
set -euo pipefail

mkdir -p models
if command -v huggingface-cli >/dev/null 2>&1; then
    huggingface-cli download stablediffusionapi/realistic-vision-v51 \
        --local-dir models/stablediffusionapi-realistic-vision-v51
    huggingface-cli download briaai/RMBG-1.4 --local-dir models/RMBG-1.4
fi
wget -nv "https://huggingface.co/lllyasviel/ic-light/resolve/main/iclight_sd15_fbc.safetensors" \
    -O models/iclight_sd15_fbc.safetensors
echo "Relight weights ready under models/"
