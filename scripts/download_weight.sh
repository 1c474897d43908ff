#!/usr/bin/env bash
# Fetch the RollingDepth checkpoint into checkpoint/ (diffusers layout).
# Behavioral equivalent of /root/reference/script/download_weight.sh:10-19
# (ETH research-share tarball), preferring the HF hub when available.
set -euo pipefail

ckpt_dir="checkpoint"
mkdir -p "${ckpt_dir}"

if command -v huggingface-cli >/dev/null 2>&1; then
    huggingface-cli download prs-eth/rollingdepth-v1-0 \
        --local-dir "${ckpt_dir}/rollingdepth-v1-0"
else
    url="https://share.phys.ethz.ch/~pf/bingkedata/rollingdepth/rollingdepth-v1-0.tar"
    echo "Downloading ${url}"
    wget -nv "${url}" -O "${ckpt_dir}/rollingdepth-v1-0.tar"
    tar -xf "${ckpt_dir}/rollingdepth-v1-0.tar" -C "${ckpt_dir}"
    rm "${ckpt_dir}/rollingdepth-v1-0.tar"
fi
echo "Checkpoint ready under ${ckpt_dir}/rollingdepth-v1-0"
