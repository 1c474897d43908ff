#!/usr/bin/env bash
# Fetch the sample videos into data/ (equivalent of
# /root/reference/script/download_sample_data.sh).
set -euo pipefail

mkdir -p data
url="https://share.phys.ethz.ch/~pf/bingkedata/rollingdepth/samples.tar"
wget -nv "${url}" -O data/samples.tar
tar -xf data/samples.tar -C data
rm data/samples.tar
echo "Sample data ready under data/"
