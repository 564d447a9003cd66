#!/bin/bash
# Download the TUM RGB-D benchmark sequences used by the configs
# (mirrors the reference's scripts/download_tum.sh).
set -e
mkdir -p datasets/tum
cd datasets/tum
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz \
           rgbd_dataset_freiburg3_long_office_household; do
  if [ ! -d "$seq" ]; then
    wget "https://cvg.cit.tum.de/rgbd/dataset/${seq%%_*}/$seq.tgz" -O "$seq.tgz" ||
    wget "https://vision.in.tum.de/rgbd/dataset/$( [[ $seq == *freiburg1* ]] && echo freiburg1 || ( [[ $seq == *freiburg2* ]] && echo freiburg2 || echo freiburg3 ))/$seq.tgz" -O "$seq.tgz"
    tar -xzf "$seq.tgz" && rm "$seq.tgz"
  fi
done
