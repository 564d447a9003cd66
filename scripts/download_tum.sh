#!/bin/bash
# Download the TUM RGB-D benchmark sequences used by the configs
# (mirrors the reference's scripts/download_tum.sh).
set -e
mkdir -p datasets/tum
cd datasets/tum
for seq in rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg2_xyz \
           rgbd_dataset_freiburg3_long_office_household; do
  if [ ! -d "$seq" ]; then
    case "$seq" in
      *freiburg1*) fam=freiburg1 ;;
      *freiburg2*) fam=freiburg2 ;;
      *) fam=freiburg3 ;;
    esac
    wget "https://cvg.cit.tum.de/rgbd/dataset/$fam/$seq.tgz" -O "$seq.tgz" ||
      wget "https://vision.in.tum.de/rgbd/dataset/$fam/$seq.tgz" -O "$seq.tgz"
    tar -xzf "$seq.tgz" && rm "$seq.tgz"
  fi
done
