#!/bin/bash
# Download EuRoC MAV sequences (mirrors scripts/download_euroc.sh).
set -e
mkdir -p datasets/euroc
cd datasets/euroc
if [ ! -d mh02 ]; then
  wget http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_02_easy/MH_02_easy.zip
  mkdir -p mh02 && unzip -q MH_02_easy.zip -d mh02 && rm MH_02_easy.zip
fi
