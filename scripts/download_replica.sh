#!/bin/bash
# Download the Replica SLAM sequences (NICE-SLAM packaging), as in the
# reference's scripts/download_replica.sh.
set -e
mkdir -p datasets
cd datasets
if [ ! -d replica ]; then
  wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip -O Replica.zip
  unzip -q Replica.zip && rm Replica.zip
  mv Replica replica
fi
