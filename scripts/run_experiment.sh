#!/bin/bash
# Repeat an eval run N times and archive results into saved_runs/<ts>_<name>
# (mirrors the reference's scripts/run_experiment.sh:1-46).
set -e
CONFIG=${1:?usage: run_experiment.sh <config.yaml> <name> [n_runs]}
NAME=${2:?usage: run_experiment.sh <config.yaml> <name> [n_runs]}
N=${3:-5}
TS=$(date +%Y%m%d_%H%M%S)
OUT="saved_runs/${TS}_${NAME}"
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== run $i/$N ==="
  python slam.py --config "$CONFIG" --eval 2>&1 | tee "$OUT/run_$i.log"
  # harvest the newest results dir
  LATEST=$(ls -dt results/*/* 2>/dev/null | head -1)
  if [ -n "$LATEST" ]; then
    cp -r "$LATEST" "$OUT/run_$i"
  fi
done
python processing/plot_ate.py "$OUT" "$OUT/ate_fps.png" || true
echo "archived to $OUT"
