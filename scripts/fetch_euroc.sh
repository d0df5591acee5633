#!/usr/bin/env bash
# Fetch EuRoC MAV machine-hall sequences (ASL format) for the canonical
# COVINS workloads (docs/run_COVINS.md:47-49 of the reference; 3-agent =
# MH_01..MH_03, 5-agent = MH_01..MH_05).
#
# Usage:  scripts/fetch_euroc.sh [DEST_DIR] [SEQ...]
#   DEST_DIR defaults to ./datasets/euroc
#   SEQ defaults to MH_01 MH_02 MH_03 MH_04 MH_05
#
# Requires network access (not available in the CI container — run on a
# workstation, then point COVINS_EUROC_DIR / scripts/run_euroc.py at
# DEST_DIR/<seq>/mav0).
set -euo pipefail

DEST="${1:-datasets/euroc}"
shift || true
SEQS=("$@")
if [ ${#SEQS[@]} -eq 0 ]; then
  SEQS=(MH_01 MH_02 MH_03 MH_04 MH_05)
fi

BASE="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall"
declare -A FULL=(
  [MH_01]=MH_01_easy [MH_02]=MH_02_easy [MH_03]=MH_03_medium
  [MH_04]=MH_04_difficult [MH_05]=MH_05_difficult
)

mkdir -p "$DEST"
for s in "${SEQS[@]}"; do
  full="${FULL[$s]:-$s}"
  out="$DEST/$full"
  if [ -d "$out/mav0" ]; then
    echo "[fetch_euroc] $full already present, skipping"
    continue
  fi
  echo "[fetch_euroc] downloading $full ..."
  mkdir -p "$out"
  curl -L --fail "$BASE/$full/$full.zip" -o "$out/$full.zip"
  unzip -q "$out/$full.zip" -d "$out"
  rm -f "$out/$full.zip"
  echo "[fetch_euroc] $full -> $out/mav0"
done
echo "[fetch_euroc] done."
