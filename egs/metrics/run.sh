#!/bin/bash
# Objective metrics recipe (reference egs/metrics/run.sh): paired ref/gen dirs
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
ref_dir=""; deg_dir=""; metrics="mcd mstft si_sdr stoi fpc f0rmse"; fs=24000; dump=""
while [[ $# -gt 0 ]]; do case $1 in
  --reference_folder) ref_dir="$2"; shift 2;;
  --generated_folder) deg_dir="$2"; shift 2;;
  --metrics) metrics="$2"; shift 2;;
  --fs) fs="$2"; shift 2;;
  --dump_folder) dump="$2"; shift 2;;
  *) echo "unknown $1"; exit 1;; esac; done
python -m bins.calc_metrics --ref_dir "$ref_dir" --deg_dir "$deg_dir" \
  --metrics $metrics --fs "$fs" ${dump:+--dump_dir "$dump"}
