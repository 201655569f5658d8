#!/bin/bash
# TFR-enhanced HiFi-GAN (MS-SB-CQT discriminator; ref egs/vocoder/gan/tfr_enhanced_hifigan): --stage 1 preprocess | 2 train | 3 inference
# (same user surface as the reference's egs/vocoder/gan/*/run.sh)
set -e

exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../../" && pwd)
export WORK_DIR=$work_dir
export PYTHONPATH=$work_dir
cd "$work_dir"

stage=1
exp_name="tfr_hifigan"
config="$exp_dir/exp_config.json"
output_dir="$work_dir/output/$exp_name"
resume=""

while [[ $# -gt 0 ]]; do
  case $1 in
    --stage) stage="$2"; shift 2 ;;
    --exp_name) exp_name="$2"; shift 2 ;;
    --config) config="$2"; shift 2 ;;
    --output_dir) output_dir="$2"; shift 2 ;;
    --resume) resume="--resume"; shift ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

if [ "$stage" -eq 1 ]; then
  python -m bins.vocoder.preprocess --config "$config"
fi

if [ "$stage" -eq 2 ]; then
  python -m bins.vocoder.train --config "$config" --exp_name "$exp_name" $resume
fi

if [ "$stage" -eq 3 ]; then
  python -m bins.vocoder.inference --config "$config" --exp_name "$exp_name" \
    --output_dir "$output_dir"
fi
