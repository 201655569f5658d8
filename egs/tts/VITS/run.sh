#!/bin/bash
# VITS end-to-end TTS recipe: --stage 1 preprocess | 2 train | 3 inference
set -e

exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir
export PYTHONPATH=$work_dir
cd "$work_dir"

stage=1
exp_name="vits"
config="$exp_dir/exp_config.json"
text="Hello world."
output_path="$work_dir/output/vits/out.wav"
resume=""

while [[ $# -gt 0 ]]; do
  case $1 in
    --stage) stage="$2"; shift 2 ;;
    --exp_name) exp_name="$2"; shift 2 ;;
    --config) config="$2"; shift 2 ;;
    --text) text="$2"; shift 2 ;;
    --output_path) output_path="$2"; shift 2 ;;
    --resume) resume="--resume"; shift ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

if [ "$stage" -eq 1 ]; then
  python -m bins.tts.preprocess --config "$config"
fi
if [ "$stage" -eq 2 ]; then
  python -m bins.tts.train --config "$config" --exp_name "$exp_name" $resume
fi
if [ "$stage" -eq 3 ]; then
  python -m bins.tts.inference --config "$config" --exp_name "$exp_name" \
    --text "$text" --output_path "$output_path"
fi
