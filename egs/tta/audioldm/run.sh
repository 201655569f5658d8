#!/bin/bash
# AudioLDM recipe: --stage 1 preprocess | 2 train (needs a stage-1 VAE ckpt)
#                  | 3 text-to-audio inference
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="audioldm"; config="$exp_dir/exp_config.json"
text="a dog barking"; output="audioldm_out.wav"
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;; --text) text="$2"; shift 2;;
  --output) output="$2"; shift 2;; *) echo "unknown $1"; exit 1;; esac; done
[ "$stage" -eq 1 ] && python -m bins.vocoder.preprocess --config "$config"
[ "$stage" -eq 2 ] && python -m bins.tta.train_tta --config "$config" --exp_name "$exp_name"
[ "$stage" -eq 3 ] && python -m bins.tta.inference --config "$config" \
    --exp_name "$exp_name" --text "$text" --output_path "$output"
exit 0
