#!/bin/bash
# FACodec recipe: --stage 1 preprocess | 2 train | 3 inference
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="facodec"; config="$exp_dir/exp_config.json"
extra=()
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;; *) extra+=("$1"); shift;; esac; done
[ "$stage" -eq 1 ] && python -m bins.vocoder.preprocess --config "$config"
[ "$stage" -eq 2 ] && python -m bins.codec.train --config "$config" --exp_name "$exp_name"
[ "$stage" -eq 3 ] && python -m bins.codec.inference --config "$config" "${extra[@]}"
exit 0
