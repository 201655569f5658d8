#!/bin/bash
# DualCodec TTS recipe: --stage 1 preprocess (dualcodec code extraction via
# bins/codec/inference with a trained DualCodec ckpt) | 2 train (set
# model.dualcodec_tts.mode to ar|nar|voicebox; train each stage once)
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="dualcodec_tts"; config="$exp_dir/exp_config.json"
extra=()
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;;
  *) extra+=("$1"); shift;; esac; done
[ "$stage" -eq 1 ] && python -m bins.tts.preprocess --config "$config"
[ "$stage" -eq 2 ] && python -m bins.tts.train --config "$config" --exp_name "$exp_name"
[ "$stage" -eq 3 ] && python -m bins.tts.inference --config "$config" --exp_name "$exp_name" "${extra[@]}"
exit 0
