#!/bin/bash
# MaskGCT recipe: --stage 1 preprocess (+semantic & acoustic tokenization) |
# 2 train (joint T2S + S2A masked-generative objectives)
# Trained RepCodec / AmphionCodec checkpoints sharpen the token targets:
# pass --semantic_ckpt / --codec_ckpt.
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="maskgct"; config="$exp_dir/exp_config.json"
semantic_ckpt=""; codec_ckpt=""
extra=()
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;;
  --semantic_ckpt) semantic_ckpt="$2"; shift 2;;
  --codec_ckpt) codec_ckpt="$2"; shift 2;;
  *) extra+=("$1"); shift;; esac; done
[ "$stage" -eq 1 ] && python -m bins.tts.preprocess --config "$config" \
  --extract_codes --extract_semantic \
  ${codec_ckpt:+--codec_ckpt "$codec_ckpt"} \
  ${semantic_ckpt:+--semantic_ckpt "$semantic_ckpt"}
[ "$stage" -eq 2 ] && python -m bins.tts.train --config "$config" --exp_name "$exp_name"
[ "$stage" -eq 3 ] && python -m bins.tts.inference --config "$config" --exp_name "$exp_name" "${extra[@]}"
exit 0
