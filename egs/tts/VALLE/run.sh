#!/bin/bash
# VALL-E recipe: --stage 1 preprocess+tokenize | 2 train | 3 zero-shot infer
# A trained AmphionCodec checkpoint (egs/codec/amphion_codec) provides the
# audio tokens; pass it via --codec_ckpt.
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="valle"; config="$exp_dir/exp_config.json"; codec_ckpt=""
prompt_audio=""; prompt_text=""; text=""; output="valle_out.wav"
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;; --codec_ckpt) codec_ckpt="$2"; shift 2;;
  --prompt_audio) prompt_audio="$2"; shift 2;;
  --prompt_text) prompt_text="$2"; shift 2;;
  --text) text="$2"; shift 2;; --output) output="$2"; shift 2;;
  *) echo "unknown $1"; exit 1;; esac; done
[ "$stage" -eq 1 ] && python -m bins.tts.preprocess --config "$config" \
  --extract_codes ${codec_ckpt:+--codec_ckpt "$codec_ckpt"}
[ "$stage" -eq 2 ] && python -m bins.tts.train --config "$config" --exp_name "$exp_name"
[ "$stage" -eq 3 ] && python -m bins.tts.inference --config "$config" \
  --exp_name "$exp_name" --prompt_audio "$prompt_audio" \
  --prompt_text "$prompt_text" --text "$text" --output_path "$output" \
  ${codec_ckpt:+--codec_ckpt "$codec_ckpt"}
exit 0
