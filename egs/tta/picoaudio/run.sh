#!/bin/bash
# PicoAudio recipe (temporally controllable TTA,
# ref models/tta/picoaudio): --stage 1 preprocess | 2 train (needs a
# stage-1 AutoencoderKL ckpt) | 3 timestamp-controlled inference
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="picoaudio"; config="$exp_dir/exp_config.json"
onset="dog__1.0-2.0_3.0-4.0--cat__5.0-6.0"; output="picoaudio_out.wav"
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;; --onset_str) onset="$2"; shift 2;;
  --output) output="$2"; shift 2;; *) echo "unknown $1"; exit 1;; esac; done
[ "$stage" -eq 1 ] && python -m bins.vocoder.preprocess --config "$config"
[ "$stage" -eq 2 ] && python -m bins.tta.train_tta --config "$config" --exp_name "$exp_name"
[ "$stage" -eq 3 ] && python -m bins.tta.inference --config "$config" \
    --exp_name "$exp_name" --onset_str "$onset" --output_path "$output"
exit 0
