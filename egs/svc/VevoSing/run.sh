#!/bin/bash
# Vevo1.5 / VevoSing recipe (ref models/svc/vevosing + egs/svc AR/FM):
# prosody-FVQ + content-style Coco tokenizers, style-stream AR, FM, Vocos.
# --stage 1 preprocess | 2 train (AR then FM) | 3 zero-shot inference
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="vevosing"; config="$exp_dir/exp_config.json"
src=""; timbre_ref=""; output="result.wav"; task="svc"
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;; --src_audio) src="$2"; shift 2;;
  --timbre_ref) timbre_ref="$2"; shift 2;; --task) task="$2"; shift 2;;
  --output_path) output="$2"; shift 2;; *) echo "unknown $1"; exit 1;; esac; done
if [ "$stage" -eq 1 ]; then
  python -m bins.vocoder.preprocess --config "$config"
fi
if [ "$stage" -eq 2 ]; then
  python -m bins.svc.train --config "$config" --exp_name "${exp_name}_ar" \
    --model_type AutoregressiveTransformer
  python -m bins.svc.train --config "$config" --exp_name "${exp_name}_fm" \
    --model_type FlowMatchingTransformer
fi
if [ "$stage" -eq 3 ]; then
  python -m bins.svc.vevosing_inference --config "$config" --task "$task" \
    --src_audio "$src" --timbre_ref "$timbre_ref" \
    --ar_exp "${exp_name}_ar" --fm_exp "${exp_name}_fm" \
    --output_path "$output"
fi
exit 0
