#!/bin/bash
# Vevo recipe: train the two stages (AR: content -> content-style tokens;
# FM: content-style tokens -> mel), then zero-shot inference. Tokenizer
# checkpoints come from egs/codec recipes (RepCodec / Coco); random
# tokenizers work for smoke runs.
#   --stage 1  preprocess
#   --stage 2  train FM stage     --stage 3  train AR stage
#   --stage 4  inference (--task timbre|voice|tts)
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="vevo"; config="$exp_dir/exp_config.json"
content_ckpt=""; style_ckpt=""; task="voice"
src=""; timbre_ref=""; text=""; output="vevo_out.wav"
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;;
  --content_ckpt) content_ckpt="$2"; shift 2;;
  --style_ckpt) style_ckpt="$2"; shift 2;;
  --task) task="$2"; shift 2;; --src_audio) src="$2"; shift 2;;
  --timbre_ref) timbre_ref="$2"; shift 2;; --text) text="$2"; shift 2;;
  --output) output="$2"; shift 2;;
  *) echo "unknown $1"; exit 1;; esac; done
[ "$stage" -eq 1 ] && python -m bins.vocoder.preprocess --config "$config"
[ "$stage" -eq 2 ] && python -m bins.vc.train --config "$config" \
  --model_type FlowMatchingTransformer \
  --exp_name "${exp_name}_fm" ${style_ckpt:+--style_ckpt "$style_ckpt"}
[ "$stage" -eq 3 ] && python -m bins.vc.train --config "$config" \
  --model_type AutoregressiveTransformer \
  --exp_name "${exp_name}_ar" \
  ${content_ckpt:+--content_ckpt "$content_ckpt"} \
  ${style_ckpt:+--style_ckpt "$style_ckpt"}
# --ar_exp only for AR-dependent tasks (timbre is FM-only)
ar_flag=""
[ "$task" != "timbre" ] && ar_flag="--ar_exp ${exp_name}_ar"
[ "$stage" -eq 4 ] && python -m bins.vc.inference --config "$config" \
  --task "$task" --fm_exp "${exp_name}_fm" $ar_flag \
  ${src:+--src_audio "$src"} --timbre_ref "$timbre_ref" \
  ${text:+--text "$text"} --output_path "$output" \
  ${content_ckpt:+--content_ckpt "$content_ckpt"} \
  ${style_ckpt:+--style_ckpt "$style_ckpt"}
# --stage 5: HTTP serving with continuous batching (the production
# dispatcher — docs/serving.md); POST /api/synthesize with
# {"src_wav": b64, "prompt_wav": b64}; GET /api/stats for slot metrics.
# Drive load with: python -m bins.loadgen --url http://127.0.0.1:7860 \
#   --mode vevo --qps 1 --n 100
[ "$stage" -eq 5 ] && python -m bins.serve --backend vevo \
  --batcher continuous --prewarm --vevo_mode "$task" --config "$config" \
  --fm_exp "${exp_name}_fm" $ar_flag \
  ${content_ckpt:+--content_ckpt "$content_ckpt"} \
  ${style_ckpt:+--style_ckpt "$style_ckpt"}
exit 0
