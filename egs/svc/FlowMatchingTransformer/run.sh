#!/bin/bash
# FlowMatchingTransformer (svc) recipe (ref egs/svc/FlowMatchingTransformer): the per-stage trainer behind
# Vevo1.5/VevoSing. --stage 1 preprocess | 2 train
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export WORK_DIR=$work_dir PYTHONPATH=$work_dir
cd "$work_dir"
stage=1; exp_name="svc_fm"; config="$exp_dir/exp_config.json"
while [[ $# -gt 0 ]]; do case $1 in
  --stage) stage="$2"; shift 2;; --exp_name) exp_name="$2"; shift 2;;
  --config) config="$2"; shift 2;; *) echo "unknown $1"; exit 1;; esac; done
[ "$stage" -eq 1 ] && python -m bins.vocoder.preprocess --config "$config"
[ "$stage" -eq 2 ] && python -m bins.svc.train --config "$config" --exp_name "$exp_name"
exit 0
