#!/bin/bash
# SingVisio-style diffusion-step explorer (reference egs/visualization/).
# 1) dump step artifacts during sampling with
#    amphion_tpu.visualization.singvisio.dump_diffusion_steps(...)
# 2) serve the explorer over the artifact directory:
set -e
exp_dir=$(cd "$(dirname "$0")" && pwd)
work_dir=$(cd "$exp_dir/../../../" && pwd)
export PYTHONPATH=$work_dir
cd "$work_dir"
artifact_dir="${1:-output/singvisio}"
python -c "from amphion_tpu.visualization.singvisio import serve; serve('$artifact_dir')"
