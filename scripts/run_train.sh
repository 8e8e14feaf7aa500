#!/usr/bin/env bash
# Reference-style wrapper (cf. /root/reference/run_train.sh):
#   bash scripts/run_train.sh <dataset voc|coco> <data_root> <work_dir> [extra args...]
set -eu
dataset=${1:?dataset (voc|coco)}; data_root=${2:?data root}; work_dir=${3:?work dir}
shift 3
exec python -m excel_tpu.cli.train --dataset "$dataset" --data-root "$data_root" \
    --clip-params assets/clip_vit_b16.npz --work-dir "$work_dir" --fast "$@"
