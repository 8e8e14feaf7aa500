#!/usr/bin/env bash
# Reference-style wrapper (cf. /root/reference/infer_seg_coco.sh):
#   bash scripts/infer_seg_coco.sh <data_root> <work_dir> <head.npz> [extra...]
set -eu
data_root=${1:?data root}; work_dir=${2:?work dir}; head=${3:?head npz}
shift 3
exec python -m excel_tpu.cli.infer_seg --dataset coco --data-root "$data_root" \
    --clip-params assets/clip_vit_b16.npz --work-dir "$work_dir" --head "$head" --fast "$@"
