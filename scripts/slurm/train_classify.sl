#!/bin/bash
# Slurm launcher template: ImageNet DCT classification on a TPU slice.
# Role of the reference's `classification_part/vgg_jpeg.sl` (4 nodes x 4 K80
# under Horovod/MPI); under JAX one process per host joins a single mesh, the
# lr linear-scaling + warmup recipe is applied automatically from replica
# count (train.schedules.warmup_linear_scaling).
#SBATCH --job-name=dct_classify
#SBATCH --time=48:00:00
#SBATCH --output=%x_%j.out

set -euo pipefail

: "${DATASET_PATH_TRAIN:?set DATASET_PATH_TRAIN}"
: "${EXPERIMENTS_OUTPUT_DIRECTORY:=experiments}"

srun python -m jpeg_detection_resnet_ssd_tpu.cli train-classify \
  --train-dir "${DATASET_PATH_TRAIN}" \
  --archi "${ARCHI:-late_concat_rfa_thinner}" \
  --output-dir "${EXPERIMENTS_OUTPUT_DIRECTORY}" \
  ${CLASS_INDEX_JSON:+--class-index-json "$CLASS_INDEX_JSON"} \
  ${RESTART:+--restart}
