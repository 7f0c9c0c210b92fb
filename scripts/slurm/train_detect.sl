#!/bin/bash
# Slurm launcher template: SSD DCT detection training on a TPU slice.
# Role of the reference's `localisation_part/script.sl` (P100, 48h walls with
# explicit --restart lines); here restart-from-latest is automatic.
#SBATCH --job-name=ssd_dct_train
#SBATCH --time=48:00:00
#SBATCH --output=%x_%j.out

set -euo pipefail

: "${VOC_ROOTS:?set VOC_ROOTS, e.g. '/data/VOC2007 /data/VOC2012'}"
: "${EXPERIMENTS_OUTPUT_DIRECTORY:=experiments}"

# Multi-host TPU: each host process launches the same command;
# jax.distributed picks up the topology from the TPU runtime.
python -m jpeg_detection_resnet_ssd_tpu.cli train-detect \
  --voc-root ${VOC_ROOTS} \
  --archi "${ARCHI:-ssd_custom}" \
  --output-dir "${EXPERIMENTS_OUTPUT_DIRECTORY}" \
  ${PRETRAINED_H5:+--pretrained-weights "$PRETRAINED_H5"} \
  ${RESTART:+--restart}
