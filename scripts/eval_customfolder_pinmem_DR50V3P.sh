#!/usr/bin/env bash
# qualitative inference on a folder of frames (reference:
# eval_custumfolder_pinmem_DR50V3P.sh); usage: $0 <folder> [extra flags]
set -o nounset
cd "$(dirname "$0")/.."
VIDEO_PATH="$1"; shift
python -m pinthememory_tpu.evalx.cli \
  --video_folder "${VIDEO_PATH}" --inference_mode sliding --scales 1.5 \
  --crop_size 640 --sliding_overlap 0.5 --memory --arch DeepR50V3PlusD \
  --snapshot "${SNAPSHOT:-pretrained_models/pinmem_GSI_DR50V3P.pth}" "$@"
