#!/bin/bash
# LLFF forward-facing colmap captures (parity: reference runall_llff.sh:
# bound 4, downscale 4, colmap format, no cam-center)
set -e
DATA_ROOT=${DATA_ROOT:-data/nerf_llff_data}
for scene in fern flower fortress horns leaves orchids room trex; do
  python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --data_format colmap \
    --workspace "trial_llff_$scene" --bound 4 --downscale 4 \
    --enable_cam_near_far --stage 0
  python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --data_format colmap \
    --workspace "trial_llff_$scene" --bound 4 --downscale 4 \
    --enable_cam_near_far --stage 1 --iters 10000
done
