#!/bin/bash
# Outdoor SDF mode with dense depth supervision (parity: reference
# runall_sdf_* configs: --sdf, dense depth, lambda_normal 1e-1)
set -e
DATA_ROOT=${DATA_ROOT:-data/360_v2}
for scene in garden bicycle stump; do
  for stage in 0 1; do
    python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --sdf \
      --data_format colmap --workspace "trial_sdf_$scene" \
      --bound 16 --scale 0.2 --downscale 4 \
      --enable_cam_center --enable_cam_near_far --enable_dense_depth \
      --lambda_entropy 1e-3 --lambda_normal 1e-1 --stage $stage \
      $( [ $stage = 1 ] && echo --iters 10000 )
  done
done
