#!/bin/bash
# Mip-NeRF-360 unbounded scenes (parity: reference runall_360*.sh:
# indoor bound 8 scale 0.3, outdoor bound 16 scale 0.2, cam-center + near/far,
# entropy + TV regularization, downscale 4)
set -e
DATA_ROOT=${DATA_ROOT:-data/360_v2}
INDOOR="room counter kitchen bonsai"
OUTDOOR="garden bicycle stump"
for scene in $INDOOR; do
  for stage in 0 1; do
    python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --data_format colmap \
      --workspace "trial_360_$scene" --bound 8 --scale 0.3 --downscale 4 \
      --enable_cam_center --enable_cam_near_far \
      --lambda_entropy 1e-3 --lambda_tv 2e-8 --stage $stage \
      $( [ $stage = 1 ] && echo --iters 10000 )
  done
done
for scene in $OUTDOOR; do
  for stage in 0 1; do
    python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --data_format colmap \
      --workspace "trial_360_$scene" --bound 16 --scale 0.2 --downscale 4 \
      --enable_cam_center --enable_cam_near_far \
      --lambda_entropy 1e-3 --lambda_tv 2e-8 --stage $stage \
      $( [ $stage = 1 ] && echo --iters 10000 )
  done
done
