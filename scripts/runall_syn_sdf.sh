#!/bin/bash
# nerf-synthetic suite, NeuS-SDF mode (parity: reference runall_syn_sdf.sh)
set -e
DATA_ROOT=${DATA_ROOT:-data/nerf_synthetic}
for scene in lego chair drums ficus hotdog materials mic ship; do
  python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --sdf \
    --workspace "trial_syn_sdf_$scene" --bound 1 --scale 0.8 --dt_gamma 0 --stage 0
  python -m nerf2mesh_tpu.main "$DATA_ROOT/$scene" -O --sdf \
    --workspace "trial_syn_sdf_$scene" --bound 1 --scale 0.8 --dt_gamma 0 --stage 1
done
