"""nerf2mesh-tpu: TPU-native (JAX/XLA/Pallas) rebuild of ashawkey/nerf2mesh.

Two-stage pipeline:
  stage 0 — instant-NGP hash-grid NeRF (or NeuS SDF) with occupancy-grid
            accelerated volumetric rendering; coarse mesh extraction via
            marching cubes + cleaning + decimation + visibility culling.
  stage 1 — differentiable-rasterization refinement of the coarse mesh
            (vertex offsets + adaptive subdivision/decimation) and export of
            OBJ + baked textures + view-dependent MLP for the web renderer.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: step-sized compiles cost 45-110 s on the
# axon TPU backend (measured, PERF.md round-2 session 3), and every process
# (bench, capstone runs, ablations) repeats them.  The cache survives across
# processes; set NERF2MESH_NO_COMPILE_CACHE=1 to disable.
import os as _os

if _os.environ.get("NERF2MESH_NO_COMPILE_CACHE", "0") != "1":
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/nerf2mesh_jaxcache")
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
