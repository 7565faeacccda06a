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
