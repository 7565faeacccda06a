import sys; sys.path.insert(0, "/root/repo")
"""Stage-1 quality push: full-frame crops + more vertex-update volume.

The oracle experiment (PERF.md session 3) showed the stage-1 gap is
entirely +-0.005 surface noise: with vertices projected onto the analytic
surface the SAME pipeline renders 32.5 dB.  The reference gives offsets
30k full-frame updates (main.py iters default, runall_syn stage 1);
the capstone gave them 1k 128^2-crop updates (~1/100 the gradient
volume).  This run: full 256^2 frames (s1_crop=0 default), 2500 iters,
lr_vert 3e-4.
Usage: s1_quality_run.py [iters] [lr_vert]
"""
import glob
import os
import time

iters = sys.argv[1] if len(sys.argv) > 1 else "2500"
lrv = sys.argv[2] if len(sys.argv) > 2 else "3e-4"

# fresh stage-1 state (keep the re-exported mesh_0.ply from the previous
# rerun; drop its stage-1 checkpoints + refined mesh)
for p in (glob.glob("/tmp/ws_full/checkpoints/ngp_stage1_*")
          + glob.glob("/tmp/ws_full/mesh_stage0/*_updated.ply")):
    os.remove(p)
    print("removed", p, flush=True)

from nerf2mesh_tpu.main import main
t0 = time.time()
main(["/tmp/bench_scene", "--workspace", "/tmp/ws_full",
      "--stage", "1", "--bound", "1", "--scale", "0.8", "--dt_gamma", "0",
      "--iters", iters, "--lr_vert", lrv, "--refine",
      "--texture_size", "1024", "--ssaa", "1",
      "--n_eval", "2", "--n_ckpt", "2", "--test_no_video"])
print("S1 QUALITY RUN DONE %.0fs" % (time.time() - t0), flush=True)
