"""Interactive viewer — browser-based analog of the reference GUI
(nerf/gui.py NeRFGUI).

The reference uses DearPyGui with an orbit camera, a 200 ms/frame render
budget met by dynamic resolution scaling, and live-adjustable render options
(gui.py:106-163, 329-366).  This serves the same interaction over HTTP with a
zero-dependency frontend: drag to orbit, wheel to zoom; the server renders
frames with the current checkpoint (stage 0 volumetric or stage 1 raster) and
halves/raises resolution to hit the latency budget.

Usage:
    python -m nerf2mesh_tpu.viewer <data_or_workspace_args like main.py>
then open http://localhost:7007/.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>nerf2mesh-tpu live viewer</title>
<style>body{margin:0;background:#111;color:#ccc;font-family:monospace}
#img{width:100vw;height:100vh;object-fit:contain;image-rendering:pixelated}
#hud{position:fixed;top:8px;left:8px}</style></head>
<body><div id="hud">drag orbit / wheel zoom<br/><span id="train"></span><br/>
dt_gamma <input id="dtg" type="range" min="0" max="0.1" step="0.005" value="0" style="width:90px"/>
<span id="dtgv">0</span><br/>
max_steps <input id="mst" type="range" min="4" max="10" step="1" value="10" style="width:90px"/>
<span id="mstv">1024</span><br/>
bound <input id="bnd" type="range" min="0.1" max="1" step="0.05" value="1" style="width:90px"/>
<span id="bndv">1.0</span></div>
<img id="img"/>
<script>
for(const [id, vid, f] of [["dtg","dtgv",v=>v],["mst","mstv",v=>1<<v],["bnd","bndv",v=>v]]){
  const el=document.getElementById(id);
  el.addEventListener('change',async()=>{
    const v=f(parseFloat(el.value));
    document.getElementById(vid).textContent=v;
    await fetch(`/option?${id}=${v}`); refresh();
  });
}
let theta=1.2, phi=0.5, radius=2.5, busy=false, pending=false;
const img=document.getElementById('img'), hud=document.getElementById('hud');
async function refresh(){
  if(busy){pending=true;return} busy=true;
  const t0=performance.now();
  const r=await fetch(`/render?theta=${theta}&phi=${phi}&radius=${radius}`);
  const blob=await r.blob();
  img.src=URL.createObjectURL(blob);
  hud.textContent=`theta=${theta.toFixed(2)} phi=${phi.toFixed(2)} r=${radius.toFixed(2)} ${(performance.now()-t0).toFixed(0)}ms`;
  busy=false; if(pending){pending=false;refresh();}
}
let drag=false,px=0,py=0;
addEventListener('pointerdown',e=>{drag=true;px=e.clientX;py=e.clientY});
addEventListener('pointerup',()=>drag=false);
addEventListener('pointermove',e=>{if(!drag)return;
  phi-=(e.clientX-px)*0.01;
  theta=Math.min(3.1,Math.max(0.05,theta-(e.clientY-py)*0.01));
  px=e.clientX;py=e.clientY;refresh();});
addEventListener('wheel',e=>{radius*=Math.exp(e.deltaY*0.001);refresh();});
refresh();
setInterval(async()=>{
  const s=await(await fetch('/status')).json();
  if(s.step!==undefined){
    document.getElementById('train').textContent=
      `train ${s.step}/${s.iters} loss=${s.loss.toExponential(2)} `+
      `psnr=${s.psnr.toFixed(1)} ${s.steps_per_sec.toFixed(1)} it/s`+
      (s.done?' [done]':'');
    if(!s.done) refresh();
  }
},2000);
</script></body></html>"""


class ViewerServer:
    def __init__(self, trainer, dataset, port: int = 7007,
                 budget_ms: float = 500.0, train_dataset=None):
        self.trainer = trainer
        self.dataset = dataset
        self.port = port
        self.budget_ms = budget_ms
        self.downscale = 4            # dynamic, like gui.py:158-163
        self._compiled_shapes = set()  # (stage, H, W) already jit-compiled
        self.lock = threading.Lock()
        self.train_dataset = train_dataset
        self.train_status = {}
        self._stop = False
        if train_dataset is not None:
            threading.Thread(target=self._train_loop, daemon=True).start()

    def _train_loop(self):
        """Background training interleaved with rendering (the reference GUI
        runs 16 train steps per frame when train mode is on, gui.py:106-128);
        the render lock arbitrates access to the model state."""
        t = self.trainer
        while not self._stop and int(t.state.step) < t.cfg.iters:
            t0 = time.time()
            with self.lock:
                m = t.train_steps(self.train_dataset, 16)
            self.train_status = {
                "step": int(t.state.step),
                "iters": int(t.cfg.iters),
                "loss": float(m["loss"]),
                "psnr": float(m["psnr"]),
                "steps_per_sec": 16.0 / max(time.time() - t0, 1e-6),
            }
            time.sleep(0.005)         # let pending render requests in
        with self.lock:
            t.save_checkpoint()
        self.train_status = dict(self.train_status, done=True)

    def set_option(self, q):
        import dataclasses
        t = self.trainer
        with self.lock:
            if "dtg" in q:
                t.render_spec = dataclasses.replace(
                    t.render_spec, dt_gamma=float(q["dtg"][0]))
            if "mst" in q:
                t.render_spec = dataclasses.replace(
                    t.render_spec, max_steps=int(float(q["mst"][0])))
            if "bnd" in q:
                b = t.cfg.bound * float(q["bnd"][0])
                t._aabb = np.array([-b] * 3 + [b] * 3, np.float32)

    def render_frame(self, theta: float, phi: float, radius: float) -> bytes:
        from PIL import Image

        from .data.rays import make_mvps, make_projection, orbit_pose
        ds = self.dataset
        scale = self.downscale
        H = max(ds.H // scale, 32)
        W = max(ds.W // scale, 32)
        intr = ds.intrinsics_for(0) / scale
        pose = orbit_pose(theta, phi, radius)
        t0 = time.time()
        with self.lock:
            if self.trainer.cfg.stage > 0:
                proj = make_projection(H, W, float(intr[1]),
                                       self.trainer.cfg.min_near)
                mvp = make_mvps(proj, pose[None])[0]
                out = self.trainer.render_image_stage1(pose, mvp, intr, H, W)
            else:
                # interactive preview: 1-corner fine-level encoder estimate
                # (8x less random-row traffic; unbiased); metric evals and
                # exports keep the exact path
                out = self.trainer.render_image(pose, intr, H, W,
                                                stochastic=True)
        dt_ms = (time.time() - t0) * 1000
        # dynamic resolution against the frame budget (gui.py:158-163).
        # The first frame at a new (stage, H, W) pays jit compilation —
        # excluding it keeps the controller from halving resolution on a
        # one-off compile stall.
        shape_key = (self.trainer.cfg.stage, H, W)
        if shape_key not in self._compiled_shapes:
            self._compiled_shapes.add(shape_key)
        elif dt_ms > self.budget_ms and self.downscale < 16:
            self.downscale *= 2
        elif dt_ms < self.budget_ms / 4 and self.downscale > 1:
            self.downscale //= 2
        img = (np.clip(out["image"], 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        return buf.getvalue()

    def serve(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                elif u.path == "/render":
                    q = parse_qs(u.query)
                    body = viewer.render_frame(
                        float(q.get("theta", [1.2])[0]),
                        float(q.get("phi", [0.5])[0]),
                        float(q.get("radius", [2.5])[0]))
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                elif u.path == "/option":
                    # live render-option mutation (reference gui.py:329-366
                    # sliders: dt_gamma, max_steps, aabb/bound scale)
                    q = parse_qs(u.query)
                    viewer.set_option(q)
                    body = b"{}"
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                elif u.path == "/status":
                    body = json.dumps(viewer.train_status).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                else:
                    self.send_response(404)
                    body = b""
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        print(f"[viewer] http://localhost:{self.port}/")
        srv.serve_forever()


def main(argv=None):
    from .config import parse_args
    from .utils.trainer import Trainer

    cfg = parse_args(argv)
    if cfg.data_format == "colmap":
        from .data.colmap import load_colmap_dataset as load_dataset
    elif cfg.data_format == "dtu":
        from .data.dtu import load_dtu_dataset as load_dataset
    else:
        from .data.provider import load_nerf_dataset as load_dataset

    ds = load_dataset(cfg, split="val")
    trainer = Trainer(cfg)
    if not trainer.load_checkpoint():
        print("[viewer] WARNING: no checkpoint found; rendering untrained model")
    if cfg.stage > 0:
        trainer.setup_stage1(ds)
    train_ds = None
    if cfg.viewer_train:
        if cfg.stage > 0:
            print("[viewer] WARNING: --viewer_train supports stage 0 only")
        else:
            train_ds = load_dataset(cfg, split="train")
            if cfg.mark_untrained:
                trainer.mark_untrained(train_ds)
    ViewerServer(trainer, ds, train_dataset=train_ds).serve()


if __name__ == "__main__":
    main()
