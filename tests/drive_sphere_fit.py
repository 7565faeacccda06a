"""End-to-end library drive: fit an analytic red-sphere scene through the
public stage-0 pipeline (rays -> sampling -> fields -> compositing -> Adam).

Run: PYTHONPATH=/root/repo python tests/drive_sphere_fit.py
Expect: loss ~0.18 -> <1e-4 within ~200 steps; PSNR > 40 dB; center pixel
converges to ~[1.0, 0.2, 0.1]; corners stay white.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", os.environ.get("DRIVE_PLATFORM", "cpu"))
import jax.numpy as jnp
import numpy as np
import optax

from nerf2mesh_tpu.data.rays import get_rays, orbit_pose
from nerf2mesh_tpu.models.network import NetworkSpec, init_network
from nerf2mesh_tpu.models.renderer import RenderSpec, render_train
from nerf2mesh_tpu.ops.sampling import near_far_from_aabb

H = W = 24
pose = orbit_pose(np.pi / 2.2, 0.3, 2.5)[None]
fl = W / (2 * np.tan(0.3))
rays = get_rays(jnp.asarray(pose), (fl, fl, W / 2, H / 2), H, W)
ro, rd = rays["rays_o"], rays["rays_d"]

GS = 32
occ = jnp.ones((1, GS, GS, GS), jnp.uint8)
net_spec = NetworkSpec(bound=1.0)
render_spec = RenderSpec(bound=1.0, grid_size=GS, max_steps=256,
                         num_coarse=64, num_fine=48, dt_gamma=0.0)
params = init_network(jax.random.PRNGKey(0), net_spec)


def gt_image():
    o, d = np.asarray(ro), np.asarray(rd)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    b = np.sum(o * dn, -1)
    c = np.sum(o * o, -1) - 0.25
    disc = b * b - c
    img = np.ones((H * W, 3), np.float32)
    img[disc > 0] = [1.0, 0.2, 0.1]
    return img


gt = jnp.asarray(gt_image())
bg = jnp.ones((H * W, 3))


def loss_fn(params, key):
    out = render_train(params, occ, ro, rd, bg, key, render_spec, net_spec,
                       shading="diffuse", perturb=True)
    return jnp.mean((out["image"] - gt) ** 2)


opt = optax.adam(1e-2, eps=1e-15)
ost = opt.init(params)


@jax.jit
def step(params, ost, key):
    l, g = jax.value_and_grad(loss_fn)(params, key)
    up, ost = opt.update(g, ost)
    return optax.apply_updates(params, up), ost, l


t0 = time.time()
key = jax.random.PRNGKey(1)
losses = []
for i in range(300):
    key, k = jax.random.split(key)
    params, ost, l = step(params, ost, k)
    if i % 50 == 0 or i == 299:
        losses.append((i, float(l)))
print("losses:", losses)

out = render_train(params, occ, ro, rd, bg, jax.random.PRNGKey(9),
                   render_spec, net_spec, shading="diffuse", perturb=False)
img = np.asarray(out["image"]).reshape(H, W, 3)
psnr = -10 * np.log10(np.mean((img.reshape(-1, 3) - np.asarray(gt)) ** 2))
print("PSNR vs analytic scene: %.2f dB" % psnr)
print("center pixel (should go red):", img[H // 2, W // 2])
print("corner pixel (should stay white):", img[1, 1])
print("elapsed %.1fs" % (time.time() - t0))
assert psnr > 30, "drive failed: PSNR too low"
print("DRIVE OK")
