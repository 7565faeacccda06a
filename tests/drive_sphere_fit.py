"""Verify-drive: end-to-end stage-0 style render + short fit through the
public package surface (no test framework)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp, optax, time

from nerf2mesh_tpu.ops.marching import march_rays, near_far_from_aabb
from nerf2mesh_tpu.ops.composite import composite_rays
from nerf2mesh_tpu.models.network import NetworkSpec, init_network, density, rgb
from nerf2mesh_tpu.data.rays import get_rays, orbit_pose, make_projection

H = W = 24
pose = orbit_pose(np.pi/2.2, 0.3, 2.5)[None]
fl = W / (2*np.tan(0.6/2))
rays = get_rays(jnp.asarray(pose), (fl, fl, W/2, H/2), H, W)
ro, rd = rays["rays_o"], rays["rays_d"]
aabb = jnp.asarray([-1.,-1,-1,1,1,1])
nears, fars = near_far_from_aabb(ro, rd, aabb, 0.05)

GS = 32
occ = jnp.ones((1, GS, GS, GS), jnp.uint8)

spec = NetworkSpec(bound=1.0)
params = init_network(jax.random.PRNGKey(0), spec)

# ground truth: analytic red sphere radius .5 at origin, white bg
def gt_image():
    # ray-sphere intersection
    o = np.asarray(ro); d = np.asarray(rd)
    b = np.sum(o*d, -1); c = np.sum(o*o, -1) - 0.25
    disc = b*b - np.sum(d*d,-1)*c
    hit = disc > 0
    img = np.ones((H*W, 3), np.float32)
    img[hit] = [1., 0.2, 0.1]
    return img
gt = jnp.asarray(gt_image())

NP_ = 576*64
def render(params):
    m = march_rays(ro, rd, occ, nears, fars, num_points=NP_, max_steps=64,
                   grid_size=GS, cascades=1, bound=1.0, dt_gamma=0.0)
    sig = density(params, m.xyzs, spec)
    col, _ = rgb(params, m.xyzs, m.dirs / jnp.linalg.norm(m.dirs, axis=-1, keepdims=True), spec, shading="diffuse")
    out = composite_rays(sig, col, m.ts, m.dts, m.ray_idx, m.valid, num_rays=H*W)
    return out["image"] + (1 - out["weights_sum"][:, None]) * 1.0  # white bg

def loss_fn(params):
    img = render(params)
    return jnp.mean((img - gt)**2)

opt = optax.adam(1e-2, eps=1e-15)
ost = opt.init(params)

@jax.jit
def step(params, ost):
    l, g = jax.value_and_grad(loss_fn)(params)
    up, ost = opt.update(g, ost)
    return optax.apply_updates(params, up), ost, l

t0 = time.time()
losses = []
for i in range(500):
    params, ost, l = step(params, ost)
    if i % 100 == 0 or i == 499:
        losses.append((i, float(l)))
print("losses:", losses)
img = np.asarray(render(params)).reshape(H, W, 3)
print("final image stats: min %.3f max %.3f mean %.3f" % (img.min(), img.max(), img.mean()))
psnr = -10*np.log10(np.mean((img.reshape(-1,3) - np.asarray(gt))**2))
print("PSNR vs analytic scene: %.2f dB" % psnr)
print("center pixel (should go red):", img[H//2, W//2])
print("corner pixel (should stay white):", img[1, 1])
print("elapsed %.1fs" % (time.time()-t0))
