import time, jax, jax.numpy as jnp, numpy as np
t0=time.time()
import sys; sys.path.insert(0, '/root/repo')
from clm_gs_tpu.ops.rasterize import rasterize
from clm_gs_tpu.ops.rasterize_ref import rasterize_reference
from clm_gs_tpu.ops.projection import fully_fused_projection
from clm_gs_tpu.ops import sh as sh_ops
sys.path.insert(0, '/root/repo/tests')
from utils3d import make_camera, random_gaussians
from clm_gs_tpu.data.cameras import stack_cameras
print('imports', time.time()-t0, flush=True)

rng = np.random.RandomState(0)
n = 20000
xyz, log_scales, quats, opacity_logits, sh = random_gaussians(n, rng)
W, H = 640, 480
cam = make_camera(width=W, height=H, angle=0.4)
cb = stack_cameras([cam])
proj = fully_fused_projection(jnp.asarray(xyz), jnp.asarray(quats), jnp.exp(jnp.asarray(log_scales)),
                              cb.viewmats, cb.Ks, W, H)
colors = jnp.maximum(sh_ops.spherical_harmonics(3, jnp.asarray(xyz) - cb.camera_centers[0], jnp.asarray(sh)) + 0.5, 0.0)
opac = jax.nn.sigmoid(jnp.asarray(opacity_logits))
bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
args = (proj.means2d[0], proj.conics[0], colors, opac, proj.depths[0], proj.radii[0])
print('proj done', time.time()-t0, flush=True)

CAP = 262144
img, alpha, n_isects = rasterize(*args, W, H, bg, isect_cap=CAP)
jax.block_until_ready(img)
print('fwd compiled+ran', time.time()-t0, 'n_isects', int(n_isects), flush=True)

# timing fwd
for _ in range(3):
    img, alpha, n_isects = rasterize(*args, W, H, bg, isect_cap=CAP)
jax.block_until_ready(img)
t1=time.time()
iters=10
for _ in range(iters):
    img, alpha, n_isects = rasterize(*args, W, H, bg, isect_cap=CAP)
jax.block_until_ready(img)
dt = (time.time()-t1)/iters
print(f'fwd {dt*1e3:.2f} ms => {W*H/dt/1e6:.1f} Mpix/s', flush=True)

# grad
def loss(m2d, conics, colors, opac, bg):
    img, _, _ = rasterize(m2d, conics, colors, opac, proj.depths[0], proj.radii[0], W, H, bg, isect_cap=CAP)
    return jnp.sum(img**2)
gfn = jax.jit(jax.grad(loss, argnums=(0,1,2,3,4)))
g = gfn(proj.means2d[0], proj.conics[0], colors, opac, bg)
jax.block_until_ready(g)
print('bwd compiled+ran', time.time()-t0, flush=True)
t1=time.time()
for _ in range(iters):
    g = gfn(proj.means2d[0], proj.conics[0], colors, opac, bg)
jax.block_until_ready(g)
dt=(time.time()-t1)/iters
print(f'fwd+bwd {dt*1e3:.2f} ms => {W*H/dt/1e6:.1f} Mpix/s', flush=True)

# correctness vs oracle on small crop: rerun small scene
n2 = 200
xyz2, ls2, q2, ol2, sh2 = random_gaussians(n2, np.random.RandomState(1))
cam2 = make_camera(width=64, height=48, angle=1.0)
cb2 = stack_cameras([cam2])
p2 = fully_fused_projection(jnp.asarray(xyz2), jnp.asarray(q2), jnp.exp(jnp.asarray(ls2)), cb2.viewmats, cb2.Ks, 64, 48)
col2 = jnp.maximum(sh_ops.spherical_harmonics(3, jnp.asarray(xyz2) - cb2.camera_centers[0], jnp.asarray(sh2)) + 0.5, 0.0)
op2 = jax.nn.sigmoid(jnp.asarray(ol2))
ri, ra = rasterize_reference(p2.means2d[0], p2.conics[0], col2, op2, p2.depths[0], p2.radii[0], 64, 48, bg)
pi, pa, _ = rasterize(p2.means2d[0], p2.conics[0], col2, op2, p2.depths[0], p2.radii[0], 64, 48, bg, isect_cap=8192)
print('TPU-vs-oracle img maxdiff', float(jnp.abs(ri-pi).max()), 'alpha', float(jnp.abs(ra-pa).max()), flush=True)
print('ALL OK', time.time()-t0, flush=True)
