import os, time, glob, gzip, json
import numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

from event3dgs_tpu.core import make_camera
from event3dgs_tpu.ops.projection import project_gaussians
from event3dgs_tpu.ops.rasterize_tiled import rasterize_tiled

N=100_000; W,H=1920,1080
cam = make_camera(np.eye(3), np.zeros(3), 1.2, 0.75, W, H)
rng = np.random.default_rng(0)
means = jnp.asarray(np.c_[rng.uniform(-3,3,N), rng.uniform(-1.8,1.8,N), rng.uniform(2,10,N)], jnp.float32)
scales = jnp.asarray(np.exp(rng.uniform(np.log(0.005),np.log(0.03),(N,1)))*rng.uniform(0.7,1.4,(N,3)), jnp.float32)
rots = jnp.asarray(rng.normal(size=(N,4)), jnp.float32)
opac = jnp.asarray(rng.uniform(0.3,0.9,N), jnp.float32)
colors = jnp.asarray(rng.uniform(0,1,(N,3)), jnp.float32)
bg = jnp.zeros(3); icap=8*N
interp = jax.default_backend() != "tpu"

@jax.jit
def fwdbwd(m,s,r,o,c,eps):
    def loss(m,s,r,o,c):
        p = project_gaussians(m+eps, s, r, cam, opacities=o)
        img = rasterize_tiled(p, c, o, bg, W, H, instance_cap=icap, interpret=interp)
        return jnp.sum(img*img)
    g = jax.grad(loss, argnums=(0,3,4))(m,s,r,o,c)
    return jax.tree.map(lambda x: x.sum(), g)

out = fwdbwd(means,scales,rots,opac,colors,jnp.float32(0.0)); jax.block_until_ready(out)
jax.profiler.start_trace("/tmp/jtrace")
for i in range(3):
    out = fwdbwd(means,scales,rots,opac,colors,jnp.float32(1e-6*(i+1)))
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace done")
