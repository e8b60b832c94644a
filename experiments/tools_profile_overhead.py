import time
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp

@jax.jit
def trivial(x, eps):
    return (x + eps).sum()

x = jnp.ones((8, 128))
out = trivial(x, jnp.float32(0.0)); jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(20):
    out = trivial(x, jnp.float32(1e-6 * (i + 1)))
jax.block_until_ready(out)
print(f"trivial jit dispatch: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

# and a medium elementwise op to estimate per-call floor with real work
y = jnp.ones((1024, 1024))
@jax.jit
def med(x, eps):
    return jnp.sum(jnp.exp(x * eps))
out = med(y, jnp.float32(0.0)); jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(20):
    out = med(y, jnp.float32(1e-6 * (i + 1)))
jax.block_until_ready(out)
print(f"medium jit: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
