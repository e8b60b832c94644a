import time
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# can a Pallas TPU grid dimension be a traced (dynamic) value?
def kernel(n_ref, x_ref, o_ref):
    k = pl.program_id(0)
    @pl.when(k == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += x_ref[...]

def run(x, n):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, n_ref: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, n_ref: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(jnp.array([n], jnp.int32), x)

x = jnp.ones((800, 128), jnp.float32)

@jax.jit
def f(x, n):
    return run(x, n).sum()

print("static-as-traced:", f(x, jnp.int32(3)))   # expect 3*1024
print("again:", f(x, jnp.int32(7)))              # expect 7*1024, same exe
