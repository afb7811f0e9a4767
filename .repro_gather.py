import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def mk(expr):
    def kernel(a_ref, d_ref, o_ref, c_ref):
        c_ref[:] = a_ref[:]
        dsc = d_ref[:]  # (53, 128)
        if expr == "pos":
            o_ref[:, 0:3] = c_ref[:, 0:3] * dsc[None, 0:3]
        elif expr == "pos_reshape":
            o_ref[:, 0:3] = c_ref[:, 0:3] * jnp.reshape(dsc[0:3], (1, 3, 128))
        elif expr == "int":
            o_ref[:, 3] = c_ref[:, 3] * dsc[3:4]
        elif expr == "flat":
            o_ref[:, 6:53] = c_ref[:, 6:53] * dsc[None, 6:53]
    return kernel

a = jnp.ones((53, 53, 128), jnp.float32)
d = jnp.ones((53, 128), jnp.float32)
for expr in ("pos", "pos_reshape", "int", "flat"):
    try:
        out = pl.pallas_call(
            mk(expr),
            out_shape=jax.ShapeDtypeStruct((53, 53, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((53, 53, 128), jnp.float32)],
        )(a, d)
        jax.block_until_ready(out)
        print(expr, "OK")
    except Exception as e:
        print(expr, "FAIL:", str(e).splitlines()[0][:90])
