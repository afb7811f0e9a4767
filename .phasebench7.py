import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compilation_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timeit_get(name, fn, x0, iters):
    jfn = jax.jit(fn)
    x = jfn(x0)
    _ = float(jax.device_get(jnp.ravel(x)[0]))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        x = jfn(x)
    v = float(jax.device_get(jnp.ravel(x)[0]))  # true sync: read a value
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms   (probe={v:.3e})")
    return dt

a = jnp.ones((8192, 8192), jnp.float32) * jnp.float32(1e-5)
f = lambda m: jax.lax.dot(m, m, precision=jax.lax.Precision.HIGHEST) * jnp.float32(1e-4)
timeit_get("matmul 8192^3 HIGHEST, iters=1 ", f, a, 1)
timeit_get("matmul 8192^3 HIGHEST, iters=10", f, a, 10)
timeit_get("matmul 8192^3 HIGHEST, iters=30", f, a, 30)
