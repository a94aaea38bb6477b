import time
import numpy as np, jax, jax.numpy as jnp
from fiesta_tpu import configure_compile_cache
configure_compile_cache()
from fiesta_tpu.ops.pallas.edt import truncated_edt_d2
rng = np.random.default_rng(0)
for shape in [(400,400,36),(160,160,36),(256,256,36),(192,192,36),(160,160,40),(256,256,40)]:
    occ = jnp.asarray(rng.random(shape) < 0.001)
    def loop(occ):
        def body(i, c):
            d2 = truncated_edt_d2(occ != (i < 0), 50)
            return c + d2.ravel()[::4096].sum()
        return jax.lax.fori_loop(0, 20, body, jnp.int32(0))
    f = jax.jit(loop)
    float(f(occ))
    t0=time.perf_counter(); float(f(occ)); d=time.perf_counter()-t0
    print(f"{shape}: {1e3*d/20:.2f} ms")
