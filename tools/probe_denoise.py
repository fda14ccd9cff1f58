import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from pupiloptixlab_tpu.denoise.atrous import atrous_denoise

h, w = 1080, 1920
r = np.random.RandomState(0)
color = jnp.asarray(r.rand(h, w, 3).astype(np.float32))
albedo = jnp.asarray(r.rand(h, w, 3).astype(np.float32))
nr = r.rand(h, w, 3).astype(np.float32) - 0.5
nr /= np.maximum(np.linalg.norm(nr, axis=-1, keepdims=True), 1e-9)
normal = jnp.asarray(nr)

@partial(jax.jit, static_argnames=("k",))
def chain(c, a, n, k):
    def body(i, o):
        return atrous_denoise(o, a, n)
    return jax.lax.fori_loop(0, k, body, c)

for k in (1, 6):
    out = chain(color, albedo, normal, k)
    np.asarray(out[:1, :1])  # compile+sync
ts = {}
for k in (1, 6):
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = chain(color, albedo, normal, k)
        np.asarray(o[:1, :1])
        best = min(best, time.perf_counter() - t0)
    ts[k] = best * 1e3
print({k: round(v, 2) for k, v in ts.items()},
      "slope ms/call:", round((ts[6] - ts[1]) / 5, 3))
