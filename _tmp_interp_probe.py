import time

import numpy as np
import jax.numpy as jnp

from tests.conftest import *  # noqa: F401,F403  (pins CPU platform)
from pupiloptixlab_tpu.accel.bvh import build_bvh
from pupiloptixlab_tpu.accel.pallas_bvh import bvh_closest

r = np.random.RandomState(11)
tcl = 16
nt = 128
# random soup
c = r.rand(nt, 3).astype(np.float32) * 2 - 1
e1 = (r.rand(nt, 3).astype(np.float32) - 0.5) * 0.2
e2 = (r.rand(nt, 3).astype(np.float32) - 0.5) * 0.2
p0, p1, p2 = c, c + e1, c + e2
t_pad = ((nt + tcl - 1) // tcl) * tcl
pad = t_pad - nt
p0 = np.concatenate([p0, np.zeros((pad, 3), np.float32)])
p1 = np.concatenate([p1, np.zeros((pad, 3), np.float32)])
p2 = np.concatenate([p2, np.zeros((pad, 3), np.float32)])
bvh = build_bvh(p0, p1, p2, nt, tcl)
o = bvh.order
tri = jnp.asarray(np.concatenate(
    [p0[o], p1[o] - p0[o], p2[o] - p0[o], np.zeros((t_pad, 3), np.float32)], 1
))
n = 1024
ro = r.rand(n, 3).astype(np.float32) * 4 - 2
rd = r.randn(n, 3).astype(np.float32)
rd /= np.linalg.norm(rd, axis=1, keepdims=True)
tmin = np.zeros(n, np.float32)
tmax = np.full(n, 1e16, np.float32)
args = (
    *[jnp.asarray(a) for a in (ro[:, 0], ro[:, 1], ro[:, 2],
                               rd[:, 0], rd[:, 1], rd[:, 2], tmin, tmax)],
    tri,
    jnp.asarray(bvh.child), jnp.asarray(bvh.axis), jnp.asarray(bvh.boxes),
)
t0 = time.perf_counter()
t_a, i_a = bvh_closest(*args, tcl=tcl, interpret=True, stream=False)
t_a.block_until_ready()
print("resident", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
t_b, i_b = bvh_closest(*args, tcl=tcl, interpret=True, stream=True)
t_b.block_until_ready()
print("streamed", time.perf_counter() - t0, flush=True)
np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_b))
print("match ok", flush=True)
