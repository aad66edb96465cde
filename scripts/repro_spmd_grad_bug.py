#!/usr/bin/env python
"""Minimal repro: XLA SPMD partitioner gradient mis-scaling (jax 0.9.0).

Under a combined (data=2, model=4) mesh with [B, H, W, C] inputs sharded
P('data', 'model'), a two-branch fuse where the MAIN branch's sharded height
equals the model-axis size (one row per device) and the SIDE branch is
smaller (padded shards) produces gradients with ~1.7-3.5x inflated norms;
the forward/loss is bit-correct. Clean when every stage keeps >= 2 rows per
device. This caps tiny-shape spatial-sharding tests, not production shapes —
see tpudepth/core/mesh.py:min_spatial_height for the guard.

  gpool_fuse_8    main H=8, side H=1: ratio 1.000  (clean)
  avgpool2_fuse_8 main H=8, side H=2: ratio 1.000  (clean)
  avgpool2_fuse_4 main H=4, side H=2: ratio 1.686  (BUG)
  fuse_8_2        main H=8, side H=2: ratio 1.000  (clean)
  (fuse_4_2       main H=4, side H=2 deep-chain: ratio 3.462 (BUG))

Verified workarounds (round 3; full issue writeup: docs/xla_spmd_grad_bug.md):
constraining EITHER fuse operand off the model axis restores ratio 1.0000 —
  wa_side_repl    side branch constrained to P('data') before resize: 1.000
  wa_main_repl    main branch constrained to P('data') at the fuse:   1.000
(the constraint must cover the tensor entering the add; constraining the
pool output upstream of the side conv does NOT fix it).
"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpudepth.ops.image import resize_bilinear, avg_pool

rng = np.random.default_rng(0)
x = rng.random((4, 64, 64, 3)).astype(np.float32)
w1 = (rng.random((3, 3, 3, 8)).astype(np.float32) - 0.5)
w2 = (rng.random((3, 3, 8, 8)).astype(np.float32) - 0.5)

def bn(y):
    mu = jnp.mean(y, axis=(0,1,2), keepdims=True)
    var = jnp.mean((y-mu)**2, axis=(0,1,2), keepdims=True)
    return (y-mu)/jnp.sqrt(var+1e-5)

def conv(x, w, s):
    return jax.lax.conv_general_dilated(x, w, (s,s), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"))

def down_to(x, w1, w2, n):
    y = jax.nn.relu(bn(conv(x, w1, 2)))
    for _ in range(n - 1):
        y = jax.nn.relu(bn(conv(y, w2, 2)))
    return y

_MESH = [None]
def _wsc_data(t):
    """Workaround constraint: drop the model-axis sharding (no-op 1-dev)."""
    if _MESH[0] is None:
        return t
    return jax.lax.with_sharding_constraint(t, NamedSharding(_MESH[0], P("data")))

CASES = {
  # main branch H=8 (2 rows/dev); pooled branch H=1 via global mean -> conv -> resize-up -> add
  "gpool_fuse_8": lambda w1, w2, x: (lambda y: y + resize_bilinear(conv(jnp.mean(y, axis=(1,2), keepdims=True), w2, 1), (8,8)))(down_to(x, w1, w2, 3)),
  # main branch H=8; avgpool stride-4 branch H=2 < axis -> conv -> resize-up -> add (DAPPM scale2 pattern)
  "avgpool2_fuse_8": lambda w1, w2, x: (lambda y: y + resize_bilinear(conv(avg_pool(y, 9, 4, 4), w2, 1), (8,8)))(down_to(x, w1, w2, 3)),
  # main H=4 (=axis), pooled H=2 < axis
  "avgpool2_fuse_4": lambda w1, w2, x: (lambda y: y + resize_bilinear(conv(avg_pool(y, 5, 2, 2), w2, 1), (4,4)))(down_to(x, w1, w2, 4)),
  # conv chain to H=2 then resize to 8, fused with H=8 branch (skip-level fuse)
  "fuse_8_2": lambda w1, w2, x: down_to(x, w1, w2, 3) + resize_bilinear(conv(down_to(x, w1, w2, 5), w2, 1), (8, 8)),
  # the failing pattern + each verified workaround (docs/xla_spmd_grad_bug.md)
  "wa_side_repl": lambda w1, w2, x: (lambda y: y + resize_bilinear(_wsc_data(conv(avg_pool(y, 5, 2, 2), w2, 1)), (4,4)))(down_to(x, w1, w2, 4)),
  "wa_main_repl": lambda w1, w2, x: (lambda y: _wsc_data(y) + resize_bilinear(conv(avg_pool(y, 5, 2, 2), w2, 1), (4,4)))(down_to(x, w1, w2, 4)),
}
for name, f in CASES.items():
    def loss(w1, w2, x):
        return jnp.mean(jnp.abs(f(w1, w2, x)))
    gfn = jax.jit(jax.grad(loss, argnums=(0,1)))
    res = {}
    for nd, nm in [(1,1),(2,4)]:
        devs = np.asarray(jax.devices()[:nd*nm]).reshape(nd, nm)
        mesh = Mesh(devs, ("data","model"))
        _MESH[0] = mesh if nd * nm > 1 else None
        xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data","model")))
        ws1 = jax.device_put(jnp.asarray(w1), NamedSharding(mesh, P()))
        ws2 = jax.device_put(jnp.asarray(w2), NamedSharding(mesh, P()))
        g1, g2 = gfn(ws1, ws2, xs)
        res[(nd,nm)] = float(jnp.sqrt(jnp.sum(g1**2)+jnp.sum(g2**2)))
    print(f"{name}: ||g11||={res[(1,1)]:.6f} ||g24||={res[(2,4)]:.6f} ratio={res[(2,4)]/res[(1,1)]:.3f}", flush=True)
