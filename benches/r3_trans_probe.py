"""Mosaic transpose probe: which in-kernel (8, 256) <-> (256, 8)
relayout formulations are EXACT on the real chip?

The transposed pair-tile layout (tree._pack_targets_t) relies on one
VMEM transpose each way per tile; interpret mode matches the XLA
fallback to 6e-6 but the chip probe (benches/r3_tlayout.py) measured a
0.93% max force error, so at least one of the lowerings is wrong.
This isolates them: each variant writes f(x) for a known x and is
compared elementwise against numpy on the host.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"platform={jax.devices()[0].platform}", flush=True)

x_np = np.arange(8 * 256, dtype=np.float32).reshape(8, 256) + 0.5
x = jnp.asarray(x_np)


def run(kernel, out_shape):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(x.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(),
    )(x)


def check(name, got, want):
    got = np.asarray(got)
    ok = np.array_equal(got, want)
    nbad = int((got != want).sum())
    print(f"{name:34s} {'EXACT' if ok else f'WRONG ({nbad} bad)'}", flush=True)
    return ok


# A. identity (sanity)
def k_id(xr, o):
    o[:, :] = xr[:, :]
check("identity", run(k_id, (8, 256)), x_np)

# B. .T read
def k_t(xr, o):
    o[:, :] = xr[:, :].T
check(".T (8,256)->(256,8)", run(k_t, (256, 8)), x_np.T)

# C. jnp.transpose
def k_tr(xr, o):
    o[:, :] = jnp.transpose(xr[:, :], (1, 0))
check("jnp.transpose", run(k_tr, (256, 8)), x_np.T)

# D. double transpose (read path alone)
def k_tt(xr, o):
    o[:, :] = xr[:, :].T.T
check("double .T (identity)", run(k_tt, (8, 256)), x_np)

# E. row -> column via [:, None] reshape of a 1-row slice
def k_row(xr, o):
    t = xr[0:1, :].T  # (256, 1)
    o[:, :] = jnp.broadcast_to(t, (256, 8))
check("row (1,256).T bcast", run(k_row, (256, 8)),
      np.broadcast_to(x_np[0:1, :].T, (256, 8)))

# F. compute-shaped usage: (block,8) built from 3 transposed rows then
#    transposed back for the (8, block) write — the kernels' exact pattern
def k_full(xr, o):
    tc = xr[:, :].T  # (256, 8)
    a = tc[:, 0:1] * 2.0
    b = tc[:, 1:2] * 3.0
    c = tc[:, 2:3] * 4.0
    z = jnp.zeros_like(a)
    tile = jnp.concatenate([a, b, c, z, z, z, z, z], axis=1)  # (256, 8)
    o[:, :] = tile.T
want = np.zeros((8, 256), np.float32)
want[0] = x_np[0] * 2.0
want[1] = x_np[1] * 3.0
want[2] = x_np[2] * 4.0
check("kernel pattern rT/concat/T", run(k_full, (8, 256)), want)

# G. lane-broadcast alternative: extract row r as (256,1) via iota select
def k_iota(xr, o):
    col = jax.lax.broadcasted_iota(jnp.int32, (256, 8), 1)
    tc = xr[:, :].T
    sel = jnp.where(col == 0, tc * 2.0, tc)
    o[:, :] = sel.T
want_g = x_np.copy()
want_g[0] = x_np[0] * 2.0
check("select-on-transposed", run(k_iota, (8, 256)), want_g)

# H. tile-aligned reshape: (16, 128) <-> (256, 8). Row-major identical
#    data, exactly one (8,128)-tile pair — if this is exact, the pair
#    path can keep its (block, 8) compute with ZERO HBM padding by
#    storing ((G+1)*block*8/128, 128) and reshaping at the tile edge.
y_np = np.arange(16 * 128, dtype=np.float32).reshape(16, 128) + 0.25
y = jnp.asarray(y_np)


def run_y(kernel, out_shape):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(y.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(),
    )(y)


def k_resh(yr, o):
    t = yr[:, :].reshape(256, 8)
    cols = [t[:, i:i + 1] * (i + 2.0) for i in range(8)]
    t2 = jnp.concatenate(cols, axis=1)
    o[:, :] = t2.reshape(16, 128)


want_h = (y_np.reshape(256, 8)
          * (np.arange(8, dtype=np.float32) + 2.0)).reshape(16, 128)
check("reshape (16,128)<->(256,8)", run_y(k_resh, (16, 128)), want_h)

# I. reshape with a column reduction (the kernels' sum pattern)
def k_resh_sum(yr, o):
    t = yr[:, :].reshape(256, 8)
    s = jnp.sum(t, axis=1, keepdims=True)  # (256, 1)
    t2 = jnp.concatenate([s] + [jnp.zeros_like(s)] * 7, axis=1)
    o[:, :] = t2.reshape(16, 128)


tmp = y_np.reshape(256, 8).sum(axis=1)
want_i = np.zeros((256, 8), np.float32)
want_i[:, 0] = tmp
check("reshape + row-sum", run_y(k_resh_sum, (16, 128)),
      want_i.reshape(16, 128))

print("PROBE DONE", flush=True)
