"""Mosaic probe 2: the REAL pair-call structure at toy scale, in both
operand layouts.

Probe 1 proved isolated (8, 256) <-> (256, 8) transposes are exact on
chip, yet the full pair kernel in the transposed layout measured a 0.93%
force error. The remaining differences are structural: a
PrefetchScalarGridSpec with data-driven index maps, an aliased
accumulator, REVISITED output blocks (several consecutive grid steps
accumulate into the same block), and the vfirst seed/accumulate branch.
This reproduces exactly that structure with a trivial payload (sum of
strip columns per target) and checks both layouts against numpy.
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

BLOCK = 256
PJ = 8
G = 5            # real target blocks (+1 dummy)
TILES = 16

rng = np.random.default_rng(0)
# targets: (G+1) blocks of (BLOCK, 8); sources: strip per tile (8, 2048)
tcols_np = rng.standard_normal(((G + 1) * BLOCK, 8)).astype(np.float32)
strips_np = rng.standard_normal((TILES, 8, PJ * BLOCK)).astype(np.float32)
# tile -> target map with revisits and a dummy tail, non-decreasing
tgt_np = np.array([0, 0, 0, 1, 2, 2, 3, 3, 3, 3, 4, 4, G, G, G, G],
                  np.int32)
vfirst_np = np.concatenate([[1], (tgt_np[1:] != tgt_np[:-1]).astype(np.int32)])

# payload: out_block[b, c] += sum_s strip[c, s] * tcols_block[b, c]
def want():
    acc = np.zeros(((G + 1) * BLOCK, 8), np.float32)
    for t in range(TILES):
        g = tgt_np[t]
        tb = tcols_np[g * BLOCK:(g + 1) * BLOCK]  # (BLOCK, 8)
        s = strips_np[t].sum(axis=1)  # (8,)
        acc[g * BLOCK:(g + 1) * BLOCK] += tb * s[None, :]
    return acc


WANT = want()


def run_old():
    def kernel(tgt_ref, vf_ref, tc_ref, strip_ref, accin_ref, out_ref):
        t = pl.program_id(0)
        s = jnp.sum(strip_ref[:, :], axis=1, keepdims=True)  # (8, 1)
        tile = tc_ref[:, :] * s.T  # (BLOCK, 8)

        @pl.when(vf_ref[t] != 0)
        def _():
            out_ref[:, :] = accin_ref[:, :] + tile

        @pl.when(vf_ref[t] == 0)
        def _():
            out_ref[:, :] += tile

    acc0 = jnp.zeros(((G + 1) * BLOCK, 8), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((BLOCK, 8), lambda t, tgt, vf: (tgt[t], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, PJ * BLOCK), lambda t, tgt, vf: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK, 8), lambda t, tgt, vf: (tgt[t], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLOCK, 8), lambda t, tgt, vf: (tgt[t], 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(acc0.shape, acc0.dtype),
        input_output_aliases={4: 0},
    )(jnp.asarray(tgt_np), jnp.asarray(vfirst_np), jnp.asarray(tcols_np),
      jnp.asarray(strips_np).reshape(TILES * 8, PJ * BLOCK), acc0)


def run_new():
    tcols_t = jnp.asarray(tcols_np).T  # (8, (G+1)*BLOCK)

    def kernel(tgt_ref, vf_ref, tc_ref, strip_ref, accin_ref, out_ref):
        t = pl.program_id(0)
        s = jnp.sum(strip_ref[:, :], axis=1, keepdims=True)  # (8, 1)
        tile = tc_ref[:, :].T * s.T  # (BLOCK, 8)
        tile_t = tile.T  # (8, BLOCK)

        @pl.when(vf_ref[t] != 0)
        def _():
            out_ref[:, :] = accin_ref[:, :] + tile_t

        @pl.when(vf_ref[t] == 0)
        def _():
            out_ref[:, :] += tile_t

    acc0 = jnp.zeros((8, (G + 1) * BLOCK), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((8, BLOCK), lambda t, tgt, vf: (0, tgt[t]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, PJ * BLOCK), lambda t, tgt, vf: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, BLOCK), lambda t, tgt, vf: (0, tgt[t]),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLOCK), lambda t, tgt, vf: (0, tgt[t]),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(acc0.shape, acc0.dtype),
        input_output_aliases={4: 0},
    )(jnp.asarray(tgt_np), jnp.asarray(vfirst_np), tcols_t,
      jnp.asarray(strips_np).reshape(TILES * 8, PJ * BLOCK), acc0)
    return out.T


def check(name, got):
    got = np.asarray(got)
    bad = np.abs(got - WANT)
    ok = bad.max() <= 1e-5 * np.abs(WANT).max()
    print(f"{name:24s} {'EXACT' if ok else 'WRONG'} "
          f"max|diff|={bad.max():.3e} nbad={(bad > 1e-4).sum()}", flush=True)


check("old layout (BLOCK,8)", run_old())
check("new layout (8,BLOCK)", run_new())

# variant: new layout WITHOUT aliasing (zero-init accumulate only)
def run_new_noalias():
    tcols_t = jnp.asarray(tcols_np).T

    def kernel(tgt_ref, vf_ref, tc_ref, strip_ref, out_ref):
        t = pl.program_id(0)
        s = jnp.sum(strip_ref[:, :], axis=1, keepdims=True)
        tile_t = (tc_ref[:, :].T * s.T).T

        @pl.when(vf_ref[t] != 0)
        def _():
            out_ref[:, :] = tile_t

        @pl.when(vf_ref[t] == 0)
        def _():
            out_ref[:, :] += tile_t

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(TILES,),
            in_specs=[
                pl.BlockSpec((8, BLOCK), lambda t, tgt, vf: (0, tgt[t]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, PJ * BLOCK), lambda t, tgt, vf: (t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BLOCK), lambda t, tgt, vf: (0, tgt[t]),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, (G + 1) * BLOCK), jnp.float32),
    )(jnp.asarray(tgt_np), jnp.asarray(vfirst_np), tcols_t,
      jnp.asarray(strips_np).reshape(TILES * 8, PJ * BLOCK))
    return out.T


# every target in this toy map gets >= 1 tile, so seed-then-accumulate
# covers all blocks; the dummy block is garbage-free because tgt==G tiles
# also seed on their first visit
check("new layout, no alias", run_new_noalias())
print("PROBE2 DONE", flush=True)
