"""Body-sharded TreePM over a 1-D device mesh: O(N/D) per device.

Composes the two communication patterns the other sharded solvers
already proved out, one per force-split half (ops/treepm.py):

- **Long range** rides the sharded-PM pattern (`parallel/pmshard.py`):
  each device CIC-deposits its local body shard into a local doubled
  mesh, ONE `psum` over the ICI ring produces the global mass mesh, and
  the FFT solve against the erf-smoothed long-range kernel + gradient +
  local gather run replicated with zero further communication.
- **Short range** rides the sharded-tree pattern (`parallel/tree2.py`):
  the state lives in global SFC order (distributed bitonic resort every
  `resort_every` steps), each device builds cutoff near lists for its
  LOCAL clusters against all_gathered O(G) summaries, fetches the remote
  near clusters' bodies through tree2's request/response halo exchange,
  and evaluates the short-range pair tiles locally (the erf-complement
  Pallas kernel). Every truncation (near-list cap, halo cap, tile cap)
  is counted and surfaced through `diagnose`.

Same facade contract as the other sharded families: `shard_state`
places, `prime` calibrates (mesh box + long kernel + measured worst-
shard caps) and fills the acc cache, `step`/`run` are jitted with
donation over `tree2.TreeShardedState`, `user_order` restores the
caller's body order.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from spacetpu import constants
from spacetpu.ops import integrators, pm as pm_ops
from spacetpu.ops import tree as tree_ops
from spacetpu.ops import treepm as treepm_ops
from spacetpu.parallel import tree2
from spacetpu.parallel.ring import AXIS
from spacetpu.state import State

LEAF = tree_ops.LEAF
TreeShardedState = tree2.TreeShardedState


def required_n(n: int, n_devices: int) -> int:
    """Round N up so every shard splits into whole LEAF-body clusters."""
    unit = n_devices * LEAF
    return -(-n // unit) * unit


def _treepm_acc(pos_l, mass_l, kernel_hat, *, axis: str, pm_cal: dict,
                rcut: float, rs: float, split: str = "gauss",
                k_near: int, near_tiles: int,
                halo_cap: int, softening: str, eps: float, g: float,
                backend: str, interpret, with_diag: bool = False):
    """Per-device TreePM force for a globally SFC-sorted body shard
    (inside shard_map). Gathers are O(G) cluster summaries + one doubled
    mesh psum; bodies move only through the halo exchange."""
    m = pos_l.shape[0]
    g_l = m // LEAF
    rank = jax.lax.axis_index(axis)
    base = rank * g_l
    dtype = pos_l.dtype

    pos_g = pos_l.reshape(g_l, LEAF, 3)
    mass_g = mass_l.reshape(g_l, LEAF)
    com, m_tot, _, r_tgt = tree_ops._group_stats(pos_g, mass_g)

    com_all = jax.lax.all_gather(com, axis, tiled=True)  # (G, 3)
    m_all = jax.lax.all_gather(m_tot, axis, tiled=True)
    rt_all = jax.lax.all_gather(r_tgt, axis, tiled=True)
    gg = com_all.shape[0]

    # cutoff near lists for the LOCAL target clusters (sources global)
    idx_mine, over_near = treepm_ops.near_lists_rcut(
        com_all, m_all, rt_all, rcut, k_near, t0=base, n_t=g_l
    )

    # halo exchange first: its collectives have no data dependency on the
    # PM solve, so XLA can overlap them with the FFT compute
    idx_pool, pool_pos_g, pool_mass_g, over_halo = tree2._halo_exchange(
        idx_mine, pos_g, mass_g, axis=axis, g_l=g_l, halo_cap=halo_cap,
    )

    # long range: local deposit -> one psum'd mesh -> replicated erf
    # solve -> local gather (the pmshard pattern with the LONG kernel)
    box_min = jnp.asarray(pm_cal["box_min"], dtype)
    inv_h = jnp.asarray(1.0 / pm_cal["h"], dtype)
    grid = pm_cal["grid"]
    # COMPACT (G+1)^3 deposit: the psum payload is 8x smaller than the
    # doubled mesh (structural zeros never ride the ICI)
    mesh_l = pm_ops.deposit_cic_compact(pos_l, mass_l, box_min=box_min,
                                        inv_h=inv_h, grid=grid)
    mesh_g = jax.lax.psum(mesh_l, axis)
    # kernel_hat is a traced ARGUMENT (replicated through the jits) —
    # a closed-over table would inline into the serialized HLO as a
    # literal (269 MB at grid=256, overflowing compile-RPC limits)
    acc = pm_ops.acc_from_mesh_compact(pos_l, mesh_g, kernel_hat=kernel_hat,
                                       box_min=box_min, inv_h=inv_h,
                                       grid=grid)

    # short range over the halo pool (erf-complement pair tiles)
    p = pool_pos_g.shape[0]
    pj = tree_ops.NEAR_TILE_J // (LEAF + 1)
    flat, ttgt, ntiles, drop = tree_ops.near_pair_segments(
        idx_pool, p, pj, near_tiles
    )
    pool_com, _, _, _ = tree_ops._group_stats(pool_pos_g, pool_mass_g)
    corr = treepm_ops.near_pairs_short(
        pos_g, pool_pos_g, pool_mass_g, pool_com, flat, ttgt,
        softening=softening, eps=eps, rs=rs, rcut=rcut, split=split,
        g=g, backend=backend,
        interpret=interpret, n_tiles=ntiles,
    ).reshape(m, 3)
    acc = acc + corr
    if with_diag:
        return acc, {
            "near_overflow": jax.lax.psum(over_near, axis),
            "halo_overflow": jax.lax.psum(over_halo, axis),
            "tile_overflow": jax.lax.psum(drop, axis),
        }
    return acc


@dataclasses.dataclass
class ShardedTreePMSimulation:
    """TreePM N-body simulation with O(N/D) per-device memory.

    The state lives in global SFC order (tree2.TreeShardedState); use
    shard_state() to place an initial State and user_order() to bring
    results back. step/run/prime are jitted with donation."""

    mesh: Mesh
    n: int
    grid: object = "auto"  # mesh size per axis (auto | int)
    margin: float = 2.0
    rs_cells: Optional[float] = None  # None = treepm.RS_CELLS
    rcut_rs: Optional[float] = None  # None = treepm.RCUT_RS
    softening: str = "plummer"
    eps: Optional[float] = None
    g: float = constants.G
    integrator: str = "leapfrog"
    backend: str = "auto"
    k_near: Optional[int] = None  # None = measured at prime()
    near_tiles: Optional[int] = None  # per-shard cap (None = measured)
    halo_cap: Optional[int] = None
    resort_every: int = 16
    run_chunk: Optional[int] = None
    interpret: Optional[bool] = None
    split: Optional[str] = None  # force-split family (None = treepm.SPLIT)

    def __post_init__(self):
        d = self.mesh.devices.size
        if d & (d - 1):
            raise ValueError(f"mesh size must be a power of 2, got {d}")
        if self.n % (d * LEAF):
            raise ValueError(
                f"N={self.n} must be a multiple of D*LEAF={d * LEAF}; pad "
                f"with make_state(pad_to=treepmshard.required_n(n, {d}))"
            )
        self._d = d
        self._g_l = self.n // d // LEAF
        self._grid = (treepm_ops.default_grid(self.n) if self.grid == "auto"
                      else int(self.grid))
        eps = self.eps
        if eps is None:
            eps = constants.COLLISION_EPSILON if self.softening == "ref" else 0.0
        self._eps = float(eps)
        backend = self.backend
        if backend == "auto":
            backend = ("pallas" if jax.devices()[0].platform == "tpu"
                       else "xla")
        self._backend = backend
        interpret = self.interpret
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self._interpret = bool(interpret)
        h = self.halo_cap
        if h is None:
            h = max(64, self._g_l // 2)
        self._halo_cap = int(min(h, self._g_l))
        self._stepper = integrators.get_stepper(self.integrator)
        #: calibration products: PM box/h/long-kernel + split scales +
        #: measured caps; None until calibrate()/prime() has seen a state.
        self._pm: dict | None = None
        self._k_near: Optional[int] = self.k_near
        self._near_tiles: Optional[int] = self.near_tiles

    # -- calibration ------------------------------------------------------
    def calibrate(self, ts_or_state):
        """Measure the global bounding box + cutoff near-list caps (host-
        side, once) and rebuild the jitted closures: the multi-chip
        analogue of Simulation._calibrate_treepm. Accepts the current
        TreeShardedState or an unsharded State."""
        state = getattr(ts_or_state, "state", ts_or_state)
        box_min, h = pm_ops.measure_box(state.pos, grid=self._grid,
                                        margin=self.margin)
        rs_cells = (treepm_ops.RS_CELLS if self.rs_cells is None
                    else float(self.rs_cells))
        rcut_rs = (treepm_ops.RCUT_RS if self.rcut_rs is None
                   else float(self.rcut_rs))
        rs, rcut = treepm_ops.split_params(h, rs_cells=rs_cells,
                                           rcut_rs=rcut_rs)
        split = treepm_ops.SPLIT if self.split is None else str(self.split)
        kernel_hat = treepm_ops.make_kernel_hat(
            split, self._grid, h, rs, rcut, g=self.g, dtype=state.pos.dtype
        )
        m = treepm_ops.measure_near_rcut(
            state.pos, state.mass, rcut=rcut, gg=self._d * self._g_l,
            leaf=LEAF, n_shards=self._d,
        )
        if self.k_near is None:
            self._k_near = m["k_near"]
        if self.near_tiles is None:
            self._near_tiles = m["near_tiles_shard"]
        self._pm = dict(box_min=box_min, h=h, grid=self._grid,
                        kernel_hat=kernel_hat, rs=rs, rcut=rcut,
                        split=split)
        self._build_jits()

    def _build_jits(self):
        acc_fn = functools.partial(
            _treepm_acc, axis=AXIS, pm_cal=self._pm, rcut=self._pm["rcut"],
            rs=self._pm["rs"], split=self._pm["split"],
            k_near=self._k_near,
            near_tiles=self._near_tiles, halo_cap=self._halo_cap,
            softening=self.softening, eps=self._eps, g=self.g,
            backend=self._backend, interpret=self._interpret,
        )
        r = self.resort_every
        stepper = self._stepper

        def local_step(ts: TreeShardedState, dt,
                       kernel_hat) -> TreeShardedState:
            state, ids = ts.state, ts.ids

            def do_sort(args):
                return tree2._resort_local(args[0], args[1], axis=AXIS)

            state, ids = jax.lax.cond(
                ts.tick % r == 0, do_sort, lambda args: args, (state, ids)
            )
            state = stepper(state, dt, lambda p, m: acc_fn(p, m, kernel_hat))
            return TreeShardedState(state, ids, ts.tick + 1)

        def local_prime(ts: TreeShardedState, kernel_hat) -> TreeShardedState:
            state, ids = tree2._resort_local(ts.state, ts.ids, axis=AXIS)
            state = integrators.prime(
                state, lambda p, m: acc_fn(p, m, kernel_hat))
            return TreeShardedState(state, ids, jnp.ones((), jnp.int32))

        def local_run(ts: TreeShardedState, dt, kernel_hat, steps: int):
            def body(t, _):
                return local_step(t, dt, kernel_hat), None

            ts, _ = jax.lax.scan(body, ts, None, length=steps)
            return ts

        def local_diag(ts: TreeShardedState, kernel_hat):
            _, diag = acc_fn(ts.state.pos, ts.state.mass, kernel_hat,
                             with_diag=True)
            return diag

        smap = functools.partial(jax.shard_map, mesh=self.mesh,
                                 check_vma=False)

        def ts_specs(ts: TreeShardedState):
            st = ts.state
            sp = State(
                pos=P(AXIS), vel=P(AXIS), mass=P(AXIS), acc=P(AXIS),
                pos_c=None if st.pos_c is None else P(AXIS),
                vel_c=None if st.vel_c is None else P(AXIS),
                time=None if st.time is None else P(),
                n_active=None if st.n_active is None else P(),
            )
            return TreeShardedState(sp, P(AXIS), P())

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(ts, dt, kernel_hat):
            sp = ts_specs(ts)
            return smap(local_step, in_specs=(sp, P(), P()), out_specs=sp)(
                ts, dt, kernel_hat)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prime_jit(ts, kernel_hat):
            sp = ts_specs(ts)
            return smap(local_prime, in_specs=(sp, P()), out_specs=sp)(
                ts, kernel_hat)

        @functools.partial(jax.jit, static_argnames=("steps",),
                           donate_argnums=(0,))
        def run_jit(ts, dt, kernel_hat, steps):
            sp = ts_specs(ts)
            return smap(
                functools.partial(local_run, steps=steps),
                in_specs=(sp, P(), P()), out_specs=sp,
            )(ts, dt, kernel_hat)

        @jax.jit
        def diagnose(ts, kernel_hat):
            sp = ts_specs(ts)
            return smap(local_diag, in_specs=(sp, P()), out_specs={
                "near_overflow": P(), "halo_overflow": P(),
                "tile_overflow": P(),
            })(ts, kernel_hat)

        self.step = lambda ts, dt: step(ts, dt, self._pm["kernel_hat"])
        self._prime_jit = lambda ts: prime_jit(ts, self._pm["kernel_hat"])
        self._run_jit = lambda ts, dt, steps: run_jit(
            ts, dt, self._pm["kernel_hat"], steps=steps)
        self._diagnose = lambda ts: diagnose(ts, self._pm["kernel_hat"])

    # -- facade -----------------------------------------------------------
    def prime(self, ts: TreeShardedState) -> TreeShardedState:
        if self._pm is None:
            self.calibrate(ts)
        return self._prime_jit(ts)

    def scan_chunk(self) -> Optional[int]:
        """Same fence policy as the other pairs-tile consumers (see
        spacetpu.sim scan_chunk): the short-range pass reuses the tree's
        pair-tile machinery, so it inherits the scan x dense-near-work
        fence — from the calibrated per-shard tile count."""
        from spacetpu import sim as sim_mod

        if self.run_chunk:
            return self.run_chunk
        if self._backend != "pallas":
            return None
        if (self._near_tiles or 0) > sim_mod.DENSE_TILES_SINGLE_STEP:
            return 1
        if (self._k_near or 0) > sim_mod.DENSE_K_NEAR:
            return sim_mod.SAFE_DENSE_SCAN
        return sim_mod.DEFAULT_RUN_CHUNK

    def run(self, ts: TreeShardedState, dt, steps: int) -> TreeShardedState:
        chunk = self.scan_chunk()
        if chunk is None or (chunk >= steps and chunk > 1):
            return self._run_jit(ts, dt, steps)
        done = 0
        while done < steps:
            todo = min(chunk, steps - done)
            ts = (self.step(ts, dt) if todo == 1
                  else self._run_jit(ts, dt, todo))
            done += todo
        return ts

    def shard_state(self, state: State) -> TreeShardedState:
        """Place a State on the mesh (body axis sharded); prime() performs
        the first global sort."""
        # identical placement semantics — delegate to the sharded tree
        return tree2.ShardedTreeSimulation.shard_state(self, state)

    def user_order(self, ts: TreeShardedState) -> State:
        return tree2.ShardedTreeSimulation.user_order(self, ts)

    def diagnose(self, ts: TreeShardedState) -> dict:
        """Truncation telemetry: near-list cap overflow, halo-cap drops,
        and pair-tile drops (all global sums), plus the out-of-box count
        of the calibrated PM mesh."""
        d = {k: int(v) for k, v in self._diagnose(ts).items()}
        if self._pm is not None:
            d["out_of_box"] = int(pm_ops.count_out_of_box(
                jnp.asarray(ts.state.pos), self._pm["box_min"],
                self._pm["h"], self._pm["grid"],
            ))
        return d

    def maybe_recalibrate(self, ts: TreeShardedState, *,
                          frac: float = 0.02) -> bool:
        """Re-measure the box + caps when the telemetry shows degradation
        (out-of-box deposits or counted truncations past `frac`); one
        re-compile when it triggers."""
        d = self.diagnose(ts)
        trunc = (d.get("near_overflow", 0) + d.get("halo_overflow", 0)
                 + d.get("tile_overflow", 0))
        if (d.get("out_of_box", 0) <= frac * self.n
                and trunc <= frac * self._d * self._g_l):
            return False
        self.calibrate(ts)
        return True
