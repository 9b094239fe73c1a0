"""Body-sharded particle-mesh simulation over a 1-D device mesh.

PM's communication pattern is the friendliest of the three solver
families: each device CIC-deposits only its local body shard into a local
copy of the doubled mesh, ONE `psum` over the ICI ring produces the
global mass mesh, and the FFT solve + gradient + local gather run
replicated per device with zero further communication — O(N/D) body work
per device, one mesh-sized collective per force pass. (The all-pairs ring
needs D-1 ppermute hops; the sharded tree needs a sort, summary gathers,
and a halo all_to_all. PM needs a single psum.)

The replicated FFT is deliberate: at the supported mesh sizes (<= 128^3
live, 256^3 doubled) the solve is milliseconds, far below what a
distributed FFT's transpose collectives would cost to coordinate, and it
keeps the program identical on the fake 8-device CPU test mesh and a real
slice.

Same façade contract as `ring.ShardedSimulation` / `tree2
.ShardedTreeSimulation`: `shard_state` places the state, `prime`
calibrates (mesh box + FFT'd kernel, exactly `sim.Simulation`'s PM
calibration) and fills the acc cache, `step`/`run` are jitted with the
state donated; `health`/`maybe_recalibrate` carry the out-of-box
telemetry/rebuild loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.sharding import Mesh

from spacetpu import constants
from spacetpu.ops import integrators, pm
from spacetpu.parallel.ring import AXIS
from spacetpu.state import State


class ShardedPMSimulation:
    """Body-sharded PM N-body simulation: local deposit -> psum mesh ->
    replicated FFT solve -> local gather."""

    def __init__(self, mesh: Mesh, n: int, *, grid="auto", margin: float = 2.0,
                 softening: str = "plummer", eps: float | None = None,
                 g: float = constants.G, integrator: str = "leapfrog"):
        n_dev = mesh.devices.size
        if n % n_dev != 0:
            raise ValueError(
                f"N={n} must be divisible by mesh size {n_dev}; "
                f"pad with make_state(pad_to=...)"
            )
        self.mesh = mesh
        self.n = n
        self.grid = pm.default_grid(n) if grid == "auto" else int(grid)
        self.margin = margin
        self.g = g
        if eps is None:
            eps = constants.COLLISION_EPSILON if softening == "ref" else 0.0
        self.eps = eps
        self._stepper = integrators.get_stepper(integrator)
        #: calibration products (box_min, h, kernel_hat); None until
        #: calibrate()/prime() has seen a state.
        self._pm: dict | None = None

    # -- calibration ----------------------------------------------------
    def calibrate(self, state: State):
        """Measure the global bounding box (host-side gather of pos — N*12
        bytes, once) and bake box/h/kernel as replicated device constants
        of the rebuilt jits."""
        box_min, h = pm.measure_box(state.pos, grid=self.grid,
                                    margin=self.margin)
        kernel_hat = pm.pm_kernel_hat(self.grid, h, eps=self.eps, g=self.g,
                                      dtype=state.pos.dtype)
        self._pm = dict(box_min=box_min, h=h, grid=self.grid,
                        kernel_hat=kernel_hat)
        self._build_jits()

    def _local_acc(self, pos_l, mass_l, kernel_hat):
        """Inside shard_map: local deposit, one psum, replicated solve,
        local gather. kernel_hat is threaded through the jits as a
        REPLICATED argument — a closed-over table would inline into the
        serialized HLO as a literal (a grid=256 kernel is 269 MB of
        program text, overflowing compile-RPC payload limits)."""
        p = self._pm
        dt_r = pos_l.dtype
        box_min = jnp.asarray(p["box_min"], dt_r)
        inv_h = jnp.asarray(1.0 / p["h"], dt_r)
        # COMPACT (G+1)^3 deposit: the psum payload is 8x smaller than
        # the doubled mesh (structural zeros never ride the ICI)
        mesh_l = pm.deposit_cic_compact(pos_l, mass_l, box_min=box_min,
                                        inv_h=inv_h, grid=self.grid)
        mesh_g = jax.lax.psum(mesh_l, AXIS)
        return pm.acc_from_mesh_compact(pos_l, mesh_g, kernel_hat=kernel_hat,
                                        box_min=box_min, inv_h=inv_h,
                                        grid=self.grid)

    def _build_jits(self):
        stepper = self._stepper

        def local_step(state: State, dt, kernel_hat) -> State:
            acc_fn = lambda p, m: self._local_acc(p, m, kernel_hat)
            return stepper(state, dt, acc_fn)

        def local_prime(state: State, kernel_hat) -> State:
            acc_fn = lambda p, m: self._local_acc(p, m, kernel_hat)
            return integrators.prime(state, acc_fn)

        def local_run(state: State, dt, kernel_hat, steps: int) -> State:
            acc_fn = lambda p, m: self._local_acc(p, m, kernel_hat)

            def body(s, _):
                return stepper(s, dt, acc_fn), None

            state, _ = jax.lax.scan(body, state, None, length=steps)
            return state

        smap = functools.partial(jax.shard_map, mesh=self.mesh,
                                 check_vma=False)

        def full_specs(state):
            return State(
                pos=P(AXIS), vel=P(AXIS), mass=P(AXIS), acc=P(AXIS),
                pos_c=None if state.pos_c is None else P(AXIS),
                vel_c=None if state.vel_c is None else P(AXIS),
                time=None if state.time is None else P(),
                n_active=None if state.n_active is None else P(),
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, dt, kernel_hat):
            sp = full_specs(state)
            return smap(local_step, in_specs=(sp, P(), P()), out_specs=sp)(
                state, dt, kernel_hat)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def prime_jit(state, kernel_hat):
            sp = full_specs(state)
            return smap(local_prime, in_specs=(sp, P()), out_specs=sp)(
                state, kernel_hat)

        @functools.partial(jax.jit, static_argnames=("steps",),
                           donate_argnums=(0,))
        def run_jit(state, dt, kernel_hat, steps):
            sp = full_specs(state)
            return smap(functools.partial(local_run, steps=steps),
                        in_specs=(sp, P(), P()), out_specs=sp)(
                state, dt, kernel_hat)

        self.step = lambda state, dt: step(state, dt,
                                           self._pm["kernel_hat"])
        self._prime_jit = lambda state: prime_jit(state,
                                                  self._pm["kernel_hat"])
        self.run = lambda state, dt, steps: run_jit(
            state, dt, self._pm["kernel_hat"], steps=steps)

    # -- façade ----------------------------------------------------------
    def prime(self, state: State) -> State:
        if self._pm is None:
            self.calibrate(state)
        return self._prime_jit(state)

    def shard_state(self, state: State) -> State:
        from spacetpu.parallel import ring

        return ring.shard_state(self.mesh, state)

    def health(self, state: State) -> dict:
        if self._pm is None:
            return {}
        n_out = int(pm.count_out_of_box(
            jnp.asarray(state.pos), self._pm["box_min"], self._pm["h"],
            self.grid,
        ))
        return {"out_of_box": n_out, "grid": self.grid}

    def maybe_recalibrate(self, state: State, *, frac: float = 0.02) -> bool:
        """Re-measure the box + kernel when more than ``frac`` of the
        bodies have left the calibrated box (their deposits are
        face-clamped until then — counted, never silent). Always
        convergent: the new box covers every body by construction."""
        h = self.health(state)
        if h.get("out_of_box", 0) <= frac * self.n:
            return False
        self.calibrate(state)
        return True
