"""Physical and simulation constants.

TPU-native re-design of the reference unit system
(`/root/reference/space/src/constants.rs:1-30`): positions are measured in AU,
masses in Earth masses, time in seconds, so the gravitational constant is
rescaled to ``G = G_ABS * M0 / AU**3``.

Unlike the reference (compile-time Rust consts only), everything here is a
plain module-level value that the config system (`spacetpu.utils.config`) can
override per-run; kernels receive them as traced scalars so no recompilation
is required when tuning ``dt`` live.
"""

from __future__ import annotations

# --- Physical units (constants.rs:1-9) ---
#: Average Earth-Sun distance in meters (1 astronomical unit).
AU: float = 1.495e11
#: Mass of Earth in kilograms (the mass unit of the simulation).
M0: float = 5.972e24
#: SI gravitational constant, m^3 kg^-1 s^-2.
G_ABS: float = 6.674e-11
#: Gravitational constant rescaled to (AU, Earth-mass, second) units.
G: float = G_ABS * M0 / (AU * AU * AU)

# --- Simulation (constants.rs:10-30) ---
#: Default timestep in seconds per tick (constants.rs:11 `DELTA`).
DELTA: float = 10.0
#: Additive softening used by the reference force law: the denominator is
#: ``r^3 + COLLISION_EPSILON`` (constants.rs:13, sim/mod.rs:25).
COLLISION_EPSILON: float = 1e-15
#: Interval in ticks between exchange checks in the sim loop
#: (constants.rs:20 `CHECK_INTERVAL`).
CHECK_INTERVAL: int = 1
#: Interactive sim loop: maximum ticks the async dispatch queue may run
#: ahead of the last known device->host readback before the sim thread
#: forces a scalar sync. The bound keeps a UI framebuffer transfer from
#: waiting behind an unbounded backlog of enqueued steps, but a PER-TICK
#: sync serializes dispatch with the device round-trip — chip-measured
#: at N=1M (logs/r4w3_r4_engine_auto.log): the PM tick under an
#: actively-sampling frontend ran 696 ms against a 188 ms step, most of
#: it readback/transfer latency. A consumer materializing a snapshot
#: handle (Exchange.sample) drains the queue itself and is credited via
#: Exchange.synced_tick, so an actively-sampled loop normally never pays
#: the sim-thread readback at all; headless/unsampled loops sync every
#: SYNC_EVERY ticks as before.
SYNC_EVERY: int = 8
#: Length of the per-body position trail ring buffer (constants.rs:22-23).
TRAIL_MAX_LENGTH: int = 5
#: Minimum projected size of a rendered body, in clip-space units
#: (constants.rs:24-25).
MIN_CIRCLE_SIZE: float = 0.05
#: Use the tree solver when there are more than this many bodies
#: (constants.rs:27-28, consumed by `spacetpu.sim.make_simulation`).
BARNES_HUT_CUTOFF: int = 1000
#: INTERACTIVE auto-select only (`engine.make_engine_for`): above this
#: many bodies the engine steps with the particle-mesh solver instead of
#: the tree — measured on chip at N=1M: PM 145 ms/step vs tree 364 ms
#: cached-structure tick (logs/r3_pm2.log, logs/r3_engine_tick.log).
#: Accuracy gate: PM force error is mesh-resolution-limited (median
#: ~4e-3 vs exact on random clouds, ops/pm.py docstring) — fine for a
#: live viewer at millions of bodies, NOT for precision rollouts; batch
#: paths (`make_simulation`) keep the reference's tree-iff-N>1000 parity
#: and never switch silently. Frontends surface the active solver via
#: `SimEngine.algorithm` + `Simulation.health()['algorithm']`.
MESH_SOLVER_CUTOFF: int = 500_000
#: Structure-refresh cadence for AUTO-selected tree tiers (pinned
#: solvers keep reference parity 1 = rebuild every tick,
#: barnes_hut/mod.rs:13-14). With the cache the tree wins the accurate
#: tier at EVERY single-chip scale measured — tree vs TreePM(grid=auto):
#: 1M 383.5 vs 644 ms (r5w2), 4M 1890 vs 4018 (r5w8/r5w6), 8M 4129 vs
#: 7109 (r5w9/r5w3), 16M 10,378 vs 20,916 (r5w9/r5w3) — which is why
#: the accurate profile keeps the tree (the round-4 TreePM promotion
#: was based on UNCACHED per-step A/Bs, r4w17, where TreePM does win;
#: pinned --algorithm treepm and the sharded mesh families keep that
#: role). Accuracy at refresh=8 is drift-equivalent (round-3
#: measurement; cluster statistics always track current positions).
INTERACTIVE_TREE_REFRESH: int = 8
#: Mesh-resolution gate for the interactive PM tier: PM is only picked
#: when the would-be mesh cell h resolves the scene's mass
#: concentration, h <= r(MESH_RESOLVE_MASS_FRAC) (the radius around the
#: COM containing that mass fraction). Measured on chip
#: (logs/r4w2_r4_scorecard.log, N=1M grid=128): a quasi-uniform cloud
#: passes (median PM force error ~4e-3) while a Plummer sphere fails
#: catastrophically (median error ~1.0 — the core sits inside a single
#: cell once outliers stretch the box). Gated scenes keep the tree.
MESH_RESOLVE_MASS_FRAC: float = 0.1
#: Finest mesh the interactive tier's grid ladder will climb to when the
#: default grid fails the resolution gate. 256 became viable when the
#: Poisson transform moved to MXU matmuls (ops/fftmm.py): the recursive
#: FFT compile-OOM'd at 512^3, the matmul path steps PM at 228 ms at
#: N=1M (logs/r4w11_r4_fftmm.log) — still ~4x the tree's tick rate, and
#: halving h admits scenes 2x as concentrated before the gate trips.
MESH_INTERACTIVE_GRID_MAX: int = 256
#: Default Barnes-Hut opening angle theta (constants.rs:29-30).
BARNES_HUT_THETA: float = 0.3
#: Opening angle for the interactive AUTO tree tier (make_engine_for when
#: --theta is not given). Our quadrupole far field at theta=0.4 with
#: adaptive clusters measures LOWER med/p90 force error than the
#: reference's monopole octree at its default theta=0.3 on plummer and
#: colliding clouds (med 3.6e-4 vs 1.3e-3; p99 within 1.8x — CPU f64
#: probe vs exact, tools/probes/_theta_parity_probe.py), while the near
#: volume (1+1/theta)^3 is ~1.9x smaller. Pinned solvers (--algorithm
#: tree, --theta given) keep reference parity at 0.3.
INTERACTIVE_TREE_THETA: float = 0.4
#: Mid-run solver re-check cadence for auto-selected MESH engines
#: (make_engine_for wires it into run_sim_loop): every this-many ticks
#: the sim thread re-checks the scene against the running solver
#: (maybe_recalibrate + the mesh gates) and falls back to the tree tier
#: when the calibration is degenerate. Cost per check is one telemetry
#: readback (~one tunnel round trip, i.e. ~0.4% amortized at this
#: cadence on a 150 ms tick); the r4w18 collapse crossed into
#: saturation within 600 steps, so the cadence sits well under that.
ENGINE_RECAL_EVERY: int = 400

# --- Time formatting (sim/mod.rs:129-133) ---
SEC_PER_HOUR: float = 60.0 * 60.0
SEC_PER_DAY: float = SEC_PER_HOUR * 24.0
SEC_PER_YEAR: float = 365.25 * SEC_PER_DAY
