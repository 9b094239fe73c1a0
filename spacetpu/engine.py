"""Asynchronous simulation engine: the sim-thread / UI-thread split.

The reference decouples physics rate from frame rate with a dedicated sim
OS-thread (`/root/reference/space/src/main.rs:83`) running an infinite tick
loop (`event_loop.rs:305-327`) and a lock-light exchange object
(`batch_request.rs:10-63`): a CAS'd should-sample flag, a mutex'd f32
position snapshot, an atomic tick counter and an atomic live-tunable dt.

The TPU-native engine keeps that architecture — it is a good one — but the
"simulation" the thread drives is a single donated jitted step whose
dispatch is already asynchronous, so the thread's job is feeding the device
queue and occasionally (on request) downcasting a position snapshot to f32
for the renderer, exactly the role of BatchRequest::store's f64->f32 copy
(batch_request.rs:43-51).

`run_sim_loop` matches the reference loop's control flow
(CHECK_INTERVAL ticks per exchange poll, dt re-read on publish, stop-token
exit), and `make_engine_for` matches run_sim_loop_erased's N-based
algorithm auto-select (event_loop.rs:329-341).
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spacetpu import constants
from spacetpu.sim import Simulation, make_simulation
from spacetpu.state import State


#: Serializes device dispatch/transfers across host threads. The reference's
#: two OS threads share nothing but BatchRequest; here they share one TPU
#: device queue, and some PJRT transports (remote-tunnelled backends in
#: particular) deadlock on concurrent host->device/device->host transfers
#: from different Python threads. Every device touchpoint in the engine and
#: the viewers takes this lock; dispatch stays async underneath so the sim
#: thread still overlaps compute with the UI thread's rendering. One
#: measured exception: the consumer's snapshot materialization rides under
#: the narrower TRANSFER_LOCK below.
DEVICE_LOCK = threading.RLock()

#: Serializes device->host READBACKS against each other only. The r5
#: overlap probe (benches/r5_overlap_probe.py, logs/r5w2) measured that a
#: consumer's snapshot materialization runs CONCURRENTLY with the sim
#: thread's dispatches without deadlock on the tunneled PJRT backend
#: (steps+rides 250.3 -> 114.2 ms/step, 56% of ride time recovered), so
#: Exchange.sample() rides under this narrower lock instead of
#: DEVICE_LOCK — the sim thread keeps feeding the device queue while the
#: frame rides down. Concurrent transfer+transfer was NOT probed, hence
#: this lock still exists: any host readback outside DEVICE_LOCK must
#: take it. Lock order: DEVICE_LOCK then TRANSFER_LOCK (the sim loop's
#: SYNC_EVERY readback nests that way); never the reverse.
TRANSFER_LOCK = threading.Lock()


class Exchange:
    """Sim <-> UI bridge with BatchRequest's exact surface
    (batch_request.rs:10-63): should_store (CAS), store/sample (snapshot),
    current_ticks, delta/set_delta (live dt)."""

    def __init__(self, n_objects: int, delta: float = constants.DELTA,
                 initial=None):
        # seed the snapshot with the initial positions when given: the
        # frontend's first frame renders before the sim thread's first
        # store, and a zeroed buffer would draw the scene as one dot
        self._sample = (np.array(initial, np.float32, copy=True)
                        if initial is not None
                        else np.zeros((n_objects, 3), np.float32))
        self._lock = threading.Lock()
        self._should_sample = True
        self._tick = 0
        self._delta = delta
        self._pending = None  # (device handle, tick, wire) — store_pending
        # Highest tick through which the device dispatch queue is known
        # drained (a host readback completed for work enqueued at or
        # after that tick). Written by sample()'s materialization and by
        # the sim thread's own SYNC_EVERY scalar readback; read by the
        # sim loop to SKIP that readback while a frontend is actively
        # sampling — the snapshot transfer is itself a queue drain, so
        # the extra round trip (~67 ms/tick amortized at N=1M on the
        # tunneled chip) would be pure overhead.
        self._synced_tick = 0

    # --- dt (batch_request.rs:27-33) ---
    def delta(self) -> float:
        with self._lock:
            return self._delta

    def set_delta(self, value: float):
        # Locked like every other member: the reference gets atomicity from
        # an AtomicU64 bit pattern; relying on the GIL here would break
        # under free-threaded Python.
        with self._lock:
            self._delta = value

    # --- handshake (batch_request.rs:36-58) ---
    def should_store(self) -> bool:
        """CAS the should-sample flag: true at most once per UI request."""
        with self._lock:
            if self._should_sample:
                self._should_sample = False
                return True
            return False

    def store(self, positions, tick: int):
        """Publish an f32 position snapshot + the tick count."""
        snap = np.asarray(positions, np.float32)
        if snap.shape != self._sample.shape:
            raise ValueError(
                f"snapshot shape {snap.shape} != exchange buffer "
                f"{self._sample.shape}; Exchange was sized for a different "
                f"body count"
            )
        with self._lock:
            self._sample[:] = snap
            self._tick = tick

    def store_pending(self, handle, tick: int, wire: str):
        """Publish a DEVICE-side snapshot handle (an on-device copy made
        by the sim thread, decoupled from donated step buffers); the
        consumer's next sample() pays the device->host ride.

        Why: on a tunneled backend ANY device readback costs a full
        round trip (~3.7x the N=1M PM step for a SCALAR —
        constants.SYNC_EVERY's measurement), so a sim thread that
        materializes snapshots inline stalls one round trip per sampled
        tick no matter how small the wire format. Handing the consumer a
        handle moves that stall to the UI thread, which is frame-rate
        bound anyway — the sim thread's dispatch loop never blocks on
        publishing. Latest-wins: an unconsumed handle is replaced."""
        with self._lock:
            self._pending = (handle, tick, wire)

    def sample(self) -> np.ndarray:
        """Retrieve the latest snapshot and request a new one. If the
        sim thread left a device-side handle (store_pending), materialize
        it here, on the consumer's clock.

        Lock order: the exchange lock is NEVER held across the device
        transfer (grab the handle, release, transfer, re-take to
        publish) — the sim thread takes DEVICE_LOCK then this lock, so
        nesting them in the other order would deadlock.

        The ride happens under TRANSFER_LOCK, not DEVICE_LOCK: the r5
        overlap probe measured that the transfer overlaps the sim
        thread's dispatches safely, so blocking the whole device for the
        ride duration (the round-4 behavior — the residual 1.3x sampled
        tick of r4w12) is pure loss. Readbacks still serialize against
        each other through TRANSFER_LOCK."""
        with self._lock:
            pending, self._pending = getattr(self, "_pending", None), None
        if pending is not None:
            handle, tick, wire = pending
            with TRANSFER_LOCK:
                snap = _snapshot_finish(handle, wire)
            self.store(snap, tick)
        with self._lock:
            if pending is not None:
                # materializing the handle drained the dispatch queue up
                # to its capture tick — credit it as a sync so the sim
                # thread can skip its own readback (see note_synced)
                self._synced_tick = max(self._synced_tick, pending[1])
            out = self._sample.copy()
            self._should_sample = True
        return out

    def synced_tick(self) -> int:
        """Latest tick through which a host readback is known to have
        drained the device dispatch queue (consumer materializations and
        sim-thread syncs both count)."""
        with self._lock:
            return self._synced_tick

    def note_synced(self, tick: int):
        """Record a queue-draining host readback at ``tick`` (called by
        the sim thread after its SYNC_EVERY scalar readback)."""
        with self._lock:
            self._synced_tick = max(self._synced_tick, tick)

    def note_ticks(self, tick: int):
        """Publish the loop's tick count WITHOUT a snapshot. The sim loop
        calls this every batch: a frontend that polls progress without
        sampling frames must still see the loop advance (the r5w8 probe
        caught the gap — with no consumer, should_store stays false
        after the first batch, no store ever runs, and current_ticks
        froze at the first batch while the loop ticked on)."""
        with self._lock:
            self._tick = max(self._tick, tick)

    def current_ticks(self) -> int:
        """Tick counter for progress displays. Includes a pending
        device-side snapshot's tick: the sim HAS reached it (the frame
        just hasn't ridden down to the host yet). Kept current even
        without a sampling consumer via note_ticks."""
        with self._lock:
            if self._pending is not None:
                return max(self._tick, self._pending[1])
            return self._tick


#: Snapshot wire formats for the device->host position transfer (the
#: dominant per-sampled-tick cost on a tunneled chip: 12 MB f32 at N=1M).
#: "f32" is the reference-parity full-precision downcast
#: (batch_request.rs:46-50); "u16" quantizes each axis to 16 bits across
#: the scene's bounding box on DEVICE (half the bytes on the wire,
#: decoded back to f32 host-side). Quantization error is <= box/65535 —
#: invisible at whole-scene framing, but a frontend that zooms deep into
#: a subregion sees the grid, so u16 is opt-in, not the default.
SNAPSHOT_WIRES = ("f32", "u16")


@jax.jit
def _snap_f32(pos):
    # astype under jit always materializes a NEW buffer, decoupling the
    # snapshot from the step's donated buffers (the step that follows
    # invalidates `pos` itself).
    return pos.astype(jnp.float32)


@jax.jit
def _snap_u16(pos):
    p = pos.astype(jnp.float32)
    lo = jnp.min(p, axis=0)
    ext = jnp.maximum(jnp.max(p, axis=0) - lo, jnp.finfo(jnp.float32).tiny)
    q = jnp.clip(jnp.round((p - lo) * (65535.0 / ext)), 0.0, 65535.0)
    # params row 0 = lo, row 1 = quantization step
    return q.astype(jnp.uint16), jnp.stack([lo, ext / 65535.0])


def _snapshot_begin(state: State, wire: str):
    """Capture a device-side snapshot of the current positions (cheap: an
    on-device copy/quantize, dispatched async). The returned handle is
    independent of the step loop's donated buffers."""
    if wire == "u16":
        return _snap_u16(state.pos)
    return _snap_f32(state.pos)


def _snapshot_finish(handle, wire: str) -> np.ndarray:
    """Materialize the snapshot on host as (N, 3) f32."""
    if wire == "u16":
        q, params = handle
        params_np = np.asarray(params, np.float32)
        return (np.asarray(q).astype(np.float32) * params_np[1]
                + params_np[0])
    return np.asarray(handle, np.float32)


def _recheck_solver(sim, state, fallback_factory):
    """One mid-run solver re-check (sim loop, under DEVICE_LOCK).

    Returns ``(replacement_sim_or_None, caches_stale)``. Order of
    checks: (1) a calibration already flagged degenerate (a saturated
    TreePM can be degenerate from prime time — the pre-check is a
    host-side estimate); (2) the PM tier's `mesh_resolves` gate
    re-evaluated on the evolved scene; (3) `maybe_recalibrate` for cap
    drift, falling back iff the REBUILT calibration is degenerate —
    r4w18 measured exactly that: a collapsing cluster recalibrating
    into k_near ~= gg twice, step cost doubling, warning unheeded."""
    algo = sim.config.resolved_algorithm()
    reason = None
    if fallback_factory is not None:
        if getattr(sim, "degenerate", None):
            reason = sim.degenerate
        elif algo == "pm":
            grid = (sim.mesh_params or {}).get("grid")
            if grid is not None and not mesh_resolves(state, grid=grid):
                reason = "pm-unresolved"
    recal = False
    if reason is None:
        recal = sim.maybe_recalibrate(state)
        if (recal and fallback_factory is not None
                and getattr(sim, "degenerate", None)):
            reason = sim.degenerate
    if reason is not None:
        new = fallback_factory(reason)
        if new is not None:
            print(f"spacetpu.engine: mid-run solver fallback {algo} -> "
                  f"{new.config.resolved_algorithm()} (reason: {reason})",
                  flush=True)
            return new, True
    return None, recal


def run_sim_loop(
    sim: Simulation,
    state: State,
    exchange: Exchange,
    stop: threading.Event,
    *,
    check_interval: int = constants.CHECK_INTERVAL,
    merge_every: int = 0,
    radii=None,
    on_merge=None,
    snapshot_wire: str = "f32",
    recal_every: int = 0,
    fallback_factory=None,
    on_swap=None,
) -> State:
    """The tick loop (event_loop.rs:305-327): step check_interval ticks,
    publish a snapshot iff the UI asked, re-read dt, exit on the token.

    Snapshot handoff: on a UI request the positions are captured on
    device at the END of the batch (a cheap on-device copy/quantize,
    decoupled from the step's donated buffers) and handed to the
    exchange as a HANDLE; the consumer's next sample() pays the
    device->host ride on its own thread (Exchange.store_pending has the
    measured rationale: on the tunneled backend every readback costs a
    full round trip — ~3.7x the N=1M PM step even for a scalar — so the
    sim thread must never materialize snapshots inline). The sim
    thread's only synchronous readback is the SYNC_EVERY queue bound.

    Mid-run solver-family fallback (round-4 verdict #2): every
    ``recal_every`` ticks (0 = off) the loop re-checks the scene against
    the running solver — `maybe_recalibrate` for cap drift, the
    `mesh_resolves` gate for the PM tier — and when the rebuilt
    calibration is DEGENERATE (`Simulation.degenerate`: a collapsing
    scene saturating TreePM's cutoff was measured live in r4w18,
    step cost climbing 0.85 -> 1.9 s across two futile recalibrations)
    it swaps the whole solver family via ``fallback_factory(reason) ->
    Simulation | None`` instead of continuing to rebuild a degenerate
    config. The swapped-in sim is primed on the current state
    (trajectory-continuous: pos/vel carry over, acc is recomputed) and
    reported through ``on_swap(sim)``. The reference's analogue picks
    the solver per scene exactly once (event_loop.rs:329-341); a
    TPU-sized rollout lives long enough for the scene to change class.
    """
    import time as _time

    if snapshot_wire not in SNAPSHOT_WIRES:
        raise ValueError(f"unknown snapshot wire {snapshot_wire!r}")

    tick = 0
    last_recal_check = 0
    delta = exchange.delta()
    # Cached tree structure across ticks (tree_refresh_every > 1): rebuild
    # the sort/near lists every r ticks, step against the cache in between
    # (cluster statistics always track current positions — the same
    # machinery batch rollouts use, sim._run_tree_cached). At N=1M this
    # removes ~60-85 ms of prep from most ticks.
    refresh = sim.config.tree_refresh_every
    use_cache = (refresh > 1 and
                 sim.config.resolved_algorithm() in ("tree", "treepm"))
    structure = None
    # collision merging (merge_every > 0): check at batch cadence; the
    # merged radii flow back to the renderer via on_merge
    radii_dev = None
    last_merge_tick = 0
    if merge_every and radii is not None:
        import jax.numpy as jnp

        radii_dev = jnp.asarray(radii, state.pos.dtype)
    with DEVICE_LOCK:
        state = sim.prime(state)
    while True:
        with DEVICE_LOCK:
            for _ in range(check_interval):
                if use_cache:
                    if structure is None or tick % refresh == 0:
                        structure = sim.build_structure(state)
                    state = sim.step_cached(state, structure, delta)
                else:
                    state = sim.step(state, delta)
                tick += 1
            if radii_dev is not None and tick - last_merge_tick >= merge_every:
                from spacetpu.ops import collisions

                last_merge_tick = tick
                state, radii_dev, k, _ = collisions.merge_all_overlapping(
                    state, radii_dev)
                if k:
                    state = sim.prime(state)  # merged rows' acc was zeroed
                    structure = None  # cached tree structure is stale too
                    if on_merge is not None:
                        on_merge(np.asarray(radii_dev, np.float32))
            # Queue bound: if nothing has drained the async dispatch
            # queue for SYNC_EVERY ticks, pay one scalar readback (so a
            # later framebuffer transfer from the UI thread never sits
            # behind an unbounded backlog of enqueued steps). A frontend
            # that samples at frame rate drains the queue through its own
            # snapshot materializations (Exchange.sample credits them),
            # so the interactive path normally never pays this — on the
            # tunneled chip the round trip costs ~3.7x the N=1M PM step
            # even for a scalar (constants.SYNC_EVERY has the numbers).
            if recal_every and tick - last_recal_check >= recal_every:
                last_recal_check = tick
                new_sim, stale = _recheck_solver(sim, state,
                                                 fallback_factory)
                if new_sim is not None:
                    sim = new_sim
                    state = sim.prime(state)
                    refresh = sim.config.tree_refresh_every
                    use_cache = (refresh > 1 and
                                 sim.config.resolved_algorithm()
                                 in ("tree", "treepm"))
                    if on_swap is not None:
                        on_swap(sim)
                if stale:
                    structure = None  # recal/swap staled the cached tree
            if tick - exchange.synced_tick() >= constants.SYNC_EVERY:
                # TRANSFER_LOCK inside DEVICE_LOCK (documented order):
                # this scalar readback must not run concurrently with a
                # consumer's lock-free snapshot ride.
                with TRANSFER_LOCK:
                    np.asarray(state.pos[0, 0])
                exchange.note_synced(tick)
            if exchange.should_store():
                # capture the post-batch positions on device (cheap async
                # copy/quantize) and hand the HANDLE to the exchange; the
                # consumer's sample() pays the device->host round trip
                exchange.store_pending(
                    _snapshot_begin(state, snapshot_wire), tick,
                    snapshot_wire)
            # progress telemetry advances every batch, sampled or not
            exchange.note_ticks(tick)
        # Re-read dt every batch (one locked attribute read), not only on
        # publish: a headless caller or a frontend that is not actively
        # sampling must still be able to retune dt via set_delta().
        delta = exchange.delta()
        # Unlike the reference (which checks its token only when no sample
        # is pending, event_loop.rs:322-324), the stop token is honoured
        # unconditionally — a frontend that keeps sampling must not be able
        # to keep the sim thread alive past stop().
        if stop.is_set():
            break
        # Give the UI thread a fair shot at DEVICE_LOCK between batches.
        _time.sleep(0)
    return state


class SimEngine:
    """Owns the sim thread + exchange; the analogue of what main.rs:78-95
    wires up by hand (spawn, stop token, join)."""

    def __init__(self, sim: Simulation, state: State, *,
                 delta: float = constants.DELTA,
                 check_interval: int = constants.CHECK_INTERVAL,
                 merge_every: int = 0, radii=None,
                 snapshot_wire: str = "f32",
                 recal_every: int = 0,
                 fallback_factory=None):
        self.sim = sim
        self._snapshot_wire = snapshot_wire
        self._recal_every = recal_every
        self._fallback_factory = fallback_factory
        self.exchange = Exchange(state.n, delta,
                                 initial=np.asarray(state.pos, np.float32))
        self._merge_every = merge_every
        self._radii0 = radii
        #: latest post-merge radii (np.float32), swapped atomically by the
        #: sim thread; frontends re-read it each frame when merging is on
        self.radii_snapshot = (None if radii is None
                               else np.asarray(radii, np.float32))
        self._stop = threading.Event()
        self._state0 = state
        self.final_state: Optional[State] = None
        #: exception that killed the sim thread, if any — the failure-
        #: detection surface (the reference's closest analogue is the GPU
        #: surface-lost/OOM recovery, surface.rs:55-70; a compute fault on
        #: TPU is not recoverable in place, so it is captured and surfaced
        #: to the frontend instead of dying silently).
        self.error: Optional[BaseException] = None
        self._check_interval = check_interval
        self._thread: Optional[threading.Thread] = None

    def start(self):
        def run():
            try:
                def on_merge(radii_np):
                    self.radii_snapshot = radii_np  # atomic reference swap

                def on_swap(new_sim):
                    # atomic reference swap: .algorithm/frontends read it
                    self.sim = new_sim

                self.final_state = run_sim_loop(
                    self.sim, self._state0, self.exchange, self._stop,
                    check_interval=self._check_interval,
                    merge_every=self._merge_every, radii=self._radii0,
                    on_merge=on_merge, snapshot_wire=self._snapshot_wire,
                    recal_every=self._recal_every,
                    fallback_factory=self._fallback_factory,
                    on_swap=on_swap,
                )
            except BaseException as e:  # noqa: BLE001 - surfaced to the UI
                self.error = e

        self._thread = threading.Thread(target=run, name="sim", daemon=True)
        self._thread.start()

    @property
    def algorithm(self) -> str:
        """The solver actually ticking (telemetry for frontends/logs —
        auto-select may have picked a mesh solver, and the mid-run
        fallback may have swapped families since; self.sim is re-pointed
        atomically by the sim thread on a swap)."""
        return self.sim.config.resolved_algorithm()

    def check_health(self):
        """Raise the sim thread's exception in the caller, if it died."""
        if self.error is not None:
            raise RuntimeError("simulation thread failed") from self.error

    def stop(self, timeout: float = 30.0):
        """Set the stop token and join (main.rs:92-95)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()


def _scene_geometry(scene_state: State, grid: int, margin: float,
                    frac: float, weight: str = "mass"):
    """Host-side (pure numpy) scene shape summary shared by the solver
    gates: (cell size h the mesh would pick, radius around the COM
    containing `frac` of the mass — weight="mass" — or of the BODIES —
    weight="count"). Mass weighting suits the mesh-accuracy gate (where
    does the force-generating mass sit); count weighting suits the
    saturation gate (near-list sizes follow body density: fixed_cloud's
    single 1e7-mass center would put the half-MASS radius at zero while
    its measured near cap is a healthy 502 of 3922, r4w17). Returns
    None for massless scenes."""
    import numpy as np

    pos = np.asarray(scene_state.pos, np.float64)
    mass = np.asarray(scene_state.mass, np.float64)
    if scene_state.n_active is not None:
        k = int(scene_state.n_active)
        pos, mass = pos[:k], mass[:k]
    lo, hi = pos.min(axis=0), pos.max(axis=0)
    half = max(0.5 * float((hi - lo).max()) * margin, 1e-30)
    h = 2.0 * half / (grid - 1)  # matches pm.measure_box
    m_tot = float(mass.sum())
    if m_tot <= 0.0:
        return None
    com = (mass[:, None] * pos).sum(axis=0) / m_tot
    r = np.linalg.norm(pos - com, axis=1)
    w = mass if weight == "mass" else np.ones_like(mass)
    order = np.argsort(r)
    csum = np.cumsum(w[order])
    i = int(np.searchsorted(csum, frac * float(w.sum())))
    r_frac = float(r[order[min(i, len(r) - 1)]])
    return h, r_frac


def mesh_resolves(scene_state: State, *, grid: Optional[int] = None,
                  mass_frac: float = constants.MESH_RESOLVE_MASS_FRAC,
                  margin: float = 2.0) -> bool:
    """Does a PM mesh at `grid` resolve this scene's mass concentration?

    Host-side check (pure numpy, no device work): the cell size h that
    pm.measure_box would pick must not exceed the radius around the
    center of mass containing `mass_frac` of the total mass. Chip
    measurement behind the rule (logs/r4w2_r4_scorecard.log, N=1M,
    grid=128): a quasi-uniform cloud (h ~ 0.07 r_frac) shows median PM
    force error ~e-3; a Plummer sphere (h ~ 20 r_frac — halo outliers
    stretch the box until the entire core sits inside a couple of
    cells) shows median error ~1.0, so the interactive mesh tier must
    NOT engage there."""
    from spacetpu.ops import pm as pm_ops

    if grid is None:
        grid = pm_ops.default_grid(scene_state.n)
    geom = _scene_geometry(scene_state, grid, margin, mass_frac)
    if geom is None:
        return False
    h, r_frac = geom
    return h <= r_frac


def treepm_saturates(scene_state: State, *, grid: Optional[int] = None,
                     margin: float = 2.0) -> bool:
    """Would TreePM's short-range cutoff cover ~the whole mass of this
    scene? Host-side pre-check mirroring the post-calibration saturation
    warning (sim._calibrate_treepm: measured k_near >= gg/2): when the
    radius holding half the mass sits INSIDE r_cut = rcut_rs * rs_cells
    * h, the cutoff near pass degenerates to all-pairs cost (measured
    16.5 s/step at N=1M, logs/r4w2_r4_scorecard.log; r4w18 watched a
    collapsing cluster cross this live). Used by the auto-select's
    accuracy tier to keep clumpy scenes on the tree without paying a
    full TreePM calibration to find out."""
    from spacetpu.ops import treepm as treepm_ops

    if grid is None:
        grid = treepm_ops.default_grid(scene_state.n)
    geom = _scene_geometry(scene_state, grid, margin, frac=0.5,
                           weight="count")
    if geom is None:
        return True  # massless: no mesh source at all
    h, r_half = geom
    rs, rcut = treepm_ops.split_params(h, rs_cells=treepm_ops.RS_CELLS,
                                       rcut_rs=treepm_ops.RCUT_RS)
    return rcut >= r_half


def resolve_interactive_theta(theta: Optional[float],
                              softening: str = "plummer",
                              multipole_order="auto") -> float:
    """The theta the auto tree tier will actually run. theta=None maps
    to constants.INTERACTIVE_TREE_THETA (0.4) ONLY when the simulation
    will run order-2 multipoles — the accuracy probe that justified 0.4
    (constants.INTERACTIVE_TREE_THETA docstring) measured the
    quadrupole far field; monopole at a wider theta is strictly worse
    than reference parity, so configs resolving to monopole (softening
    != 'plummer' under multipole_order='auto') keep BARNES_HUT_THETA
    (0.3). Exposed so callers probing engine behaviour (main.py's
    --substeps auto probe) measure the SAME solver configuration the
    engine ticks."""
    if theta is not None:
        return theta
    order = (2 if softening == "plummer" else 1) \
        if multipole_order == "auto" else int(multipole_order)
    return (constants.INTERACTIVE_TREE_THETA if order >= 2
            else constants.BARNES_HUT_THETA)


def select_solver(scene_state: State, *, profile: str = "interactive",
                  cutoff: int = constants.BARNES_HUT_CUTOFF,
                  substeps: int = 1) -> tuple[str, dict]:
    """The auto-select policy as a pure function of the scene: returns
    ``(algorithm, extra_sim_kwargs)``. Shared by `make_engine_for` and
    the headless --profile accurate path (main.run_headless) so both
    surfaces apply identical gates. Tiers above
    constants.MESH_SOLVER_CUTOFF (multirate requests always keep the
    tree — the mesh-softened force law is inconsistent with the exact
    pair substeps):

    - interactive: PM on a mesh_resolves grid ladder (display-grade,
      fastest tick);
    - accurate: TreePM at its default grid when the mesh resolves AND
      the cutoff doesn't saturate (treepm_saturates).

    Below the mesh cutoff: the reference's tree-iff-N>cutoff parity
    (event_loop.rs:334-341)."""
    if profile not in ("interactive", "accurate"):
        raise ValueError(f"unknown profile {profile!r}")
    n = scene_state.n
    if (n > constants.MESH_SOLVER_CUTOFF
            and not (isinstance(substeps, int) and substeps > 1)):
        if profile == "accurate":
            # The accurate tier keeps the structure-cached tree: it beats
            # TreePM at every single-chip scale measured (1M/4M/8M/16M —
            # constants.INTERACTIVE_TREE_REFRESH has the numbers) at ~7x
            # better med force error (6e-5 vs 4e-4). TreePM remains the
            # pinned/sharded/mesh-scaling family (--algorithm treepm).
            pass
        else:
            # Grid ladder: try the default grid, then the finer tiers
            # the matmul-DFT transform unlocked (r4w11: grid=256
            # compiles and steps at 228 ms at N=1M — still ~4x the
            # tree's tick rate) — halving h admits scenes twice as
            # concentrated before the accuracy gate trips.
            from spacetpu.ops import pm as pm_ops

            ladder = sorted({pm_ops.default_grid(n),
                             constants.MESH_INTERACTIVE_GRID_MAX})
            for grid_c in ladder:
                if mesh_resolves(scene_state, grid=grid_c):
                    return "pm", {"pm_grid": grid_c}
    return ("tree" if n > cutoff else "direct"), {}


def make_engine_for(
    scene_state: State,
    *,
    delta: float = constants.DELTA,
    cutoff: int = constants.BARNES_HUT_CUTOFF,
    theta: Optional[float] = None,
    profile: str = "interactive",
    engine_kwargs: Optional[dict] = None,
    **sim_kwargs,
) -> SimEngine:
    """Algorithm auto-select by N, matching run_sim_loop_erased
    (event_loop.rs:329-341): tree (theta=BARNES_HUT_COEFF) iff N > cutoff,
    else brute force — extended with mesh-solver tiers the reference
    never needed (its CPU tree tops out far below 1M bodies). Above
    constants.MESH_SOLVER_CUTOFF the tier depends on `profile`:

    - ``"interactive"`` (default): the PM solver (111 ms/step at N=1M
      grid=128 on chip vs 861 ms for the tree, logs/r4w18; tick-rate
      2.68x the pinned tree, r4w21) — display-grade forces, med err
      ~1.5e-2. Engages only when the mesh resolves the scene
      (`mesh_resolves`; a Plummer core inside one cell measured median
      force error ~1.0 on chip, logs/r4w2_r4_scorecard.log — such
      scenes keep the tree).
    - ``"accurate"``: the structure-cached tree (refresh cadence
      constants.INTERACTIVE_TREE_REFRESH), med force err ~6e-5. The
      round-4 TreePM promotion was reversed by engine-level chip A/Bs:
      with the cache the tree wins at EVERY single-chip scale (1M
      383.5 vs 644 ms/tick, 4M 1.9 vs 4.0 s, 8M 4.1 vs 7.1, 16M 10.4
      vs 20.9 — r5w2/r5w8/r5w9 vs the treepm ladder; the r4w17
      per-step wins only hold UNCACHED). Pin --algorithm treepm for
      the mesh-split family (sharded scaling, uncached rollouts).

    Pass algorithm= explicitly (build_engine does for --algorithm) to
    pin a solver. The active solver is surfaced via SimEngine.algorithm
    and Simulation.health()['algorithm']. engine_kwargs are forwarded
    to SimEngine (merge_every/radii for collision merging,
    snapshot_wire).

    theta=None resolves via `resolve_interactive_theta`: 0.4 with the
    quadrupole far field (measured LOWER med/p90 force error than the
    reference's monopole octree at its own 0.3 default for ~1.9x less
    near work; chip tick 2225.5 vs 2992 ms at N=1M plummer, r4w21),
    reference-parity 0.3 for monopole configs.

    Mid-run fallback: the engine re-checks the scene every
    constants.ENGINE_RECAL_EVERY ticks and swaps to the tree tier if
    the running mesh solver degrades out of its regime (a collapsing
    scene saturating TreePM, or PM's mesh gate flipping false) — see
    run_sim_loop. The fallback tree runs at theta >= 0.5: the swap
    happens on scenes measured concentrated, where theta < 0.5 risks
    the dense-near worker-fault shape (BENCH_NOTES 'Known issue') and
    0.5 has a chip-measured bound (med err 5.6e-5 on plummer(1M),
    logs/r4w10)."""
    n = scene_state.n
    theta = resolve_interactive_theta(
        theta, softening=sim_kwargs.get("softening", "plummer"),
        multipole_order=sim_kwargs.get("multipole_order", "auto"))
    algorithm, extra = select_solver(
        scene_state, profile=profile, cutoff=cutoff,
        substeps=sim_kwargs.get("substeps", 1))
    sim_kwargs = dict(sim_kwargs, **extra)
    if not sim_kwargs.get("tree_refresh_every"):
        # auto tiers run the measured cadence (pinned solvers built via
        # make_simulation directly keep reference parity 1); applies to
        # the selected tree AND the mid-run fallback target below
        sim_kwargs["tree_refresh_every"] =             constants.INTERACTIVE_TREE_REFRESH
    if algorithm != "tree":
        # theta is a tree knob; make_simulation rejects unknown kwargs
        # for other solvers only via config validation, but keep the call
        # honest either way
        sim = make_simulation(n, algorithm=algorithm, **sim_kwargs)
    else:
        sim = make_simulation(n, algorithm=algorithm, theta=theta,
                              **sim_kwargs)
    engine_kwargs = dict(engine_kwargs or {})
    if algorithm in ("pm", "treepm"):
        # the mesh tiers get the mid-run family fallback; the tree IS
        # the fallback target and the direct solver has no failure mode
        tree_kwargs = {k: v for k, v in sim_kwargs.items()
                       if k not in ("pm_grid",)}
        fb_theta = max(theta, 0.5)

        def fallback_factory(reason, _n=n, _kw=tree_kwargs,
                             _th=fb_theta):
            return make_simulation(_n, algorithm="tree", theta=_th,
                                   **_kw)

        engine_kwargs.setdefault("recal_every",
                                 constants.ENGINE_RECAL_EVERY)
        engine_kwargs.setdefault("fallback_factory", fallback_factory)
    return SimEngine(sim, scene_state, delta=delta, **engine_kwargs)
