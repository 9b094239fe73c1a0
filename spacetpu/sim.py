"""Simulation façade: configure a solver, get a jitted step/rollout.

The TPU-native analogue of the reference's `SimulationImpl` trait +
`ObjectBuffer` (`/root/reference/space/src/sim/mod.rs:40-127`) and the
brute-force/Barnes-Hut auto-selection in `run_sim_loop_erased`
(`event_loop.rs:329-341`). Instead of trait objects and a rayon pool, a
`Simulation` binds a force backend (XLA broadcast / Pallas tiled / clustered
tree / multi-chip ring) to an integrator and returns jitted, donatable
functions:

  sim = make_simulation(n=..., algorithm="auto", backend="auto")
  state = sim.prime(state)            # populate the acc cache
  state = sim.step(state, dt)         # one tick
  state = sim.run(state, dt, steps)   # lax.scan rollout, one device program

``step`` is compiled once per (shape, dtype); dt is a traced argument so
live dt tuning (reference: `batch_request.rs:31-33`) never recompiles.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from spacetpu import constants
from spacetpu.ops import direct, integrators
from spacetpu.state import State

ALGORITHMS = ("auto", "direct", "tree", "pm", "treepm")
BACKENDS = ("auto", "xla", "pallas")

#: Host-side rollout chunking (see Simulation.run). The axon TPU runtime
#: faults when a lax.scan whose body is the tree step with DENSE near tile
#: lists reaches length ~25 (BENCH_NOTES "Known issue": not wall time, not
#: launch count, not top_k — specifically outer-scan x dense-k). run()
#: therefore splits long rollouts into shorter device scans: a
#: conservatively safe length when the calibrated near lists are dense,
#: and a default chunk otherwise (chunking costs one dispatch per chunk —
#: sub-ms against multi-second tree scans).
SAFE_DENSE_SCAN = 16
#: measured k_near above this counts as "dense" (crash observed at
#: k=3922 and k~2000; k=512 and k=496 are clean through run(150))
DENSE_K_NEAR = 512
#: near-pair tile count above which even SAFE_DENSE_SCAN faults (r3
#: bisect2: plummer 1M equal/far3, k=3968, 2.39e6 tiles crashed inside
#: 16-step scans while adaptive's 3.58e5 tiles ran 100 steps clean) —
#: degrade to single-step dispatches, which the round-2 isolation matrix
#: showed always succeed (25x step() at the same caps: ok).
DENSE_TILES_SINGLE_STEP = 1_000_000
#: default host chunk for TPU rollouts (matches the pre-round-3
#: run_headless behavior; long-proven through the 10k-step endurance run)
DEFAULT_RUN_CHUNK = 100


def _platform() -> str:
    return jax.devices()[0].platform


def default_backend() -> str:
    """Pallas kernels on TPU; plain XLA elsewhere (CPU tests/virtual mesh).

    LOAD-BEARING ASSUMPTION (engine.Exchange's sync credit): every
    backend this selects executes its per-device dispatch queue
    IN ORDER — a host readback of a buffer captured at tick T implies
    all work enqueued up to T has drained. True for current PJRT
    TPU/CPU streams. A future out-of-order or multi-stream backend
    would silently unbound the sim loop's dispatch queue (the
    SYNC_EVERY fallback in run_sim_loop caps the damage to
    constants.SYNC_EVERY ticks, but the UI-latency bound assumes the
    stronger property). If such a backend lands, revisit
    Exchange.sample()/note_synced."""
    return "pallas" if _platform() == "tpu" else "xla"


@dataclasses.dataclass(frozen=True)
class SimConfig:
    n: int
    algorithm: str = "auto"  # direct | tree | auto (N-based, event_loop.rs:334-340)
    backend: str = "auto"  # pallas | xla | auto (platform-based)
    integrator: str = "leapfrog"  # leapfrog | euler (ref-compatible) | yoshida4
    softening: str = "plummer"  # plummer | ref (reference-compatible)
    eps: float | None = None  # None -> COLLISION_EPSILON for "ref", 0 for plummer
    g: float = constants.G
    theta: float = constants.BARNES_HUT_THETA
    chunk: int | None = None  # i-chunk for the XLA path (None = dense)
    # direct-solver Pallas kernel variant: "vpu" (exact pairwise
    # differences, fully vector-unit-bound — the default) or "mxu"
    # (expanded-form distances + force accumulation as systolic-array
    # matmuls, ops/pallas_direct._kernel_mxu; requires plummer softening
    # with eps > 0). Chip A/B (logs/r5w3_r5_direct_mxu.log, N=256k):
    # vpu 1.67e11 pairs/s at med rel err 1.3e-7; mxu 6.0e10 (2.8x
    # SLOWER — f32-faithful MXU needs the 6-pass HIGHEST emulation and
    # the K=8 / width-8 matmuls pad 16x on the 128-lane array) at med
    # rel err 4.8e-6. The knob also routes the tree/treepm near-pair
    # accumulation through the hybrid kernels (tree._kernel_pairs_hybrid);
    # chip A/B logs/r5w5_r5_pairs_mxu.log: tree 0.68x, treepm 0.81x —
    # same width-8/HIGHEST padding economics, same verdict. vpu is the
    # measured speed of light for the pair pipeline on this hardware.
    pallas_method: str = "vpu"
    # tree far-field order: 1 = monopole, 2 = +quadrupole, "auto" = 2 for
    # plummer softening (5-10x force accuracy for ~20% cost), 1 for "ref"
    multipole_order: object = "auto"
    # tree near-list cap: None = geometric default (fast, can truncate on
    # high-density-contrast scenes — overflow telemetry reports it);
    # "auto" = measure the scene's true max near count at prime() time
    # (accuracy-safe on any mass distribution, costs a calibration pass
    # and possibly a larger near phase); int = explicit.
    k_near: object = None
    # rollout-only optimization: reuse the tree's sort + near lists for this
    # many steps inside run() (stats always track current positions).
    # 1 = rebuild every step (reference parity, barnes_hut/mod.rs:13-14).
    tree_refresh_every: int = 1
    # tree clustering: bodies per leaf cluster ("auto" = tree.LEAF) and the
    # partition mode — "equal" (round-1 equal-count runs) or "adaptive"
    # (density-bounded octree-cell runs, the high-density-contrast fix;
    # see ops/cluster.py). "auto" currently resolves to "equal".
    leaf: object = "auto"
    cluster_mode: str = "auto"
    # tree far-field levels: 2 (dense cluster multipoles) | 3
    # (supercluster multipoles + refinement, auto above FAR3_CUTOFF
    # clusters) | "auto". Exposed mainly for A/B accuracy/perf bisects.
    far_levels: object = "auto"
    # near-phase evaluation: "strip" (static per-cluster cap) or "pairs"
    # (flattened tile list — cost tracks the actual near-pair count;
    # calibrated capacities when k_near="auto"). "auto" -> "pairs": always
    # at least as fast on TPU (measured theta=0.5 quad: fixed_cloud(1M)
    # 948 -> 405 ms/step, plummer_sphere(300k) 618 -> 519) and its HBM
    # stays O(actual pairs) where dense strip gathers OOM.
    near_mode: str = "auto"
    # max device-side scan length per run() call (None = auto: a safe
    # length when the calibrated near lists are dense — the escape hatch
    # for the scan x dense-k TPU runtime fault; see SAFE_DENSE_SCAN).
    run_chunk: int | None = None
    # two-level multirate leapfrog (ops/multirate.py): the `fast_cap`
    # bodies with the smallest dynamical time take `substeps` KDK substeps
    # per outer dt via rectangular (exact) force passes — with the tree
    # solver, the outer full pass stays tree-approximate while the fast
    # set's substep forces are exact all-pairs rows. Leapfrog only.
    substeps: int = 1
    fast_cap: object = "auto"  # "auto" = max(128, ~N/8 rounded to 128)
    # particle-mesh solver (algorithm="pm", ops/pm.py): mesh size per axis
    # ("auto" = ~N^(1/3) clamped to [32, 128]) and the bounding-box margin
    # measured at prime time (evolving scenes get headroom before bodies
    # hit the faces; out-of-box deposit is clamped + counted by health()).
    pm_grid: object = "auto"
    pm_margin: float = 2.0
    # TreePM split (algorithm="treepm", ops/treepm.py): Gaussian split
    # scale in mesh cells (rs = pm_rs_cells * h) and the short-range
    # cutoff in split scales (r_cut = pm_rcut_rs * rs). None = module
    # defaults (RS_CELLS measured against the exact force: 1.75 cells
    # halves the p99 error of the Gadget-classic 1.25 for ~2.7x the —
    # still tiny — pair volume; RCUT_RS = 4.5, erfc tail ~1.5e-3).
    pm_rs_cells: float | None = None
    pm_rcut_rs: float | None = None
    # Split family: "poly" (quintic blend — closed-form mesh kernel,
    # ~8-op pair kernel, zero truncation tail; round-4 default) or
    # "gauss" (classic erf/Ewald split). None = treepm.SPLIT.
    pm_split: str | None = None

    def resolved_leaf(self) -> int:
        from spacetpu.ops import tree as tree_ops

        return tree_ops.LEAF if self.leaf == "auto" else int(self.leaf)

    def resolved_cluster_mode(self) -> str:
        # "auto" starts from "equal"; calibrate() upgrades to "adaptive"
        # when the measured near lists are heavy-tailed AND the adaptive
        # partition measurably shrinks the near work (Simulation passes its
        # calibrated choice through _build_acc_fn explicitly).
        return "equal" if self.cluster_mode == "auto" else self.cluster_mode

    def resolved_near_mode(self) -> str:
        if self.near_mode != "auto":
            return self.near_mode
        # pairs on the Pallas/TPU path only: the XLA fallback evaluates the
        # tile list with lax.map, whose compile time degenerates at large G
        # on CPU (16M demo: >25 min in XLA vs minutes for strip).
        return "pairs" if self.resolved_backend() == "pallas" else "strip"

    def resolved_multipole_order(self) -> int:
        if self.multipole_order == "auto":
            return 2 if self.softening == "plummer" else 1
        return int(self.multipole_order)

    def resolved_algorithm(self) -> str:
        if self.algorithm != "auto":
            return self.algorithm
        # Matches the reference cutoff: tree iff N > BARNES_HUT_CUTOFF
        # (event_loop.rs:334-340) — though the crossover on TPU is far
        # higher; "auto" keeps behavioural parity, pass algorithm="direct"
        # to force the all-pairs kernel.
        return "tree" if self.n > constants.BARNES_HUT_CUTOFF else "direct"

    def resolved_backend(self) -> str:
        return default_backend() if self.backend == "auto" else self.backend

    def resolved_eps(self) -> float:
        if self.eps is not None:
            return self.eps
        return constants.COLLISION_EPSILON if self.softening == "ref" else 0.0

    def resolved_fast_cap(self) -> int:
        if self.fast_cap == "auto":
            return min(self.n, max(128, -(-(self.n // 8) // 128) * 128))
        return min(self.n, int(self.fast_cap))

    def resolved_pm_grid(self) -> int:
        if self.pm_grid == "auto":
            if self.resolved_algorithm() == "treepm":
                # TreePM wants a finer mesh: its accuracy comes from the
                # split, so the grid is a pure short-vs-long work dial
                from spacetpu.ops import treepm as treepm_ops

                return treepm_ops.default_grid(self.n)
            from spacetpu.ops import pm as pm_ops

            return pm_ops.default_grid(self.n)
        return int(self.pm_grid)

    def resolved_split(self) -> tuple[float, float]:
        """(rs_cells, rcut_rs) for the TreePM force split."""
        from spacetpu.ops import treepm as treepm_ops

        rs_cells = (treepm_ops.RS_CELLS if self.pm_rs_cells is None
                    else float(self.pm_rs_cells))
        rcut_rs = (treepm_ops.RCUT_RS if self.pm_rcut_rs is None
                   else float(self.pm_rcut_rs))
        return rs_cells, rcut_rs

    def resolved_treepm_split(self) -> str:
        from spacetpu.ops import treepm as treepm_ops

        split = (treepm_ops.SPLIT if self.pm_split is None
                 else str(self.pm_split))
        if split not in ("poly", "gauss"):
            raise ValueError(f"unknown treepm split {split!r}")
        return split


class Simulation:
    """Bound (force backend, integrator) pair with jitted step/run."""

    def __init__(self, config: SimConfig):
        self.config = config
        #: resolved near-list cap (None = acc_tree's geometric default);
        #: "auto" is measured from the first primed state (calibrate()).
        self._k_near: int | None = (
            config.k_near if isinstance(config.k_near, int) else None
        )
        #: measured static sizes (calibrate()): cluster-count cap and the
        #: pair-mode tile capacities; None = worst-case defaults.
        self._gg: int | None = None
        self._near_tiles: int | None = None
        self._near_tiles_q: int | None = None
        self._k_super: int | None = None
        self._k_mid: int | None = None
        self._m1_src: int | None = None
        self._m2_src: int | None = None
        #: calibrated clustering choice for cluster_mode="auto" (None until
        #: calibrate() has compared the measured partitions).
        self._cluster_mode: str | None = None
        #: set by calibrate() when the measured configuration is
        #: DEGENERATE for this solver family — the caps are valid but the
        #: solver is outside its efficiency/safety regime and a caller
        #: that can switch families should (the engine's mid-run fallback
        #: and the scorecard act on this). Values: None (healthy),
        #: "treepm-saturated" (k_near ~ gg: the cutoff covers the scene,
        #: pair pass degenerates to all-pairs cost — r4w18 measured the
        #: step climbing 0.85 -> 1.9 s as a collapsing cluster crossed
        #: this), "tree-dense-near" (measured k_near ~ gg on the TREE:
        #: the twice-crashed r4w6 worker-fault shape).
        self.degenerate: str | None = None
        #: PM calibration products (algorithm="pm"): box_min/h/kernel_hat.
        self._pm: dict | None = None
        # pairs/adaptive modes want measured capacities (they run with
        # worst-case caps otherwise); k_near="auto" always calibrates.
        # The PM solver always calibrates: its mesh box + FFT'd kernel
        # come from the primed state's bounding box.
        self._needs_calibration = (
            config.resolved_algorithm() == "tree"
            and (
                config.k_near == "auto"
                or config.resolved_near_mode() == "pairs"
                or config.resolved_cluster_mode() == "adaptive"
            )
        ) or config.resolved_algorithm() in ("pm", "treepm")
        if config.substeps > 1 and config.integrator != "leapfrog":
            raise ValueError(
                "substeps > 1 is a leapfrog composition "
                f"(got integrator={config.integrator!r})"
            )
        if config.substeps > 1 and config.resolved_algorithm() == "pm":
            raise ValueError(
                "substeps > 1 is unsupported with algorithm='pm': the "
                "multirate fast-set substeps use exact pair forces, which "
                "are inconsistent with the mesh-softened PM force law"
            )
        if config.pallas_method not in ("vpu", "mxu"):
            raise ValueError(
                f"unknown pallas_method {config.pallas_method!r} "
                "(want 'vpu' or 'mxu')"
            )
        if (config.pallas_method == "mxu"
                and config.resolved_algorithm() == "direct"
                and config.resolved_backend() == "pallas"
                and (config.softening != "plummer"
                     or config.resolved_eps() <= 0.0)):
            raise ValueError(
                "pallas_method='mxu' requires softening='plummer' with "
                "eps > 0: the expanded-form distances are cancellation "
                "noise on the diagonal, so a real softening floor is the "
                "self-pair guard (ops/pallas_direct.acc_cross_pallas)"
            )
        #: Large device arrays threaded through the jitted entry points
        #: as ARGUMENTS (a dict pytree; empty for non-mesh solvers).
        #: Closure constants inline into the serialized HLO as literals:
        #: a grid=256 TreePM kernel_hat is 269 MB of program text, which
        #: overflows compile-RPC payload limits (HTTP 413 on the axon
        #: tunnel) and bloats every re-trace. `_acc_builder` rebinds the
        #: force closure over the TRACED consts inside each jit.
        self._jit_consts: dict = {}
        self._acc_builder = None
        #: bumped by every _build_jits (i.e. every [re]calibration).
        #: External jits that embed traced_step pass this as a STATIC
        #: argument so a recalibration forces their retrace (jit caches
        #: on shapes only; see _build_jits).
        self.jit_epoch: int = 0
        self.acc_fn = _build_acc_fn(config, self._k_near)
        self._stepper = self._make_stepper()
        self._build_jits()

    def _make_stepper(self):
        cfg = self.config
        if cfg.substeps > 1:
            from spacetpu.ops import multirate

            def stepper(state, dt, acc_fn):
                return multirate.step_multirate(
                    state, dt, acc_fn, substeps=cfg.substeps,
                    fast_cap=cfg.resolved_fast_cap(),
                    softening=cfg.softening, eps=cfg.resolved_eps(), g=cfg.g,
                    backend=cfg.resolved_backend(),
                )

            return stepper
        return integrators.get_stepper(cfg.integrator)

    def _build_jits(self):
        """(Re)wrap the jitted entry points. Must run after every
        acc_fn swap (calibrate): jit caches compiled traces by input
        shapes only, so a re-calibration that changes the baked-in caps
        would otherwise silently keep dispatching the stale closure.

        Each jit takes `self._jit_consts` as a trailing argument (the
        public signatures hide it) so the PM/TreePM kernel tables enter
        the program as parameters, not HLO literals."""
        self.jit_epoch += 1
        step_jit = jax.jit(self._step, donate_argnums=(0,))
        self.step = lambda state, dt: step_jit(state, dt, self._jit_consts)
        prime_jit = jax.jit(self._prime, donate_argnums=(0,))
        self._prime_jit = lambda state: prime_jit(state, self._jit_consts)
        run_jit = jax.jit(
            self._run, static_argnames=("steps",), donate_argnums=(0,)
        )
        self._run_jit = lambda state, dt, steps: run_jit(
            state, dt, steps, self._jit_consts
        )
        #: interactive-engine structure cache (tree_refresh_every > 1):
        #: build once every r ticks, step against it in between.
        self.build_structure = jax.jit(self._build_structure)
        step_cached_jit = jax.jit(self._step_cached, donate_argnums=(0,))
        self.step_cached = lambda state, structure, dt: step_cached_jit(
            state, structure, dt, self._jit_consts
        )

    def prime(self, state: State) -> State:
        if self._needs_calibration:
            self.calibrate(state)
        return self._prime_jit(state)

    @property
    def jit_consts(self) -> dict:
        """The current large-array consts pytree (PM/TreePM kernel tables;
        `{}` for pairwise/tree solvers). Callers embedding
        :meth:`traced_step` in their own jit MUST pass this as a traced
        ARGUMENT of that jit, fetched fresh at every call — closing over
        it would (a) inline a multi-hundred-MB kernel table into the HLO
        as a literal (a grid=256 TreePM program is 269 MB of text, which
        overflows the compile RPC) and (b) keep dispatching the stale
        table after a recalibration, since jit caches on shapes only."""
        return self._jit_consts

    def traced_step(self, state: State, dt, consts) -> State:
        """One simulation step as a pure, jit-safe function — the public
        way to embed the step inside a larger XLA program (fused
        step+render frames, the driver's compile-check entry). `consts`
        must come from :attr:`jit_consts` (threaded, not closed over);
        pair it with :attr:`jit_epoch` as a static argument so a
        recalibration retraces the embedding jit. For plain host-loop
        stepping use :meth:`step`, which handles both automatically."""
        return self._step(state, dt, consts)

    @property
    def mesh_params(self) -> dict | None:
        """PM/TreePM mesh calibration products (box_min, h, grid,
        kernel_hat; TreePM adds rs/rcut) — read-only snapshot for
        benches/telemetry. None before calibration / for pair solvers."""
        return dict(self._pm) if getattr(self, "_pm", None) else None

    @property
    def caps(self) -> dict:
        """Measured static-shape calibration caps (read-only snapshot) —
        the public way for benches/telemetry to report what calibrate()
        chose. Keys with value None are not applicable to the current
        solver/cluster mode."""
        return {
            "k_near": self._k_near,
            "gg": self._gg,
            "near_tiles": self._near_tiles,
            "near_tiles_q": self._near_tiles_q,
            "k_super": self._k_super,
            "k_mid": self._k_mid,
            "m1_src_tiles": self._m1_src,
            "m2_src_tiles": self._m2_src,
            "cluster_mode": self._cluster_mode,
        }

    def scan_chunk(self) -> int | None:
        """Max device-scan length per run() call (None = unlimited).

        The explicit config.run_chunk wins; otherwise TPU rollouts chunk at
        DEFAULT_RUN_CHUNK, dropping to SAFE_DENSE_SCAN for tree sims whose
        (calibrated) near-list cap is dense — the fence for the
        scan x dense-near-list runtime fault (BENCH_NOTES "Known issue").
        CPU/virtual-mesh runs are unaffected (the fault is TPU-specific and
        tests want single-program scans)."""
        if self.config.run_chunk:
            return self.config.run_chunk
        if self.config.resolved_backend() != "pallas":
            return None
        if self.config.resolved_algorithm() == "treepm":
            # same pairs-tile machinery as the tree's near phase — apply
            # the same scan x dense-near-work fence from the calibrated
            # tile count (cutoff lists are usually far below the tree's)
            tiles = self._near_tiles or 0
            if tiles > DENSE_TILES_SINGLE_STEP:
                return 1
            if (self._k_near or 0) > DENSE_K_NEAR:
                return SAFE_DENSE_SCAN
            return DEFAULT_RUN_CHUNK
        if self.config.resolved_algorithm() == "tree":
            k = self._k_near or 0
            if k > DENSE_K_NEAR:
                # near work estimate: pairs mode has the calibrated tile
                # count; strip mode does gg*k cluster pairs (~pj tile
                # equivalents each, pj = pairs-tile columns per block)
                tiles = self._near_tiles
                if tiles is None:
                    from spacetpu.ops import tree as tree_ops
                    leaf = self.config.resolved_leaf()
                    pj = max(tree_ops.NEAR_TILE_J // (leaf + 1), 1)
                    tiles = (self._gg or self.config.n // leaf) * k // pj
                if tiles > DENSE_TILES_SINGLE_STEP:
                    return 1
                return SAFE_DENSE_SCAN
        return DEFAULT_RUN_CHUNK

    def run(self, state: State, dt, steps: int, *,
            progress: Callable | None = None) -> State:
        """Rollout `steps` ticks. Device-side lax.scan in chunks of
        scan_chunk() (a single program when None); state is donated
        through every chunk, so peak memory matches step(). `progress`
        (optional) is called with the completed step count after each
        chunk — the chunk boundary includes a host fence, so the callback
        reflects real device progress, not queued dispatches."""
        chunk = self.scan_chunk()
        if chunk is None or (chunk >= steps and chunk > 1):
            state = self._run_jit(state, dt, steps)
            if progress is not None:
                # host fence — this backend's block_until_ready is async
                float(jnp.sum(state.pos[0]))
                progress(steps)
            return state
        done = 0
        while done < steps:
            todo = min(chunk, steps - done)
            # chunk==1 means even short scans fault at these caps
            # (DENSE_TILES_SINGLE_STEP): dispatch the plain step program,
            # the one form the isolation matrix proved always safe.
            state = (self.step(state, dt) if todo == 1
                     else self._run_jit(state, dt, todo))
            if progress is not None:
                # fence so the report tracks completed device work (this
                # backend's block_until_ready is async; read one scalar)
                float(jnp.sum(state.pos[0]))
                progress(done + todo)
            done += todo
        return state

    def calibrate(self, state: State):
        """k_near="auto": measure the scene's near-list shape and rebuild
        the force closure with statically sized caps — the max near count
        (k_near), the pair-mode tile capacities, and (adaptive clustering)
        the actual cluster count. Equal-count clusters in
        high-density-contrast scenes (Plummer spheres) need far larger
        caps than the geometric default — see tree.measure_near. Must run
        before the jitted step/run first trace (prime() does this
        automatically).

        algorithm="pm" calibrates its mesh instead: the bounding box is
        measured from this state (margin-padded) and the open-BC Green's
        function is FFT'd once host-side (ops/pm.py)."""
        if self.config.resolved_algorithm() == "pm":
            return self._calibrate_pm(state)
        if self.config.resolved_algorithm() == "treepm":
            return self._calibrate_treepm(state)
        from spacetpu.ops import tree as tree_ops

        cfg = self.config
        order = cfg.resolved_multipole_order()
        leaf = cfg.resolved_leaf()
        cmode = cfg.resolved_cluster_mode()
        gg = tree_ops._gg_for(cfg.n, cfg.far_levels, order, leaf, cmode)

        def need_mid(g):
            # the MID far field (k_mid/M1/M2 caps) only runs for
            # far_levels=3 in pairs mode — skip its measurement otherwise
            return (tree_ops.resolve_far_levels(cfg.far_levels, g, order) == 3
                    and cfg.resolved_near_mode() == "pairs")

        m = tree_ops.measure_near(
            state.pos, state.mass, theta=cfg.theta, gg=gg, leaf=leaf,
            cluster_mode=cmode, measure_mid=need_mid(gg),
        )
        if cfg.cluster_mode == "auto" and cmode == "equal":
            # Heavy-tailed near lists (mean near count >> the uniform-cloud
            # geometric estimate) mean equal-count clusters in the sparse
            # tail span huge radii and go near to everything — the Plummer
            # pathology. Only then is the adaptive partition worth its
            # extra clusters: measure it and keep whichever needs fewer
            # near tiles (tile count ~ actual near work in pairs mode).
            # Measured at theta=0.5: plummer_sphere(300k) 519 -> 387
            # ms/step from this upgrade; fixed_cloud stays equal.
            pj = max(tree_ops.NEAR_TILE_J // (leaf + 1), 1)
            mean_near = m["near_tiles"] * pj / max(int(m["n_clusters"]), 1)
            trigger = min(4.0 * tree_ops.default_k_near(cfg.theta, gg),
                          gg / 2)
            if mean_near > trigger:
                gg_a = tree_ops._gg_for(cfg.n, cfg.far_levels, order, leaf,
                                        "adaptive")
                m_a = tree_ops.measure_near(
                    state.pos, state.mass, theta=cfg.theta, gg=gg_a,
                    leaf=leaf, cluster_mode="adaptive",
                    measure_mid=False,  # exploratory: only tiles compared
                )
                if m_a["near_tiles"] < 0.8 * m["near_tiles"]:
                    cmode, gg, m = "adaptive", gg_a, m_a
        self._cluster_mode = cmode
        if cmode == "adaptive":
            # shrink the worst-case cluster cap to the measured scene
            # (+25% headroom for drift; SUPER-aligned for the 3-level far
            # field; adaptive_clusters falls back to the equal-count split
            # if a rebuild ever exceeds it) — then RE-measure at the
            # shrunk cap: the first pass's caps were counted on the
            # gg-padded partition, where every padding cluster still
            # claims >= 1 pair tile per list (measured at fixed_cloud
            # 120k/leaf=127: 9634 predicted vs 6293 actual tiles — 35%
            # dead near-phase grid), and the supercluster geometry
            # differs once the padding clusters vanish.
            gg_meas = min(gg, int(m["n_clusters"] * 1.25) + 8)
            gg_run = -(-gg_meas // tree_ops.SUPER) * tree_ops.SUPER
            if gg_run < gg or ("k_mid" not in m and need_mid(gg_run)):
                # re-measure at the shrunk cap — and whenever the winning
                # pass was the exploratory (mid-less) adaptive measurement
                # but the final closure needs the MID caps
                m = tree_ops.measure_near(
                    state.pos, state.mass, theta=cfg.theta, gg=gg_run,
                    leaf=leaf, cluster_mode="adaptive",
                    measure_mid=need_mid(gg_run),
                )
            self._gg = gg_run
        else:
            # a RE-calibration may resolve back to "equal" after a prior
            # adaptive pass; the shrunk adaptive cluster cap must not leak
            # into the equal partition (stale-_gg bug: the equal rebuild
            # would overflow a too-small cap and silently degrade forces)
            self._gg = None
        if not isinstance(cfg.k_near, int):
            self._k_near = m["k_near"]
        self._near_tiles = m["near_tiles"]
        self._near_tiles_q = m["near_tiles_q"]
        # Dense-near guard (round-4 verdict #3): a MEASURED near cap that
        # covers ~all clusters means the near phase is all-pairs-grade —
        # and on the axon TPU runtime the shape that twice crashed the
        # worker outright (theta=0.3 plummer at N=1M: k_near ~= gg =
        # 3922-6400, logs/r4w6_r4_scorecard_plummer_tree.log; BENCH_NOTES
        # "plummer x tree scorecard cell"). Flag it for family-fallback
        # callers, warn the user, and REFUSE the exact worker-crash shape
        # (saturated cap AND near work beyond the scan-fault tile
        # threshold) instead of dispatching a config that kills the
        # backend. A pinned integer k_near caps the near work by
        # construction and is exempt. SPACETPU_ALLOW_DENSE_NEAR=1
        # overrides the refusal (e.g. off-TPU backends, fault hunting).
        self.degenerate = None
        gg_run = self._gg if self._gg is not None else gg
        if (gg_run >= 64 and not isinstance(cfg.k_near, int)
                and (self._k_near or 0) >= gg_run // 2):
            import os as _os
            import warnings

            self.degenerate = "tree-dense-near"
            dense_tiles = (self._near_tiles or 0) > DENSE_TILES_SINGLE_STEP
            msg = (
                f"tree near lists saturate the scene: measured "
                f"k_near={self._k_near} covers ~all {gg_run} clusters at "
                f"theta={cfg.theta} (near work is all-pairs-grade"
                + (f", {self._near_tiles} pair tiles" if dense_tiles else "")
                + "). Use a wider theta (0.5 measured med err 5.6e-5 on "
                "plummer(1M), logs/r4w10_r4_scorecard_plummer_tree.log), "
                "adaptive clustering, or the direct solver."
            )
            if (dense_tiles
                    and cfg.resolved_backend() == "pallas"
                    and _os.environ.get("SPACETPU_ALLOW_DENSE_NEAR") != "1"):
                raise RuntimeError(
                    msg + " Refusing: this configuration matches the "
                    "deterministic TPU worker-crash shape (BENCH_NOTES "
                    "'Known issue: TPU runtime fault'); set "
                    "SPACETPU_ALLOW_DENSE_NEAR=1 to run it anyway."
                )
            warnings.warn(msg, stacklevel=2)
        self._k_super = m.get("k_super")
        self._k_mid = m.get("k_mid")
        self._m1_src = m.get("m1_src_tiles")
        self._m2_src = m.get("m2_src_tiles")
        self.acc_fn = _build_acc_fn(
            cfg, self._k_near, gg=self._gg, near_tiles=self._near_tiles,
            near_tiles_q=self._near_tiles_q, cluster_mode=cmode,
            k_super=self._k_super, k_mid=self._k_mid,
            m1_src_tiles=self._m1_src, m2_src_tiles=self._m2_src,
        )
        self._jit_consts = {}
        self._acc_builder = None
        # re-wrap the jits: a RE-calibration (evolved scene) must not
        # keep dispatching traces compiled against the old caps
        self._build_jits()
        self._needs_calibration = False

    def _calibrate_pm(self, state: State):
        """Measure the scene's bounding box and bake the PM mesh: box_min,
        cell size h, and the FFT'd kernel become device constants of the
        rebuilt acc closure. Re-runs (maybe_recalibrate) re-measure the box
        around the evolved positions — always convergent, since the new box
        covers every body by construction."""
        from spacetpu.ops import pm as pm_ops

        cfg = self.config
        self.degenerate = None
        grid = cfg.resolved_pm_grid()
        box_min, h = pm_ops.measure_box(state.pos, grid=grid,
                                        margin=cfg.pm_margin)
        kernel_hat = pm_ops.pm_kernel_hat(
            grid, h, eps=cfg.resolved_eps(), g=cfg.g, dtype=state.pos.dtype
        )
        self._pm = dict(box_min=box_min, h=h, grid=grid,
                        kernel_hat=kernel_hat)
        self.acc_fn = functools.partial(
            pm_ops.acc_pm, kernel_hat=kernel_hat, box_min=box_min, h=h,
            grid=grid,
        )
        self._jit_consts = dict(kernel_hat=kernel_hat,
                                box_min=jnp.asarray(box_min))
        self._acc_builder = lambda c: functools.partial(
            pm_ops.acc_pm, kernel_hat=c["kernel_hat"], box_min=c["box_min"],
            h=h, grid=grid,
        )
        self._build_jits()
        self._needs_calibration = False

    def _calibrate_treepm(self, state: State):
        """TreePM calibration: the PM mesh box + LONG-RANGE kernel (erf
        split at rs = pm_rs_cells * h) plus the measured cutoff near-list
        caps for the short-range pair pass (ops/treepm.py)."""
        from spacetpu.ops import pm as pm_ops
        from spacetpu.ops import treepm as treepm_ops

        cfg = self.config
        grid = cfg.resolved_pm_grid()
        leaf = cfg.resolved_leaf()
        box_min, h = pm_ops.measure_box(state.pos, grid=grid,
                                        margin=cfg.pm_margin)
        rs_cells, rcut_rs = cfg.resolved_split()
        rs, rcut = treepm_ops.split_params(h, rs_cells=rs_cells,
                                           rcut_rs=rcut_rs)
        if cfg.resolved_eps() > rs:
            import warnings

            warnings.warn(
                f"TreePM split scale rs={rs:.3g} is below the softening "
                f"eps={cfg.resolved_eps():.3g}: the short-range tail "
                f"truncated at r_cut={rcut:.3g} is no longer negligible "
                "(the Plummer-vs-Newton deviation extends past the "
                "cutoff). Use a coarser mesh (--pm-grid), a larger "
                "--pm-rs-cells, or a smaller eps.",
                stacklevel=2,
            )
        split = cfg.resolved_treepm_split()
        kernel_hat = treepm_ops.make_kernel_hat(
            split, grid, h, rs, rcut, g=cfg.g, dtype=state.pos.dtype
        )
        gg = -(-cfg.n // leaf)
        m = treepm_ops.measure_near_rcut(
            state.pos, state.mass, rcut=rcut, gg=gg, leaf=leaf
        )
        if isinstance(cfg.k_near, int):
            self._k_near = cfg.k_near  # pinned (overflow telemetry counts)
        else:
            self._k_near = m["k_near"]
        # gg >= 64: at toy scales the cutoff legitimately covers the box
        # and all-pairs cost is fine — warn only where it hurts
        self.degenerate = None
        if gg >= 64 and self._k_near >= gg // 2:
            import warnings

            self.degenerate = "treepm-saturated"
            warnings.warn(
                f"TreePM short-range cutoff saturates the scene: the "
                f"measured near-list cap k_near={self._k_near} covers "
                f"~all {gg} clusters (r_cut={rcut:.3g} vs a mass "
                "distribution concentrated well inside it, e.g. a "
                "Plummer core in an outlier-stretched box). The pair "
                "pass degenerates to all-pairs cost (measured 16.5 "
                "s/step at N=1M on chip, logs/r4w2_r4_scorecard.log) — "
                "use the tree solver, or a finer mesh (--pm-grid).",
                stacklevel=2,
            )
        self._near_tiles = m["near_tiles"]
        self._gg = gg
        self._pm = dict(box_min=box_min, h=h, grid=grid,
                        kernel_hat=kernel_hat, rs=rs, rcut=rcut,
                        split=split)
        self.acc_fn = functools.partial(
            treepm_ops.acc_treepm, kernel_hat=kernel_hat, box_min=box_min,
            h=h, grid=grid, rs=rs, rcut=rcut, split=split,
            softening=cfg.softening,
            eps=cfg.resolved_eps(), g=cfg.g, k_near=self._k_near, gg=gg,
            leaf=leaf, near_tiles=self._near_tiles,
            backend=cfg.resolved_backend(),
            pairs_accum=cfg.pallas_method,
        )
        self._jit_consts = dict(kernel_hat=kernel_hat,
                                box_min=jnp.asarray(box_min))
        self._acc_builder = lambda c: functools.partial(
            treepm_ops.acc_treepm, kernel_hat=c["kernel_hat"],
            box_min=c["box_min"], h=h, grid=grid, rs=rs, rcut=rcut,
            split=split,
            softening=cfg.softening, eps=cfg.resolved_eps(), g=cfg.g,
            k_near=self._k_near, gg=gg, leaf=leaf,
            near_tiles=self._near_tiles, backend=cfg.resolved_backend(),
            pairs_accum=cfg.pallas_method,
        )
        self._build_jits()
        self._needs_calibration = False

    def maybe_recalibrate(self, state: State, *, frac: float = 0.02) -> bool:
        """Re-measure the scene and rebuild the step closures iff the
        current caps have degraded: the near-overflow telemetry exceeds
        `frac` of the cluster count. Calibration caps are measured from
        a single snapshot (prime time); a scene that restructures —
        collapsing core, merging clusters — can outgrow them, and
        overflow then degrades near-field accuracy cluster by cluster
        (counted, never unbounded). Callers with long rollouts
        (run_headless --recalibrate) invoke this between chunks; the
        re-trace costs one compile, so the threshold should stay well
        above zero. Returns True when a re-calibration ran. The reference
        rebuilds its octree every tick (barnes_hut/mod.rs:13-14), so its
        caps can never go stale; this is the static-shape analogue.

        For algorithm="pm" the degradation signal is the out-of-box count
        (face-clamped deposits) and the fix is a re-measured box — always
        convergent, so no pinned-cap exhaustion logic is needed."""
        algo = self.config.resolved_algorithm()
        if algo == "pm":
            h = self.health(state)
            if h.get("out_of_box", 0) <= frac * self.config.n:
                return False
            self.calibrate(state)
            return True
        if algo == "treepm":
            if getattr(self, "_recal_exhausted", False):
                return False
            h = self.health(state)
            bad = (h.get("out_of_box", 0) > frac * self.config.n
                   or h.get("near_overflow", 0) > frac * (self._gg or 1))
            if not bad:
                return False
            self.calibrate(state)
            h2 = self.health(state)
            if (isinstance(self.config.k_near, int)
                    and h2.get("near_overflow", 0)
                    > frac * (self._gg or 1)):
                import warnings

                warnings.warn(
                    "recalibration could not clear the TreePM near-list "
                    f"overflow (k_near={self._k_near} is explicit and "
                    "pinned); auto-recalibration disabled",
                    stacklevel=2,
                )
                self._recal_exhausted = True
            return True
        if algo != "tree":
            return False
        if getattr(self, "_recal_exhausted", False):
            return False
        h = self.health(state)
        gg = h.get("clusters") or 1
        if h.get("near_overflow", 0) <= frac * gg:
            return False
        self.calibrate(state)
        # An explicit integer k_near is pinned (calibrate never widens
        # it), so overflow driven by a too-small user cap cannot converge
        # — detect that and stop re-triggering, or every later check
        # would pay a full re-measure + re-compile for nothing.
        h2 = self.health(state)
        if h2.get("near_overflow", 0) > frac * (h2.get("clusters") or 1):
            import warnings

            warnings.warn(
                "recalibration could not clear the near-list overflow "
                f"(k_near={self._k_near} is explicit and pinned); "
                "auto-recalibration disabled for this simulation",
                stacklevel=2,
            )
            self._recal_exhausted = True
        return True

    def suggest_substeps(self, state: State, dt, *, eta: float = 0.02,
                         max_substeps: int = 64) -> tuple[int, int]:
        """Measure the scene's dynamical-time distribution and suggest
        (substeps, fast_cap) for multirate stepping at outer step ``dt``.

        A body is adequately resolved when its effective step is at most
        ``eta * tau`` (tau = |v|/|a|, the same metric select_fast ranks
        by). The suggestion is the smallest power of two m that resolves
        the WORST body (hard-capped at max_substeps), and a fast capacity
        covering every under-resolved body with 25% headroom, rounded up
        to 128. The worst body — not a quantile: multirate has one fast
        level, so m must cover the max need or the fast set still drifts,
        and a small fast set makes large m cheap ((m-1)*F*N pair evals —
        at F=128, N=256k even m=64 is ~3% of one full pass). A 99.9th
        percentile misses exactly the workload multirate exists for: a
        2-body binary is 0.0008% of N=256k, and the chip run
        (logs/r4w2_r4_multirate.log) measured the quantile form saying
        "uniform" on a scene whose coarse drift was 1.06. Cost safety
        comes from the fast-set-size guard below, not from clipping m.
        Requires a primed state (the cached acc is the input).

        Returns (substeps, fast_cap, reason): (1, 0, "uniform") when every
        body is already resolved at this dt, (1, 0, "lower-dt") when MOST
        of the scene is under-resolved (fast set would exceed N/4 —
        multirate would then cost more than plain fine-stepping, and the
        right fix is a smaller dt), else (m, F, "multirate")."""
        import numpy as np

        v = np.linalg.norm(np.asarray(state.vel, np.float64), axis=-1)
        a = np.linalg.norm(np.asarray(state.acc, np.float64), axis=-1)
        # same metric as multirate.dynamical_time: a speed floor keeps
        # turning-point / stationary-center bodies (v ~ 0) from posting
        # tau ~ 0 and forcing max_substeps on an otherwise-resolved scene
        v_eff = v + 1e-3 * float(np.mean(v))
        tau = np.where((v == 0) & (a == 0), np.inf,
                       v_eff / np.maximum(a, 1e-300))
        if state.n_active is not None:
            tau = tau[: int(state.n_active)]
        need = float(dt) / (eta * np.maximum(tau, 1e-300))
        m = float(np.max(need))
        if m <= 1.0:
            return 1, 0, "uniform"
        m = min(1 << max(0, int(np.ceil(np.log2(m)))), max_substeps)
        raw = int(np.sum(need > 1.0) * 1.25)
        # the cost guard uses the RAW under-resolved count — the tile-
        # alignment floor below would otherwise veto small scenes where
        # the fast work is negligible anyway
        if raw > self.config.n // 4:
            return 1, 0, "lower-dt"
        f = min(self.config.n, max(128, -(-raw // 128) * 128))
        return m, f, "multirate"

    def health(self, state: State) -> dict:
        """Tree telemetry (near-list overflow) computed with THIS
        simulation's calibrated partition and caps — a generic
        equal/LEAF/geometric-cap rebuild (utils.metrics.tree_health) would
        mis-report overflow for adaptive/custom-leaf/calibrated sims."""
        from spacetpu.ops import tree as tree_ops

        cfg = self.config
        if cfg.resolved_algorithm() == "pm":
            if self._pm is None:
                return {}
            from spacetpu.ops import pm as pm_ops

            n_out = int(pm_ops.count_out_of_box(
                jnp.asarray(state.pos), self._pm["box_min"], self._pm["h"],
                self._pm["grid"],
            ))
            return {"algorithm": "pm", "out_of_box": n_out,
                    "grid": self._pm["grid"]}
        if cfg.resolved_algorithm() == "treepm":
            if self._pm is None:
                return {}
            from spacetpu.ops import pm as pm_ops
            from spacetpu.ops import treepm as treepm_ops

            n_out = int(pm_ops.count_out_of_box(
                jnp.asarray(state.pos), self._pm["box_min"], self._pm["h"],
                self._pm["grid"],
            ))
            prep = treepm_ops.treepm_prep(
                jnp.asarray(state.pos), jnp.asarray(state.mass),
                rcut=self._pm["rcut"], k_near=self._k_near, gg=self._gg,
                leaf=cfg.resolved_leaf(), near_tiles=self._near_tiles,
            )
            return {"algorithm": "treepm", "out_of_box": n_out,
                    "grid": self._pm["grid"],
                    "near_overflow": int(prep["near_overflow"]),
                    "clusters": self._gg, "k_near": self._k_near}
        if cfg.resolved_algorithm() != "tree":
            return {"algorithm": cfg.resolved_algorithm()}
        p = self._tree_params()
        prep = tree_ops.tree_prep(
            jnp.asarray(state.pos), jnp.asarray(state.mass),
            theta=cfg.theta, k_near=p["k_near"], gg=p["gg"],
            far_levels=p["far_levels"], leaf=p["leaf"],
            cluster_mode=p["cmode"], near_mode=p["nmode"],
            near_tiles=self._near_tiles, near_tiles_q=self._near_tiles_q,
            k_super=self._k_super, k_mid=self._k_mid,
            m1_src_tiles=self._m1_src, m2_src_tiles=self._m2_src,
        )
        return {"algorithm": "tree",
                "near_overflow": int(prep["near_overflow"]),
                "clusters": p["gg"], "k_near": p["k_near"]}

    def _check(self, state: State):
        if state.pos.shape[0] != self.config.n:
            raise ValueError(
                f"state has {state.pos.shape[0]} bodies but this Simulation "
                f"was built for n={self.config.n} (tree clustering and "
                f"algorithm auto-selection depend on it)"
            )

    def _acc(self, consts):
        """The force closure for one traced call: non-mesh solvers use
        the prebuilt acc_fn; PM/TreePM rebind over the TRACED consts so
        the kernel table enters the program as a parameter."""
        if self._acc_builder is not None:
            return self._acc_builder(consts)
        return self.acc_fn

    def _step(self, state: State, dt, consts) -> State:
        self._check(state)
        return self._stepper(state, dt, self._acc(consts))

    def _prime(self, state: State, consts) -> State:
        self._check(state)
        return integrators.prime(state, self._acc(consts))

    def _run(self, state: State, dt, steps: int, consts) -> State:
        self._check(state)
        r = self.config.tree_refresh_every
        if r > 1 and self.config.resolved_algorithm() in ("tree", "treepm"):
            return self._run_tree_cached(state, dt, steps, consts)
        acc_fn = self._acc(consts)

        def body(s, _):
            return self._stepper(s, dt, acc_fn), None

        state, _ = jax.lax.scan(body, state, None, length=steps)
        return state

    def _tree_params(self) -> dict:
        """Resolved/calibrated tree parameters shared by the cached-
        structure paths and health()."""
        from spacetpu.ops import tree as tree_ops

        cfg = self.config
        order = cfg.resolved_multipole_order()
        leaf = cfg.resolved_leaf()
        cmode = self._cluster_mode or cfg.resolved_cluster_mode()
        gg = self._gg or tree_ops._gg_for(cfg.n, cfg.far_levels, order, leaf,
                                          cmode)
        far_levels = tree_ops.resolve_far_levels(cfg.far_levels, gg, order)
        k_near = self._k_near or tree_ops.default_k_near(cfg.theta, gg)
        return dict(
            eps=cfg.resolved_eps(), backend=cfg.resolved_backend(),
            order=order, leaf=leaf, cmode=cmode, gg=gg,
            far_levels=far_levels, k_near=k_near,
            nmode=cfg.resolved_near_mode(),
        )

    def _build_structure(self, state: State):
        """The cacheable part of tree construction (tree_structure /
        treepm_structure) with this Simulation's calibrated caps."""
        from spacetpu.ops import tree as tree_ops

        if self.config.resolved_algorithm() == "treepm":
            from spacetpu.ops import treepm as treepm_ops

            return treepm_ops.treepm_structure(
                state.pos, state.mass, rcut=self._pm["rcut"],
                k_near=self._k_near, gg=self._gg,
                leaf=self.config.resolved_leaf(),
                near_tiles=self._near_tiles,
            )
        p = self._tree_params()
        return tree_ops.tree_structure(
            state.pos, state.mass, theta=self.config.theta,
            k_near=p["k_near"], gg=p["gg"], far_levels=p["far_levels"],
            leaf=p["leaf"], cluster_mode=p["cmode"], near_mode=p["nmode"],
            near_tiles=self._near_tiles, near_tiles_q=self._near_tiles_q,
            k_super=self._k_super, k_mid=self._k_mid,
            m1_src_tiles=self._m1_src, m2_src_tiles=self._m2_src,
        )

    def _cached_acc_fn(self, structure, consts):
        import functools as _ft

        from spacetpu.ops import tree as tree_ops

        if self.config.resolved_algorithm() == "treepm":
            from spacetpu.ops import treepm as treepm_ops

            pm = self._pm
            return _ft.partial(
                treepm_ops.acc_treepm_cached, structure=structure,
                kernel_hat=consts["kernel_hat"], box_min=consts["box_min"],
                h=pm["h"], grid=pm["grid"], rs=pm["rs"],
                rcut=pm["rcut"], split=pm["split"],
                softening=self.config.softening,
                eps=self.config.resolved_eps(), g=self.config.g,
                backend=self.config.resolved_backend(),
                pairs_accum=self.config.pallas_method,
            )
        p = self._tree_params()
        return _ft.partial(
            tree_ops.acc_tree_cached, structure=structure,
            softening=self.config.softening, eps=p["eps"], g=self.config.g,
            backend=p["backend"], multipole_order=p["order"],
            far_levels=p["far_levels"], near_mode=p["nmode"],
            pairs_accum=self.config.pallas_method,
        )

    def _step_cached(self, state: State, structure, dt, consts) -> State:
        """One tick against a cached tree structure (the interactive
        engine's tree_refresh_every path; see run_sim_loop)."""
        self._check(state)
        return self._stepper(state, dt, self._cached_acc_fn(structure, consts))

    def _run_tree_cached(self, state: State, dt, steps: int, consts) -> State:
        """Rollout with the tree's sort + near lists refreshed every
        tree_refresh_every steps (bodies move a small fraction of a cluster
        radius per step, so the cached structure stays valid; cluster
        statistics always track the current positions)."""
        r = self.config.tree_refresh_every

        def body(carry, k):
            s, structure = carry
            # k=0 reuses structure0 (built below); rebuild every r steps after
            structure = jax.lax.cond(
                jnp.logical_and(k % r == 0, k > 0),
                lambda: self._build_structure(s),
                lambda: structure,
            )
            acc_fn = self._cached_acc_fn(structure, consts)
            return (self._stepper(s, dt, acc_fn), structure), None

        structure0 = self._build_structure(state)
        (state, _), _ = jax.lax.scan(
            body, (state, structure0), jnp.arange(steps)
        )
        return state


def _build_acc_fn(config: SimConfig, k_near: int | None = None, *,
                  gg: int | None = None, near_tiles: int | None = None,
                  near_tiles_q: int | None = None,
                  cluster_mode: str | None = None,
                  k_super: int | None = None,
                  k_mid: int | None = None,
                  m1_src_tiles: int | None = None,
                  m2_src_tiles: int | None = None) -> Callable:
    if config.softening not in direct.SOFTENINGS:
        raise ValueError(
            f"unknown softening {config.softening!r} (want one of {direct.SOFTENINGS})"
        )
    algo = config.resolved_algorithm()
    backend = config.resolved_backend()
    eps = config.resolved_eps()
    if algo in ("pm", "treepm"):
        # the real closure is built by Simulation._calibrate_pm /
        # _calibrate_treepm (it needs the primed state's bounding box);
        # this placeholder catches a step() before prime()/calibrate()
        def _pm_uncalibrated(pos, mass):
            raise RuntimeError(
                f"{algo} solver is uncalibrated — call prime() (or "
                "calibrate()) before step/run: the mesh box and FFT'd "
                "kernel are measured from the first state"
            )

        return _pm_uncalibrated
    if algo == "direct":
        if backend == "pallas":
            from spacetpu.ops import pallas_direct

            return functools.partial(
                pallas_direct.acc_direct_pallas,
                softening=config.softening,
                eps=eps,
                g=config.g,
                method=config.pallas_method,
            )
        if config.chunk:
            return functools.partial(
                direct.acc_direct_chunked,
                softening=config.softening,
                eps=eps,
                g=config.g,
                chunk=config.chunk,
            )
        return functools.partial(
            direct.acc_direct, softening=config.softening, eps=eps, g=config.g
        )
    elif algo == "tree":
        from spacetpu.ops import tree as tree_ops

        return functools.partial(
            tree_ops.acc_tree,
            theta=config.theta,
            far_levels=config.far_levels,
            softening=config.softening,
            eps=eps,
            g=config.g,
            backend=backend,
            multipole_order=config.resolved_multipole_order(),
            k_near=k_near,
            leaf=config.resolved_leaf(),
            cluster_mode=cluster_mode or config.resolved_cluster_mode(),
            near_mode=config.resolved_near_mode(),
            near_tiles=near_tiles,
            near_tiles_q=near_tiles_q,
            gg=gg,
            k_super=k_super,
            k_mid=k_mid,
            m1_src_tiles=m1_src_tiles,
            m2_src_tiles=m2_src_tiles,
            pairs_accum=config.pallas_method,
        )
    raise ValueError(f"unknown algorithm {algo!r}")


def make_simulation(
    n: int,
    *,
    algorithm: str = "auto",
    backend: str = "auto",
    integrator: str = "leapfrog",
    softening: str = "plummer",
    eps: float | None = None,
    g: float = constants.G,
    theta: float = constants.BARNES_HUT_THETA,
    chunk: int | None = None,
    multipole_order="auto",
    tree_refresh_every: int = 1,
    k_near=None,
    leaf="auto",
    cluster_mode: str = "auto",
    near_mode: str = "auto",
    far_levels="auto",
    run_chunk: int | None = None,
    substeps: int = 1,
    fast_cap="auto",
    pm_grid="auto",
    pm_margin: float = 2.0,
    pm_rs_cells: float | None = None,
    pm_rcut_rs: float | None = None,
    pm_split: str | None = None,
    pallas_method: str = "vpu",
) -> Simulation:
    return Simulation(
        SimConfig(
            n=n,
            algorithm=algorithm,
            backend=backend,
            integrator=integrator,
            softening=softening,
            eps=eps,
            g=g,
            theta=theta,
            chunk=chunk,
            multipole_order=multipole_order,
            # 0 = unset (the CLI's "auto" sentinel): reference-parity
            # rebuild-every-tick here; make_engine_for's auto tiers
            # resolve 0 to INTERACTIVE_TREE_REFRESH before calling
            tree_refresh_every=tree_refresh_every or 1,
            k_near=k_near,
            leaf=leaf,
            cluster_mode=cluster_mode,
            near_mode=near_mode,
            far_levels=far_levels,
            run_chunk=run_chunk,
            substeps=substeps,
            fast_cap=fast_cap,
            pm_grid=pm_grid,
            pm_margin=pm_margin,
            pm_rs_cells=pm_rs_cells,
            pm_rcut_rs=pm_rcut_rs,
            pm_split=pm_split,
            pallas_method=pallas_method,
        )
    )


def reference_compatible(n: int, **kw) -> Simulation:
    """A Simulation reproducing the reference force law + integrator:
    semi-implicit Euler with additive-eps softening (`direct.rs:8-24`,
    `sim/mod.rs:22-37`). Used by trajectory-parity tests."""
    kw.setdefault("algorithm", "direct")
    kw.setdefault("backend", "xla")
    return make_simulation(n, integrator="euler", softening="ref", **kw)
