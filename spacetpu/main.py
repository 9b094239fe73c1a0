"""Application entry point: scene -> engine -> frontend.

The TPU-native counterpart of `/root/reference/space/src/main.rs:56-97`:
build the scene (default fixed_cloud(10000), main.rs:61), split sim-side
state from render-side metadata (main.rs:70-77), start the sim thread, run
the chosen frontend, then stop-token + join. Scene/algorithm/frontend are
CLI flags instead of source edits (utils/config.py).

Run:  python -m spacetpu --preset fixed_cloud --n 2000 --frontend terminal
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from spacetpu import constants
from spacetpu.engine import SimEngine, make_engine_for
from spacetpu.io import checkpoint
from spacetpu.models import presets
from spacetpu.sim import make_simulation
from spacetpu.state import Scene, State
from spacetpu.utils.config import RunConfig, parse_args, resolved_theta


def build_scene(cfg: RunConfig) -> Scene:
    fn = presets.PRESETS.get(cfg.preset)
    if fn is None:
        raise SystemExit(
            f"unknown preset {cfg.preset!r}; available: "
            f"{', '.join(sorted(presets.PRESETS))}"
        )
    if cfg.preset in ("fixed_cloud", "fixed_shell"):
        return fn(cfg.n)
    if cfg.preset in ("random_cluster", "plummer_sphere",
                      "colliding_plummers"):
        return fn(cfg.n, seed=cfg.seed)
    if cfg.preset == "earth_sun_mars_ast":
        return fn(cfg.n, seed=cfg.seed)
    return fn()


def resolve_state(cfg: RunConfig, scene: Scene) -> "tuple[State, Scene]":
    """Build the initial State; with --restore, load the checkpoint and
    prefer its own Scene metadata (names/colors/radii) over the CLI preset
    so renderer/Exchange sizing always matches the restored body count."""
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    if not cfg.restore:
        return scene.state(dtype=dtype, compensated=cfg.compensated), scene
    state, ck_scene, _ = checkpoint.load(cfg.restore, dtype=dtype)
    if ck_scene is not None:
        scene = ck_scene
        if state.n > scene.n:
            # a --shard run checkpoints its zero-mass pad rows (the state
            # was padded to the shard grain); they are inert, so trim them
            # back so engine/exchange/viewer sizing matches the scene
            n_old, n_new = state.n, scene.n

            def _trim(v):
                if (v is not None and getattr(v, "ndim", 0) >= 1
                        and v.shape[0] == n_old):
                    return v[:n_new]
                return v

            state = State(pos=_trim(state.pos), vel=_trim(state.vel),
                          mass=_trim(state.mass), acc=_trim(state.acc),
                          pos_c=_trim(state.pos_c), vel_c=_trim(state.vel_c),
                          time=state.time,
                          n_active=jnp.asarray(n_new, jnp.int32))
    if state.n != scene.n:
        raise SystemExit(
            f"--restore state has {state.n} bodies but the scene "
            f"({cfg.preset}) has {scene.n}; the checkpoint carries no scene "
            f"metadata, so pass a matching --preset/--n"
        )
    return state, scene


def _cfg_k_near(cfg: RunConfig):
    if cfg.k_near == "default":
        return None
    if cfg.k_near == "auto":
        return "auto"
    return int(cfg.k_near)


def _cfg_tree_kwargs(cfg: RunConfig) -> dict:
    """Tree-tuning flags shared by every Simulation construction site."""
    leaf = cfg.leaf if cfg.leaf == "auto" else int(cfg.leaf)
    far = cfg.far_levels if cfg.far_levels == "auto" else int(cfg.far_levels)
    fast_cap = cfg.fast_cap if cfg.fast_cap == "auto" else int(cfg.fast_cap)
    return dict(
        k_near=_cfg_k_near(cfg), near_mode=cfg.near_mode,
        cluster_mode=cfg.cluster_mode, leaf=leaf, far_levels=far,
        tree_refresh_every=cfg.tree_refresh_every,
        run_chunk=cfg.run_chunk or None,
        substeps=int(cfg.substeps), fast_cap=fast_cap,
        pallas_method=cfg.pallas_method,
        pm_grid=(cfg.pm_grid if cfg.pm_grid == "auto" else int(cfg.pm_grid)),
        pm_margin=cfg.pm_margin,
        pm_rs_cells=cfg.pm_rs_cells, pm_rcut_rs=cfg.pm_rcut_rs,
        pm_split=cfg.pm_split,
    )


def _resolve_auto_substeps(cfg: RunConfig, scene: Scene, state: State) -> State:
    """--substeps auto: prime a probe simulation (plain stepping, same
    force configuration) and let suggest_substeps pick (m, fast_cap) from
    the measured timescale spread at --dt. Mutates cfg in place; returns
    the primed state (prime donates its input)."""
    if cfg.integrator != "leapfrog":
        print("note: --substeps auto requires the leapfrog integrator; "
              "plain stepping", flush=True)
        cfg.substeps = "1"
        return state
    cfg.substeps = "1"  # so _cfg_tree_kwargs parses while we probe
    kw = _cfg_tree_kwargs(cfg)
    kw.update(substeps=1, fast_cap="auto")
    # Probe the configuration the engine will ACTUALLY tick: under
    # --algorithm auto, build_engine's make_engine_for resolves
    # theta=None to the interactive tier's value (0.4 quad), not the
    # pinned-solver parity 0.3 — measuring the timescale spread under a
    # different solver config than the one that runs would skew the
    # substep decision (round-4 advisor finding).
    if cfg.algorithm == "auto":
        from spacetpu.engine import resolve_interactive_theta

        probe_theta = resolve_interactive_theta(
            cfg.theta, softening=cfg.softening,
            multipole_order=cfg.multipole_order)
    else:
        probe_theta = resolved_theta(cfg.theta)
    probe = make_simulation(
        state.n, algorithm=cfg.algorithm, backend=cfg.backend,
        integrator=cfg.integrator, softening=cfg.softening, eps=cfg.eps,
        theta=probe_theta, g=scene.g,
        multipole_order=cfg.multipole_order,
        **kw,
    )
    state = probe.prime(state)
    m, f, reason = probe.suggest_substeps(state, cfg.dt)
    if m > 1:
        print(f"auto substeps: m={m}, fast_cap={f} (measured timescale "
              f"spread at dt={cfg.dt})", flush=True)
    elif reason == "lower-dt":
        print("auto substeps: MOST bodies are under-resolved at this dt — "
              "multirate cannot pay; lower --dt instead", flush=True)
    else:
        print("auto substeps: scene is uniform at this dt — plain "
              "stepping", flush=True)
    cfg.substeps = str(m)
    if m > 1:
        cfg.fast_cap = str(f)
    return state


def build_engine(cfg: RunConfig, scene: Scene, state: State) -> SimEngine:
    merge_kw = dict(merge_every=cfg.merge_collisions,
                    radii=scene.radii if cfg.merge_collisions else None,
                    snapshot_wire=cfg.snapshot_wire)
    if cfg.algorithm == "auto":
        return make_engine_for(
            state, delta=cfg.dt, theta=cfg.theta, profile=cfg.profile,
            backend=cfg.backend,
            integrator=cfg.integrator, softening=cfg.softening, eps=cfg.eps,
            g=scene.g, multipole_order=cfg.multipole_order,
            engine_kwargs=merge_kw, **_cfg_tree_kwargs(cfg),
        )
    sim = make_simulation(
        state.n, algorithm=cfg.algorithm, backend=cfg.backend,
        integrator=cfg.integrator, softening=cfg.softening, eps=cfg.eps,
        theta=resolved_theta(cfg.theta), g=scene.g,
        multipole_order=cfg.multipole_order,
        **_cfg_tree_kwargs(cfg),
    )
    return SimEngine(sim, state, delta=cfg.dt, **merge_kw)


def _run_headless_sharded(cfg: RunConfig, scene: Scene, state: State):
    """--frontend none --shard D: body-sharded batch run over a D-device
    mesh — direct via the ppermute ring (parallel/ring.py), tree via the
    O(N/D) sharded tree (parallel/tree2.py). N is zero-mass padded to the
    shard grain (make_state pad_to); diagnostics run on the user-order
    result, where padding bodies are massless and contribute nothing."""
    import time

    from spacetpu.ops import energy, tree as tree_ops
    from spacetpu.parallel import ring, tree2
    from spacetpu.state import make_state
    from spacetpu.utils.metrics import ThroughputTracker, compute_elapsed_time

    d = cfg.shard
    mesh = ring.make_mesh(d)
    if mesh.devices.size != d:
        # make_mesh silently clamps to the available devices; padding and
        # reporting would then all claim the wrong D
        raise SystemExit(
            f"--shard {d} but only {mesh.devices.size} devices are "
            f"available ({[str(x) for x in jax.devices()]})"
        )
    algo = cfg.algorithm
    if algo == "auto":
        algo = "tree" if state.n > constants.BARNES_HUT_CUTOFF else "direct"
    if int(cfg.substeps) > 1:
        print("note: --substeps (multirate) applies to the single-chip "
              "solvers only; ignored under --shard", flush=True)
    if cfg.merge_collisions or cfg.report_encounters:
        print("note: --merge-collisions/--report-encounters are single-"
              "chip features; ignored under --shard", flush=True)
    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    eps_diag = cfg.eps if cfg.eps is not None else 0.0
    tree_kw = _cfg_tree_kwargs(cfg)
    if algo == "tree":
        order = cfg.multipole_order
        if order == "auto":
            order = 2 if cfg.softening == "plummer" else 1
        n_pad = tree2.required_n(state.n, d, far_levels=2)
        # pad to the SUPER grain when the 3-level far field will engage
        # (mirrors tree2's far_levels="auto" resolution)
        if str(cfg.far_levels) == "3" or (
            cfg.far_levels == "auto" and int(order) == 2
            and n_pad // tree_ops.LEAF >= tree_ops.FAR3_CUTOFF
        ):
            n_pad = tree2.required_n(state.n, d, far_levels=3)
        if cfg.leaf != "auto" or cfg.cluster_mode != "auto":
            print("note: --leaf/--cluster-mode apply to the single-chip "
                  "tree only; the sharded tree uses LEAF-body equal-count "
                  "clusters", flush=True)
        sim = tree2.ShardedTreeSimulation(
            mesh, n_pad, theta=resolved_theta(cfg.theta),
            softening=cfg.softening,
            eps=cfg.eps, g=scene.g, integrator=cfg.integrator,
            backend=cfg.backend, multipole_order=cfg.multipole_order,
            far_levels=cfg.far_levels, near_mode=cfg.near_mode,
            k_near=tree_kw.get("k_near") if isinstance(
                tree_kw.get("k_near"), int) else None,
            run_chunk=cfg.run_chunk or None,
        )
    elif algo == "pm":
        from spacetpu.parallel import pmshard

        n_pad = -(-state.n // d) * d
        sim = pmshard.ShardedPMSimulation(
            mesh, n_pad,
            grid=(cfg.pm_grid if cfg.pm_grid == "auto" else int(cfg.pm_grid)),
            margin=cfg.pm_margin, softening=cfg.softening, eps=cfg.eps,
            g=scene.g, integrator=cfg.integrator,
        )
    elif algo == "treepm":
        from spacetpu.parallel import treepmshard

        n_pad = treepmshard.required_n(state.n, d)
        sim = treepmshard.ShardedTreePMSimulation(
            mesh, n_pad,
            grid=(cfg.pm_grid if cfg.pm_grid == "auto" else int(cfg.pm_grid)),
            margin=cfg.pm_margin, rs_cells=cfg.pm_rs_cells,
            rcut_rs=cfg.pm_rcut_rs, softening=cfg.softening, eps=cfg.eps,
            g=scene.g, integrator=cfg.integrator, backend=cfg.backend,
            k_near=tree_kw.get("k_near") if isinstance(
                tree_kw.get("k_near"), int) else None,
            run_chunk=cfg.run_chunk or None,
        )
    else:
        n_pad = -(-state.n // d) * d
        sim = ring.ShardedSimulation(
            mesh, n_pad, softening=cfg.softening, eps=cfg.eps, g=scene.g,
            integrator=cfg.integrator, backend=cfg.backend,
        )
    print(f"sharding N={state.n} (padded to {n_pad}) over {d} devices "
          f"({algo})", flush=True)
    st = make_state(state.pos, state.vel, state.mass, dtype=dtype,
                    pad_to=n_pad, compensated=cfg.compensated)
    e0 = float(energy.total_energy(st.pos, st.vel, st.mass,
                                   softening=cfg.softening, eps=eps_diag,
                                   g=scene.g))
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
    t0 = time.perf_counter()

    def next_todo(done):
        todo = cfg.steps - done
        for every in (cfg.recalibrate_every, cfg.checkpoint_every):
            if every:
                todo = min(todo, ((done // every) + 1) * every - done)
        return todo

    def at_boundaries(done, snapshot_fn):
        if (cfg.checkpoint_every and done % cfg.checkpoint_every == 0
                and done < cfg.steps):
            checkpoint.save(f"{cfg.checkpoint or 'state'}_{done}.npz",
                            snapshot_fn(), scene=None,
                            extra={"steps": done, "dt": cfg.dt})

    if algo in ("tree", "treepm"):
        ts = sim.prime(sim.shard_state(st))
        done = 0
        while done < cfg.steps:
            todo = next_todo(done)
            ts = sim.run(ts, cfg.dt, todo)
            done += todo
            if (cfg.recalibrate_every and done < cfg.steps
                    and done % cfg.recalibrate_every == 0):
                if sim.maybe_recalibrate(ts):
                    print(f"  ... step {done}: scene outgrew the "
                          f"calibrated caps — re-measured "
                          f"(k_near={getattr(sim, '_k_near', sim.k_near)})",
                          flush=True)
            at_boundaries(done, lambda: sim.user_order(ts))
        final = sim.user_order(ts)
        telemetry = sim.diagnose(ts)
    else:
        st = sim.prime(sim.shard_state(st))
        done = 0
        while done < cfg.steps:
            todo = next_todo(done)
            st = sim.run(st, cfg.dt, todo)
            done += todo
            if (algo == "pm" and cfg.recalibrate_every and done < cfg.steps
                    and done % cfg.recalibrate_every == 0):
                if sim.maybe_recalibrate(st):
                    print(f"  ... step {done}: bodies left the mesh box — "
                          f"re-measured (h={sim.mesh_params['h']:.3g})", flush=True)
            at_boundaries(done, lambda: st)
        final = st
        telemetry = sim.health(st) if algo == "pm" else None
    e1 = float(energy.total_energy(final.pos, final.vel, final.mass,
                                   softening=cfg.softening, eps=eps_diag,
                                   g=scene.g))
    wall = time.perf_counter() - t0
    if cfg.profile_dir:
        jax.profiler.stop_trace()
    # throughput against the REAL body count: padding bodies are dead
    # weight, and the figure must stay comparable to the single-chip path
    rate = ThroughputTracker(state.n).rate(cfg.steps, wall)
    print(f"{cfg.steps} steps of N={state.n} (padded {n_pad}) on {d} "
          f"devices in {wall:.2f}s "
          f"({rate['steps_per_sec']:.2f} steps/s, "
          f"{rate['pairs_per_sec']:.3e} pairs/s)")
    if telemetry is not None:
        print(f"{algo} telemetry: {telemetry}")
    print(f"simulated: {compute_elapsed_time(cfg.steps, cfg.dt)}")
    if e0 != 0.0:
        print(f"relative energy drift: {(e1 - e0) / abs(e0):.3e}")
    else:
        print(f"absolute energy drift: {e1 - e0:.3e} (E0 = 0)")
    if cfg.checkpoint:
        # scene metadata stays n-sized; checkpoint.load trims the padded
        # state rows back to the metadata length on restore
        checkpoint.save(cfg.checkpoint, final, scene=scene,
                        extra={"steps": cfg.steps, "dt": cfg.dt})
        print(f"checkpoint written to {cfg.checkpoint}")


def run_headless(cfg: RunConfig, scene: Scene, state: State):
    """--frontend none: batch stepping with metrics, checkpoints, profile."""
    import time

    from spacetpu.ops import energy
    from spacetpu.utils.metrics import ThroughputTracker, compute_elapsed_time

    if cfg.shard:
        return _run_headless_sharded(cfg, scene, state)

    algorithm = cfg.algorithm
    extra_kwargs = {}
    if cfg.algorithm == "auto" and cfg.profile == "accurate":
        # explicit opt-in (the default headless auto keeps the
        # reference's tree-iff-N>1000 parity and never switches
        # silently): the accurate tier runs the structure-cached tree —
        # chip-measured faster than TreePM at every single-chip scale
        # (constants.INTERACTIVE_TREE_REFRESH) — via the same
        # select_solver the engine path uses
        from spacetpu import constants as _C
        from spacetpu.engine import select_solver

        algorithm, extra_kwargs = select_solver(
            state, profile="accurate",
            substeps=int(cfg.substeps) if cfg.substeps.isdigit() else 1)
        if algorithm == "tree" and not cfg.tree_refresh_every:
            extra_kwargs = dict(
                extra_kwargs,
                tree_refresh_every=_C.INTERACTIVE_TREE_REFRESH)

    sim = make_simulation(
        state.n, algorithm=algorithm, backend=cfg.backend,
        integrator=cfg.integrator, softening=cfg.softening, eps=cfg.eps,
        theta=resolved_theta(cfg.theta), g=scene.g,
        multipole_order=cfg.multipole_order,
        **dict(_cfg_tree_kwargs(cfg), **extra_kwargs),
    )
    state = sim.prime(state)
    eps_diag = cfg.eps if cfg.eps is not None else 0.0

    def report_encounters(tag, radii_now=None):
        if not cfg.report_encounters:
            return
        from spacetpu.ops import encounters

        mask = None if radii_now is None else jnp.asarray(radii_now) > 0
        d, i, j = encounters.min_separation(state.pos, mask=mask)
        print(f"min separation ({tag}): {float(d):.6e} "
              f"(bodies {int(i)} <-> {int(j)})", flush=True)

    report_encounters("start")
    # Drift diagnostic. For --softening ref the force law's true potential
    # has no closed form; total_energy uses the bare 1/r approximation
    # (see ops/energy.py), so printed "ref" drift is approximate — exact
    # only for plummer.
    e0 = float(energy.total_energy(state.pos, state.vel, state.mass,
                                   softening=cfg.softening, eps=eps_diag,
                                   g=scene.g))
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
    t0 = time.perf_counter()
    done = 0
    last_report = [time.perf_counter()]
    base = [0]

    def report(at):
        now = time.perf_counter()
        if now - last_report[0] >= 30.0:
            total = base[0] + at
            rate = total / max(now - t0, 1e-9)
            print(f"  ... {total}/{cfg.steps} steps "
                  f"({rate:.2f} steps/s incl. compile)", flush=True)
            last_report[0] = now

    radii_dev = None
    merged_total = 0
    energy_lost = 0.0
    if cfg.merge_collisions:
        # scene.radii is the persistent owner: a --restore of a merged
        # run's checkpoint carries the post-merge radii (absorbed bodies
        # at radius 0), so dead tracers can never phantom-re-merge
        radii_dev = jnp.asarray(scene.radii, state.pos.dtype)
    while done < cfg.steps:
        # sim.run chunks its device scans internally (the scan x dense-k
        # fence, Simulation.scan_chunk); the host loop here only stops at
        # checkpoint/recalibration/merge boundaries.
        todo = cfg.steps - done
        for every in (cfg.checkpoint_every, cfg.recalibrate_every,
                      cfg.merge_collisions):
            if every:
                todo = min(todo, ((done // every) + 1) * every - done)
        base[0] = done
        state = sim.run(state, cfg.dt, todo, progress=report)
        done += todo
        if cfg.merge_collisions and done % cfg.merge_collisions == 0:
            from spacetpu.ops import collisions

            state, radii_dev, k, de = collisions.merge_all_overlapping(
                state, radii_dev)
            if k:
                merged_total += k
                energy_lost += de
                # persist through scene metadata (checkpoints save it)
                scene.radii = np.asarray(radii_dev, np.float32)
                # the merged rows' acc cache was zeroed; refresh it
                state = sim.prime(state)
                print(f"  ... step {done}: merged {k} overlapping pair(s) "
                      f"({merged_total} total; inelastic KE loss "
                      f"{energy_lost:.3e})", flush=True)
        if (cfg.recalibrate_every and done % cfg.recalibrate_every == 0
                and done < cfg.steps):
            if sim.maybe_recalibrate(state):
                mp = sim.mesh_params
                what = (f"box h={mp['h']:.3g}" if mp is not None
                        else f"k_near={sim.caps['k_near']}")
                print(f"  ... step {done}: scene outgrew the calibrated "
                      f"caps — re-measured ({what})", flush=True)
            if (getattr(sim, "degenerate", None)
                    and cfg.algorithm == "auto"):
                # auto-selected mesh solver degraded out of its regime
                # mid-rollout (e.g. a collapsing scene saturating the
                # TreePM cutoff, r4w18) — swap families like the engine
                # loop does; a PINNED algorithm only warns (calibrate
                # already did)
                reason = sim.degenerate
                sim = make_simulation(
                    state.n, algorithm="tree", backend=cfg.backend,
                    integrator=cfg.integrator, softening=cfg.softening,
                    eps=cfg.eps, theta=max(resolved_theta(cfg.theta), 0.5),
                    g=scene.g, multipole_order=cfg.multipole_order,
                    **_cfg_tree_kwargs(cfg),
                )
                state = sim.prime(state)
                print(f"  ... step {done}: FAMILY FALLBACK -> tree "
                      f"(reason: {reason}; caps k_near="
                      f"{sim.caps['k_near']})", flush=True)
        if cfg.checkpoint_every and done % cfg.checkpoint_every == 0:
            checkpoint.save(f"{cfg.checkpoint or 'state'}_{done}.npz", state,
                            scene=scene)
    e1 = float(energy.total_energy(state.pos, state.vel, state.mass,
                                   softening=cfg.softening, eps=eps_diag,
                                   g=scene.g))
    wall = time.perf_counter() - t0
    if cfg.profile_dir:
        jax.profiler.stop_trace()
    rate = ThroughputTracker(state.n).rate(cfg.steps, wall)
    print(f"{cfg.steps} steps of N={state.n} in {wall:.2f}s "
          f"({rate['steps_per_sec']:.2f} steps/s, "
          f"{rate['pairs_per_sec']:.3e} pairs/s)")
    if sim.config.resolved_algorithm() == "tree":
        health = sim.health(state)
        if health["near_overflow"]:
            print(f"WARNING: {health['near_overflow']} of "
                  f"{health['clusters']} clusters overflowed the near-list "
                  f"cap (k_near={health['k_near']}) — their dropped "
                  f"neighbors fall back to far-field accuracy")
        else:
            print(f"tree health: 0/{health['clusters']} near-list "
                  f"overflows (k_near={health['k_near']})")
    elif sim.config.resolved_algorithm() == "pm":
        health = sim.health(state)
        if health.get("out_of_box"):
            print(f"WARNING: {health['out_of_box']} of {state.n} bodies "
                  f"left the calibrated mesh box (deposit face-clamped — "
                  f"re-run with --recalibrate-every or a larger "
                  f"--pm-margin)")
        else:
            print(f"pm health: 0/{state.n} bodies out of the "
                  f"{health['grid']}^3 mesh box")
    print(f"simulated: {compute_elapsed_time(cfg.steps, cfg.dt)}")
    report_encounters("end", radii_dev)
    if merged_total:
        alive = int(jnp.sum(jnp.asarray(radii_dev) > 0))
        print(f"collisions: {merged_total} merger(s); {alive} bodies "
              f"remain; inelastic KE loss {energy_lost:.3e} (part of the "
              f"drift figure below)")
    if e0 != 0.0:
        print(f"relative energy drift: {(e1 - e0) / abs(e0):.3e}")
    else:
        # e.g. fixed_shell: massless tracers + stationary center => E = 0
        print(f"absolute energy drift: {e1 - e0:.3e} (E0 = 0)")
    if cfg.checkpoint:
        checkpoint.save(cfg.checkpoint, state, scene=scene,
                        extra={"steps": cfg.steps, "dt": cfg.dt})
        print(f"checkpoint written to {cfg.checkpoint}")


def main(argv=None):
    cfg = parse_args(argv)
    if cfg.platform != "auto":
        # Must be a config.update, not an env var: TPU plugins (axon)
        # force-select their backend via jax.config at import time, which
        # silently overrides JAX_PLATFORMS from the environment.
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.coordinator:
        # must happen before any device query (parallel/multihost.py)
        from spacetpu.parallel import multihost

        multihost.initialize(
            coordinator_address=cfg.coordinator,
            num_processes=cfg.num_processes or None,
            process_id=cfg.process_id if cfg.process_id >= 0 else None,
        )
    if cfg.pm_fft != "auto":
        # module-level switch, resolved at trace time (ops/pm.py)
        from spacetpu.ops import pm as _pm_ops

        _pm_ops.PM_FFT_METHOD = cfg.pm_fft
    scene = build_scene(cfg)
    state, scene = resolve_state(cfg, scene)
    # device enumeration log: the analogue of the reference's adapter
    # listing at startup (surface.rs:94-105)
    devs = jax.devices()
    print(f"Compute devices: {[str(d) for d in devs]} "
          f"(platform={devs[0].platform})")
    print(f"Running with {scene.n} objects "
          f"({cfg.preset}, dt={cfg.dt}s, {cfg.frontend})")
    if cfg.substeps == "auto":
        if cfg.shard:
            cfg.substeps = "1"  # sharded paths step uniformly (note below)
        else:
            state = _resolve_auto_substeps(cfg, scene, state)

    if cfg.frontend == "none":
        run_headless(cfg, scene, state)
        return

    from spacetpu.render.viewer import (
        FrameSource, OfflineViewer, TerminalViewer,
    )

    engine = build_engine(cfg, scene, state)
    if cfg.algorithm == "auto":
        # telemetry-visible accuracy mode: auto may pick a mesh solver at
        # large N (constants.MESH_SOLVER_CUTOFF) whose force accuracy is
        # grid-limited rather than exact-near
        mode = ("mesh-accuracy (grid-limited forces)"
                if engine.algorithm in ("pm", "treepm")
                else "exact-near forces")
        print(f"auto solver: {engine.algorithm} [{mode}] at N={state.n}",
              flush=True)
    source = FrameSource(engine, scene, width=cfg.width, height=cfg.height,
                         auto_frame=cfg.auto_frame,
                         trail_length=cfg.trail_length, blend=cfg.blend)
    with engine:
        if cfg.frontend == "offline":
            OfflineViewer(source, cfg.out_dir).run(cfg.frames, gif=cfg.gif)
        elif cfg.frontend == "window":
            from spacetpu.render.window import WindowViewer

            WindowViewer(source).run(max_frames=cfg.frames)
        else:
            TerminalViewer(source, graphics=cfg.term_graphics).run(max_frames=cfg.frames)
    if cfg.checkpoint and engine.final_state is not None:
        if cfg.merge_collisions and engine.radii_snapshot is not None:
            scene.radii = engine.radii_snapshot  # persist merged radii
        checkpoint.save(cfg.checkpoint, engine.final_state, scene=scene)
        print(f"checkpoint written to {cfg.checkpoint}")
    print("Task completed")


if __name__ == "__main__":
    main(sys.argv[1:])
