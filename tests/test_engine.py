"""Engine tests: exchange handshake, sim loop thread, live dt, checkpoint."""

import threading
import time

import pytest

import jax.numpy as jnp
import numpy as np

from spacetpu import make_simulation
from spacetpu.engine import Exchange, SimEngine, make_engine_for, run_sim_loop
from spacetpu.models import presets


def _sim_and_state(n=64):
    scene = presets.random_cluster(n, seed=0)
    sim = make_simulation(n, algorithm="direct", backend="xla",
                          softening="plummer", eps=1e-2, g=1.0)
    return sim, scene.state(dtype=jnp.float32), scene


def test_exchange_cas_semantics():
    # should_store true exactly once until the UI samples again
    # (batch_request.rs:36-41).
    ex = Exchange(4)
    assert ex.should_store()
    assert not ex.should_store()
    ex.sample()
    assert ex.should_store()


def test_exchange_store_sample_roundtrip():
    ex = Exchange(3)
    data = np.arange(9, dtype=np.float64).reshape(3, 3)
    ex.store(data, tick=17)
    out = ex.sample()
    assert out.dtype == np.float32  # the f64->f32 downcast of store()
    np.testing.assert_allclose(out, data)
    assert ex.current_ticks() == 17


def test_exchange_sync_credit():
    # The queue-bound accounting: a consumer materializing a pending
    # device-side handle drains the dispatch queue up to the handle's
    # tick, so sample() credits it to synced_tick and the sim thread's
    # own SYNC_EVERY scalar readback is skipped while a frontend is
    # actively sampling. note_synced records the sim thread's readback.
    ex = Exchange(3)
    assert ex.synced_tick() == 0
    handle = jnp.arange(9, dtype=jnp.float32).reshape(3, 3)
    ex.store_pending(handle, tick=12, wire="f32")
    ex.sample()
    assert ex.synced_tick() == 12
    ex.note_synced(20)
    assert ex.synced_tick() == 20
    # monotone: stale credits never move it backwards
    ex.note_synced(5)
    assert ex.synced_tick() == 20
    ex.store_pending(handle, tick=7, wire="f32")
    ex.sample()
    assert ex.synced_tick() == 20


def test_sample_ride_does_not_hold_device_lock(monkeypatch):
    """The consumer's snapshot materialization rides under TRANSFER_LOCK,
    not DEVICE_LOCK (r5 overlap probe: the ride overlaps dispatches
    safely), so the sim thread can keep dispatching while a frame rides
    down. Regression: sample() blocking DEVICE_LOCK for the ride was the
    residual 1.3x sampled tick of r4w12."""
    from spacetpu import engine as eng_mod

    ex = Exchange(3)
    ex.store_pending(jnp.zeros((3, 3), jnp.float32), tick=4, wire="f32")

    riding = threading.Event()
    release = threading.Event()
    real_finish = eng_mod._snapshot_finish

    def slow_finish(handle, wire):
        riding.set()
        assert release.wait(5.0)
        return real_finish(handle, wire)

    monkeypatch.setattr(eng_mod, "_snapshot_finish", slow_finish)
    t = threading.Thread(target=ex.sample, daemon=True)
    t.start()
    assert riding.wait(5.0)
    # mid-ride, the device must be available to the sim thread
    got = eng_mod.DEVICE_LOCK.acquire(timeout=2.0)
    try:
        assert got, "sample() held DEVICE_LOCK across the ride"
    finally:
        if got:
            eng_mod.DEVICE_LOCK.release()
        release.set()
        t.join(5.0)


def test_run_sim_loop_stops_on_token():
    sim, state, _ = _sim_and_state()
    ex = Exchange(64, delta=1e-3)
    stop = threading.Event()
    result = {}

    def run():
        result["state"] = run_sim_loop(sim, state, ex, stop)

    t = threading.Thread(target=run)
    t.start()
    # let it tick, pull a few samples
    deadline = time.time() + 20
    while ex.current_ticks() < 5 and time.time() < deadline:
        ex.sample()
        time.sleep(0.01)
    stop.set()
    # the loop only checks the token when no sample is pending; drain once
    ex_ticks = ex.current_ticks()
    t.join(20)
    assert not t.is_alive()
    assert ex_ticks >= 5
    assert np.isfinite(np.asarray(result["state"].pos)).all()


def test_engine_live_dt_tuning():
    sim, state, _ = _sim_and_state()
    eng = SimEngine(sim, state, delta=1e-3)
    with eng:
        deadline = time.time() + 30
        while eng.exchange.current_ticks() == 0 and time.time() < deadline:
            eng.exchange.sample()  # keep requesting so the loop publishes
            time.sleep(0.01)
        eng.exchange.set_delta(2e-3)  # ui.rs:128-133 live tuning
        eng.exchange.sample()
        assert eng.exchange.current_ticks() > 0
    assert eng.final_state is not None


def test_make_engine_for_auto_select():
    # N <= cutoff -> direct; N > cutoff -> tree (event_loop.rs:334-340).
    _, state_small, _ = _sim_and_state(64)
    eng = make_engine_for(state_small, backend="xla", g=1.0,
                          softening="plummer", eps=1e-2)
    assert eng.sim.config.algorithm == "direct"

    scene_big = presets.random_cluster(1100, seed=1)
    eng2 = make_engine_for(scene_big.state(dtype=jnp.float32), backend="xla",
                           g=1.0, softening="plummer", eps=1e-2)
    assert eng2.sim.config.algorithm == "tree"


def test_make_engine_for_interactive_theta():
    """The auto tree tier defaults to INTERACTIVE_TREE_THETA (0.4): quad
    + adaptive clusters at 0.4 measure LOWER med/p90 force error than the
    reference octree at its 0.3 default for ~1.9x less near work
    (tools/probes/_theta_parity_probe.py). Explicit theta pins; pinned
    CLI solvers resolve to reference parity 0.3."""
    from spacetpu import constants as C
    from spacetpu.utils.config import resolved_theta

    scene_big = presets.random_cluster(1100, seed=1)
    eng = make_engine_for(scene_big.state(dtype=jnp.float32), backend="xla",
                          g=1.0, softening="plummer", eps=1e-2)
    assert eng.sim.config.algorithm == "tree"
    assert eng.sim.config.theta == C.INTERACTIVE_TREE_THETA

    eng2 = make_engine_for(scene_big.state(dtype=jnp.float32), theta=0.7,
                           backend="xla", g=1.0, softening="plummer",
                           eps=1e-2)
    assert eng2.sim.config.theta == 0.7

    assert resolved_theta(None) == C.BARNES_HUT_THETA
    assert resolved_theta(0.55) == 0.55


def test_make_engine_for_mesh_tier(monkeypatch):
    """Above MESH_SOLVER_CUTOFF the interactive auto-select picks the PM
    solver (round-4: 145 ms vs 364 ms/tick at N=1M on chip), surfaces the
    choice as telemetry, and actually ticks with it — unless multirate
    substeps (pair-force machinery) pin the tree."""
    from spacetpu import constants as C

    monkeypatch.setattr(C, "MESH_SOLVER_CUTOFF", 1024)
    scene = presets.random_cluster(1500, seed=2)
    eng = make_engine_for(scene.state(dtype=jnp.float32), backend="xla",
                          g=1.0, softening="plummer", eps=1e-2)
    assert eng.algorithm == "pm"
    with eng:
        t0 = time.time()
        while eng.exchange.current_ticks() == 0 and time.time() - t0 < 60:
            eng.check_health()
            time.sleep(0.01)
        assert eng.exchange.current_ticks() > 0
    st = eng.final_state
    assert eng.sim.health(st)["algorithm"] == "pm"
    assert bool(jnp.all(jnp.isfinite(st.pos)))

    eng2 = make_engine_for(scene.state(dtype=jnp.float32), backend="xla",
                           g=1.0, softening="plummer", eps=1e-2, substeps=4)
    assert eng2.algorithm == "tree"


def test_make_engine_for_mesh_resolution_gate(monkeypatch):
    """Concentrated scenes are gated OUT of the PM tier: a Plummer
    sphere's halo outliers stretch the PM box until the core sits inside
    a couple of cells (median force error ~1.0 measured on chip,
    logs/r4w2_r4_scorecard.log) — auto keeps the tree there while a
    quasi-uniform cloud of the same N takes the mesh."""
    from spacetpu import constants as C
    from spacetpu.engine import mesh_resolves

    monkeypatch.setattr(C, "MESH_SOLVER_CUTOFF", 1024)
    plum = presets.plummer_sphere(1500, seed=3)
    assert not mesh_resolves(plum.state(dtype=jnp.float32), grid=128)
    eng = make_engine_for(plum.state(dtype=jnp.float32), backend="xla",
                          g=1.0, softening="plummer", eps=1e-2)
    assert eng.algorithm == "tree"
    cloud = presets.random_cluster(1500, seed=3)
    assert mesh_resolves(cloud.state(dtype=jnp.float32), grid=128)


def test_checkpoint_roundtrip(tmp_path):
    from spacetpu.io import checkpoint

    sim, state, scene = _sim_and_state()
    state = sim.prime(state)
    state = sim.run(state, 1e-3, 5)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state, scene=scene, extra={"steps": 5})
    loaded, loaded_scene, extra = checkpoint.load(path)
    np.testing.assert_array_equal(np.asarray(loaded.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(loaded.vel), np.asarray(state.vel))
    assert extra == {"steps": 5}
    assert loaded_scene.names == scene.names
    # resumed run continues bit-identically vs an uninterrupted one
    a = sim.run(loaded, 1e-3, 5)
    b = sim.run(state, 1e-3, 5)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_checkpoint_orbax_roundtrip(tmp_path):
    from spacetpu.io import checkpoint

    sim, state, _ = _sim_and_state()
    state = sim.prime(state)
    path = str(tmp_path / "orbax_ck")
    checkpoint.save_orbax(path, state, extra={"steps": 3})
    loaded, extra = checkpoint.load_orbax(path)
    np.testing.assert_array_equal(np.asarray(loaded.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(loaded.acc), np.asarray(state.acc))
    assert extra == {"steps": 3}


def test_checkpoint_dtype_override(tmp_path):
    from spacetpu.io import checkpoint

    sim, state, _ = _sim_and_state()
    path = str(tmp_path / "ck32.npz")
    checkpoint.save(path, state)
    loaded, _, _ = checkpoint.load(path, dtype=np.float64)
    assert loaded.pos.dtype == jnp.float64


def test_frame_source_renders_and_applies_keys():
    """FrameSource: exchange sample -> trails -> render; key handling
    reaches camera/engine (the per-frame sequence of ui.rs:75-162)."""
    from spacetpu.render.viewer import FrameSource, KeyState

    sim, state, scene = _sim_and_state(32)
    eng = SimEngine(sim, state, delta=1e-3)
    src = FrameSource(eng, scene, width=64, height=48)
    with eng:
        f1 = src.frame()
        assert f1.shape == (48, 64, 3) and f1.dtype == np.uint8
        d0 = np.linalg.norm(src.camera.eye - src.camera.target)
        src.apply_keys(KeyState(plus=True))  # zoom in: 10% of distance
        d1 = np.linalg.norm(src.camera.eye - src.camera.target)
        assert d1 == pytest.approx(d0 * 0.9)
        dt0 = eng.exchange.delta()
        src.apply_keys(KeyState(l=True))  # dt *= 0.9 (ui.rs:128-133)
        assert eng.exchange.delta() == pytest.approx(dt0 * 0.9)
        src.apply_keys(KeyState(g=True))  # focus body 0
        assert src.camera.focus == 0
        f2 = src.frame()
        assert np.isfinite(f2).all()
    lines = src.info_lines()
    assert any("Current time" in l for l in lines)
    assert any("Focused object" in l for l in lines)


def test_engine_surfaces_sim_thread_failure():
    """check_health re-raises a sim-thread exception in the caller."""
    sim, state, _ = _sim_and_state(16)

    class Boom:  # duck-typed Simulation whose step always raises
        def __init__(self, inner):
            self.config = inner.config
            self.prime = inner.prime
            self.run = inner.run

            def bad_step(s, dt):
                raise RuntimeError("kaboom")

            self.step = bad_step

    eng = SimEngine(Boom(sim), state, delta=1e-3)
    eng.start()
    deadline = time.time() + 10
    while eng.error is None and time.time() < deadline:
        time.sleep(0.01)
    assert eng.error is not None
    with pytest.raises(RuntimeError, match="simulation thread failed"):
        eng.check_health()
    eng.stop()


def test_engine_concurrent_consumers_stress():
    """Race check: the sim thread plus two frontend threads hammering the
    exchange and renderer concurrently — everything device-touching goes
    through DEVICE_LOCK, so this must neither deadlock nor corrupt state
    (the TPU-side analogue of the reference leaning on Rust's ownership,
    SURVEY.md SS5 'race detection')."""
    from spacetpu.render.viewer import FrameSource, KeyState

    sim, state, scene = _sim_and_state(48)
    eng = SimEngine(sim, state, delta=1e-3)
    src = FrameSource(eng, scene, width=48, height=32)
    errors = []
    frames = []

    def consumer(kind):
        try:
            for _ in range(15):
                if kind == "render":
                    frames.append(src.frame())
                else:
                    eng.exchange.sample()
                    eng.exchange.set_delta(eng.exchange.delta())
                    src.apply_keys(KeyState(plus=True))
                time.sleep(0.002)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    with eng:
        t1 = threading.Thread(target=consumer, args=("render",))
        t2 = threading.Thread(target=consumer, args=("keys",))
        t1.start(); t2.start()
        t1.join(60); t2.join(60)
        assert not t1.is_alive() and not t2.is_alive(), "consumer hung"
    assert not errors, errors
    assert eng.error is None
    assert all(np.isfinite(f).all() for f in frames)


def test_profiler_trace_writes(tmp_path):
    """jax.profiler hook produces a trace directory (the pprof-flamegraph
    analogue, benches/perf.rs parity)."""
    import os

    from spacetpu.utils.profiling import trace

    sim, state, _ = _sim_and_state(16)
    state = sim.prime(state)
    with trace(str(tmp_path)):
        state = sim.run(state, 1e-3, 3)
        np.asarray(state.pos)
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if f.endswith((".pb", ".json.gz", ".xplane.pb"))]
    assert found, "no trace artifacts written"


def test_every_preset_runs_headless():
    """CLI smoke: every registered preset steps a few ticks end-to-end."""
    from spacetpu.main import main
    from spacetpu.models import presets as preset_mod

    for preset in sorted(preset_mod.PRESETS):
        main([
            "--preset", preset, "--n", "80", "--frontend", "none",
            "--steps", "3", "--algorithm", "direct", "--dt", "1.0",
        ])


def test_cli_config_parsing():
    from spacetpu.utils.config import parse_args

    cfg = parse_args([
        "--preset", "fixed_shell", "--n", "123", "--frontend", "none",
        "--steps", "7", "--dt", "2.5", "--algorithm", "direct",
    ])
    assert cfg.preset == "fixed_shell"
    assert cfg.n == 123
    assert cfg.steps == 7
    assert cfg.dt == 2.5
    assert cfg.profile == "interactive"  # default
    round_trip = type(cfg).from_json(cfg.to_json())
    assert round_trip == cfg

    cfg2 = parse_args(["--profile", "accurate"])
    assert cfg2.profile == "accurate"

    cfg3 = parse_args(["--pallas-method", "mxu"])
    assert cfg3.pallas_method == "mxu"
    assert cfg.pallas_method == "vpu"  # default


def test_checkpoint_orbax_sharded_roundtrip(tmp_path):
    """Sharded save/restore without host gather: each shard written from
    and restored to its device (VERDICT r1 item 8). Runs on the 8-device
    CPU mesh; shardings must survive the round trip."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spacetpu.io import checkpoint
    from spacetpu.parallel import ring
    from spacetpu.state import make_state

    mesh = ring.make_mesh(8)
    rng = np.random.default_rng(0)
    n = 8 * 32
    state = make_state(rng.normal(size=(n, 3)), rng.normal(size=(n, 3)),
                       rng.uniform(0.5, 1.5, n), dtype=jnp.float32)
    sim = ring.ShardedSimulation(mesh, n, softening="plummer", eps=1e-2,
                                 g=1.0, backend="xla")
    sharded = sim.shard_state(state)
    path = str(tmp_path / "orbax_sharded")
    checkpoint.save_orbax(path, sharded, extra={"mesh": 8})

    # restore directly onto the mesh using the live state as the template
    loaded, extra = checkpoint.load_orbax(path, like=sharded)
    assert extra == {"mesh": 8}
    assert loaded.pos.sharding == sharded.pos.sharding
    assert loaded.pos.sharding.spec == P(ring.AXIS)
    np.testing.assert_allclose(np.asarray(loaded.pos),
                               np.asarray(sharded.pos))
    np.testing.assert_allclose(np.asarray(loaded.mass),
                               np.asarray(sharded.mass))
    # and the restored state steps (shardings are really usable)
    out = sim.step(loaded, jnp.float32(1e-3))
    assert bool(jnp.all(jnp.isfinite(out.pos)))


def test_run_host_chunking_matches_single_scan():
    """Simulation.run with run_chunk set (the scan x dense-near-list fence)
    must produce the identical trajectory to one long device scan — the
    chunks replay the same step sequence."""
    scene = presets.random_cluster(96, seed=3)
    kw = dict(algorithm="direct", backend="xla", softening="plummer",
              eps=1e-2, g=1.0)
    sim_a = make_simulation(96, **kw)
    sim_b = make_simulation(96, run_chunk=3, **kw)
    sim_c = make_simulation(96, run_chunk=1, **kw)  # step()-dispatch tier
    assert sim_b.scan_chunk() == 3
    assert sim_c.scan_chunk() == 1
    sa = sim_a.prime(scene.state(dtype=jnp.float32))
    sb = sim_b.prime(scene.state(dtype=jnp.float32))
    sc = sim_c.prime(scene.state(dtype=jnp.float32))
    sa = sim_a.run(sa, 1e-3, 7)
    sb = sim_b.run(sb, 1e-3, 7)  # 3 + 3 + 1
    sc = sim_c.run(sc, 1e-3, 7)  # 7x step() (DENSE_TILES_SINGLE_STEP form)
    np.testing.assert_array_equal(np.asarray(sa.pos), np.asarray(sb.pos))
    np.testing.assert_array_equal(np.asarray(sa.vel), np.asarray(sb.vel))
    np.testing.assert_array_equal(np.asarray(sa.pos), np.asarray(sc.pos))
    np.testing.assert_array_equal(np.asarray(sa.vel), np.asarray(sc.vel))


def test_scan_chunk_policy():
    """The auto fence engages only on the TPU/pallas path; dense calibrated
    near lists drop the chunk to the safe length."""
    from spacetpu import sim as sim_mod

    # CPU/XLA: unlimited scans (tests want single programs)
    s = make_simulation(64, algorithm="direct", backend="xla")
    assert s.scan_chunk() is None
    # explicit run_chunk always wins
    s = make_simulation(64, algorithm="direct", backend="xla", run_chunk=5)
    assert s.scan_chunk() == 5
    # pallas direct: default chunk
    s = make_simulation(64, algorithm="direct", backend="pallas")
    assert s.scan_chunk() == sim_mod.DEFAULT_RUN_CHUNK
    # pallas tree with a dense (calibrated) cap: safe length
    s = make_simulation(100_000, algorithm="tree", backend="pallas",
                        k_near=2048)
    assert s.scan_chunk() == sim_mod.SAFE_DENSE_SCAN
    # pallas tree with a sparse cap: default chunk
    s = make_simulation(100_000, algorithm="tree", backend="pallas",
                        k_near=128)
    assert s.scan_chunk() == sim_mod.DEFAULT_RUN_CHUNK
    # extreme near work (dense k at 1M-scale: est. tiles > 1e6): even
    # short scans fault (r3_bisect2 equal/far3) -> single-step dispatches
    s = make_simulation(1_000_000, algorithm="tree", backend="pallas",
                        k_near=4096)
    assert s.scan_chunk() == 1


def test_engine_cached_tree_structure():
    """run_sim_loop with tree_refresh_every > 1 drives the cached-structure
    step (VERDICT r2 #7) and stays close to the rebuild-every-tick loop."""
    n = 2048
    scene = presets.random_cluster(n, seed=5)
    kw = dict(algorithm="tree", backend="xla", softening="plummer",
              eps=1e-2, g=1.0, theta=0.5)
    sim_cached = make_simulation(n, tree_refresh_every=4, **kw)
    sim_plain = make_simulation(n, **kw)

    def drive(sim, ticks=6):
        ex = Exchange(n, delta=1e-3)
        stop = threading.Event()
        out = {}

        def run():
            out["state"] = run_sim_loop(sim, scene.state(dtype=jnp.float32),
                                        ex, stop)

        t = threading.Thread(target=run)
        t.start()
        deadline = time.time() + 60
        while ex.current_ticks() < ticks and time.time() < deadline:
            ex.sample()
            time.sleep(0.01)
        stop.set()
        t.join(30)
        assert not t.is_alive()
        return out["state"]

    sc = drive(sim_cached)
    assert np.isfinite(np.asarray(sc.pos)).all()
    # cached-structure physics tracks the exact rebuild-every-tick step:
    # run the plain sim the same number of ticks deterministically
    ticks = 8
    sp = sim_plain.prime(scene.state(dtype=jnp.float32))
    sq = sim_cached.prime(scene.state(dtype=jnp.float32))
    structure = None
    for k in range(ticks):
        sp = sim_plain.step(sp, 1e-3)
        if structure is None or k % 4 == 0:
            structure = sim_cached.build_structure(sq)
        sq = sim_cached.step_cached(sq, structure, 1e-3)
    err = np.max(np.abs(np.asarray(sp.pos) - np.asarray(sq.pos)))
    scale = np.max(np.abs(np.asarray(sp.pos)))
    assert err <= 1e-3 * scale


def test_window_viewer_headless():
    """The native SDL window frontend (render/window.py) runs under the
    dummy video driver: frames render, edge keys (KEYDOWN) and held keys
    (get_pressed) reach the camera/engine, resize re-targets the render.
    The real-display path differs only in the final blit."""
    import os

    os.environ["SDL_VIDEODRIVER"] = "dummy"
    pygame = pytest.importorskip("pygame")
    from spacetpu.render.window import WindowViewer

    sim, state, scene = _sim_and_state(32)
    eng = SimEngine(sim, state, delta=1e-3)
    src = FrameSource(eng, scene, width=64, height=48)
    with eng:
        viewer = WindowViewer(src, fps=1000.0)
        try:
            dt0 = eng.exchange.delta()
            # edge key: l -> dt *= 0.9 (ui.rs:128-133)
            pygame.event.post(pygame.event.Event(
                pygame.KEYDOWN, key=pygame.key.key_code("l")))
            n = viewer.run(max_frames=2)
            assert n == 2
            assert eng.exchange.delta() == pytest.approx(dt0 * 0.9)
            # resize event re-targets the framebuffer
            pygame.display.init()  # run() quits the display on exit
            viewer._screen = pygame.display.set_mode((64, 48),
                                                     pygame.RESIZABLE)
            pygame.event.post(pygame.event.Event(
                pygame.VIDEORESIZE, w=100, h=80))
            viewer.run(max_frames=1)
            assert (src.width, src.height) == (100, 80)
            frame = src.frame()
            assert frame.shape == (80, 100, 3)
        finally:
            pygame.display.quit()


# needed by test_window_viewer_headless / test_frame_source tests
from spacetpu.render.viewer import FrameSource  # noqa: E402


def test_cli_sharded_headless():
    """--shard D runs the body-sharded headless path end-to-end on the
    virtual mesh: ppermute ring for direct, the O(N/D) sharded tree
    (auto-calibrated, telemetry printed) for tree; N is zero-mass padded
    to the shard grain."""
    from spacetpu.main import main

    main([
        "--preset", "plummer_sphere", "--n", "250", "--frontend", "none",
        "--steps", "3", "--algorithm", "direct", "--dt", "1e-3",
        "--eps", "1e-2", "--shard", "8",
    ])
    main([
        "--preset", "plummer_sphere", "--n", "1200", "--frontend", "none",
        "--steps", "3", "--algorithm", "tree", "--k-near", "auto",
        "--dt", "1e-3", "--eps", "1e-2", "--shard", "2",
        "--recalibrate-every", "2",
    ])
    main([
        "--preset", "fixed_cloud", "--n", "600", "--frontend", "none",
        "--steps", "3", "--algorithm", "pm", "--pm-grid", "32",
        "--dt", "1e-3", "--shard", "8", "--recalibrate-every", "2",
    ])
    main([
        "--preset", "fixed_cloud", "--n", "600", "--frontend", "none",
        "--steps", "3", "--algorithm", "treepm", "--pm-grid", "32",
        "--dt", "1e-3", "--shard", "2", "--recalibrate-every", "2",
    ])


def test_cli_sharded_checkpoint_restores_single_chip(tmp_path):
    """A --shard run checkpoints its grain-padded state with the n-sized
    scene metadata; restoring it single-chip must trim the inert zero-mass
    pad rows back to the scene's body count and continue."""
    from spacetpu.main import main

    ck = str(tmp_path / "padded.npz")
    common = ["--preset", "plummer_sphere", "--n", "1200", "--frontend",
              "none", "--algorithm", "tree", "--k-near", "auto",
              "--dt", "1e-3", "--eps", "1e-2"]
    main(common + ["--steps", "2", "--shard", "2", "--checkpoint", ck])
    main(common + ["--steps", "2", "--restore", ck])


def test_snapshot_wire_roundtrip_unit():
    # _snapshot_begin/_snapshot_finish: f32 is exact; u16 reconstructs to
    # within one quantization step of the box (<= box_extent/65535).
    from spacetpu.engine import _snapshot_begin, _snapshot_finish

    sim, state, _ = _sim_and_state(128)
    pos = np.asarray(state.pos, np.float64)
    exact = _snapshot_finish(_snapshot_begin(state, "f32"), "f32")
    assert exact.dtype == np.float32
    np.testing.assert_allclose(exact, pos, atol=0)
    quant = _snapshot_finish(_snapshot_begin(state, "u16"), "u16")
    assert quant.dtype == np.float32
    step = (pos.max(axis=0) - pos.min(axis=0)) / 65535.0
    assert (np.abs(quant - pos) <= step[None, :] * 0.75 + 1e-12).all()


def test_run_sim_loop_rejects_unknown_wire():
    sim, state, _ = _sim_and_state()
    with pytest.raises(ValueError, match="snapshot wire"):
        run_sim_loop(sim, state, Exchange(64), threading.Event(),
                     snapshot_wire="bf8")


def test_engine_u16_snapshot_wire_end_to_end():
    # The quantized wire through the real sim thread: sampled positions
    # track the simulation to display precision while it advances.
    sim, state, _ = _sim_and_state()
    eng = SimEngine(sim, state, delta=1e-3, snapshot_wire="u16")
    with eng:
        deadline = time.time() + 30
        while eng.exchange.current_ticks() < 3 and time.time() < deadline:
            eng.exchange.sample()
            time.sleep(0.01)
    eng.check_health()
    assert eng.exchange.current_ticks() >= 3
    snap = eng.exchange.sample()
    final = np.asarray(eng.final_state.pos, np.float64)
    # the snapshot lags the final state by <= check_interval ticks of a
    # tiny dt — bound the drift loosely, the point is "right scene, right
    # scale, finite", not bitwise trajectory match
    assert snap.shape == final.shape
    assert np.isfinite(snap).all()
    box = final.max() - final.min()
    assert np.abs(snap - final).max() < 0.2 * box


def test_make_engine_for_mesh_tier_grid_ladder(monkeypatch):
    """Scenes too concentrated for the default grid but resolvable at the
    matmul-DFT-unlocked 256 tier get PM at grid=256 instead of falling
    back to the tree (r4w11: PM grid=256 steps 228 ms at N=1M, ~4x the
    tree's tick rate)."""
    from spacetpu import constants as C
    from spacetpu.engine import mesh_resolves
    from spacetpu.state import make_state

    monkeypatch.setattr(C, "MESH_SOLVER_CUTOFF", 1024)
    rng = np.random.default_rng(7)
    n = 1500
    pos = rng.normal(size=(n, 3))
    # two light outliers stretch the box so h(default grid) cannot
    # resolve the 10%-mass radius (~0.8), but h(256) can
    pos[0] = (35.0, 0.0, 0.0)
    pos[1] = (-35.0, 0.0, 0.0)
    st = make_state(pos, np.zeros_like(pos), np.ones(n), dtype=jnp.float32)
    assert not mesh_resolves(st, grid=128)
    assert mesh_resolves(st, grid=256)
    eng = make_engine_for(st, backend="xla", g=1.0,
                          softening="plummer", eps=1e-2)
    assert eng.algorithm == "pm"
    assert eng.sim.config.resolved_pm_grid() == 256


def test_resolve_interactive_theta_gates_on_multipole_order():
    """theta=None maps to INTERACTIVE_TREE_THETA only when the tree will
    run order-2 multipoles — the accuracy probe that justified 0.4 used
    the quadrupole far field; monopole at a wider theta is strictly
    worse than reference parity (round-4 advisor finding)."""
    from spacetpu import constants as C
    from spacetpu.engine import resolve_interactive_theta

    assert resolve_interactive_theta(None) == C.INTERACTIVE_TREE_THETA
    assert (resolve_interactive_theta(None, softening="ref")
            == C.BARNES_HUT_THETA)  # auto order -> monopole
    assert (resolve_interactive_theta(None, softening="ref",
                                      multipole_order=2)
            == C.INTERACTIVE_TREE_THETA)  # explicit quad
    assert (resolve_interactive_theta(None, multipole_order=1)
            == C.BARNES_HUT_THETA)
    assert resolve_interactive_theta(0.7, softening="ref") == 0.7

    scene = presets.random_cluster(1100, seed=1)
    eng = make_engine_for(scene.state(dtype=jnp.float32), backend="xla",
                          g=1.0, softening="ref")
    assert eng.sim.config.theta == C.BARNES_HUT_THETA


def test_treepm_saturates_predictor():
    """Host-side saturation pre-check: a Plummer sphere's half-mass
    radius sits inside r_cut (halo outliers stretch the box, the core
    concentrates) — the config that measured 16.5 s/step all-pairs-grade
    on chip; a quasi-uniform cloud does not."""
    from spacetpu.engine import treepm_saturates

    plum = presets.plummer_sphere(8192, seed=3)
    assert treepm_saturates(plum.state(dtype=jnp.float32))
    cloud = presets.random_cluster(8192, seed=3)
    assert not treepm_saturates(cloud.state(dtype=jnp.float32))


def test_make_engine_for_accurate_profile(monkeypatch):
    """profile='accurate' above MESH_SOLVER_CUTOFF: the structure-cached
    tree at the measured refresh cadence (chip A/Bs 1M-16M: it beats
    TreePM at every single-chip scale) — multirate requests keep the
    tree too, and the interactive profile still picks PM."""
    from spacetpu import constants as C

    monkeypatch.setattr(C, "MESH_SOLVER_CUTOFF", 1024)
    cloud = presets.random_cluster(8192, seed=2)
    st = cloud.state(dtype=jnp.float32)
    eng = make_engine_for(st, backend="xla", g=1.0, profile="accurate",
                          softening="plummer", eps=1e-2)
    assert eng.algorithm == "tree"
    # the auto tier runs the measured cadence; pinned keeps parity 1
    assert (eng.sim.config.tree_refresh_every
            == C.INTERACTIVE_TREE_REFRESH)
    assert make_simulation(64, algorithm="direct",
                           backend="xla").config.tree_refresh_every == 1

    plum = presets.plummer_sphere(8192, seed=2)
    eng2 = make_engine_for(plum.state(dtype=jnp.float32), backend="xla",
                           g=1.0, profile="accurate",
                           softening="plummer", eps=1e-2)
    assert eng2.algorithm == "tree"

    eng3 = make_engine_for(cloud.state(dtype=jnp.float32), backend="xla",
                           g=1.0, profile="accurate",
                           softening="plummer", eps=1e-2, substeps=4)
    assert eng3.algorithm == "tree"

    eng4 = make_engine_for(cloud.state(dtype=jnp.float32), backend="xla",
                           g=1.0, softening="plummer", eps=1e-2)
    assert eng4.algorithm == "pm"

    with pytest.raises(ValueError):
        make_engine_for(st, profile="nope")


def test_recheck_solver_swaps_on_degenerate():
    """_recheck_solver unit: a sim whose calibration is flagged
    degenerate is replaced via the fallback factory; healthy sims are
    left alone (and their recalibration result propagates)."""
    from spacetpu.engine import _recheck_solver

    sim, state, _ = _sim_and_state(64)
    state = sim.prime(state)
    replacement, _, _ = _sim_and_state(64)
    calls = []

    def factory(reason):
        calls.append(reason)
        return replacement

    # healthy: no swap, no factory call
    new, stale = _recheck_solver(sim, state, factory)
    assert new is None and calls == []

    sim.degenerate = "treepm-saturated"
    new, stale = _recheck_solver(sim, state, factory)
    assert new is replacement and stale
    assert calls == ["treepm-saturated"]

    # factory may decline (returns None): no swap
    sim2, state2, _ = _sim_and_state(64)
    state2 = sim2.prime(state2)
    sim2.degenerate = "treepm-saturated"
    new, stale = _recheck_solver(sim2, state2, lambda r: None)
    assert new is None


def test_engine_midrun_family_fallback(monkeypatch):
    """A mesh engine whose solver is degenerate migrates to the tree
    tier mid-run with trajectory continuity (round-4 verdict #2: r4w18
    watched a collapsing cluster saturate TreePM through two futile
    recalibrations with nothing acting on the warning). Here the
    degenerate flag is set at prime time (a saturated TreePM measures
    k_near ~ gg immediately on a concentrated scene); the engine's
    periodic recheck must swap families, keep ticking, and keep the
    same trajectory (state carries over, acc is re-primed)."""
    from spacetpu import constants as C

    monkeypatch.setattr(C, "MESH_SOLVER_CUTOFF", 1024)
    # concentrated-but-mesh-resolvable is hard to build tiny, so pin the
    # treepm sim directly and wire the engine the way make_engine_for
    # does: same fallback factory, short recheck cadence.
    cloud = presets.random_cluster(2048, seed=5)
    st = cloud.state(dtype=jnp.float32)
    sim = make_simulation(2048, algorithm="treepm", backend="xla",
                          softening="plummer", eps=1e-2, g=1.0)
    # calibrate + prime NOW so the loop's own prime() is a no-op
    # recalibration-wise, then force the degenerate flag — the loop must
    # see it at its first recheck (a genuinely saturated scene sets it
    # inside calibrate the same way; building one above gg>=64 is too
    # heavy for a unit test)
    st = sim.prime(st)

    def factory(reason):
        assert reason == "treepm-saturated"
        return make_simulation(2048, algorithm="tree", theta=0.5,
                               backend="xla", softening="plummer",
                               eps=1e-2, g=1.0)

    eng = SimEngine(sim, st, delta=1e-4, recal_every=3,
                    fallback_factory=factory)
    sim.degenerate = "treepm-saturated"
    p0 = np.asarray(st.pos, np.float64).copy()
    with eng:
        t0 = time.time()
        while eng.algorithm != "tree" and time.time() - t0 < 120:
            eng.check_health()
            time.sleep(0.02)
        assert eng.algorithm == "tree", "engine never swapped families"
        tick_at_swap = eng.exchange.current_ticks()
        while (eng.exchange.current_ticks() < tick_at_swap + 3
               and time.time() - t0 < 120):
            eng.check_health()
            time.sleep(0.02)
    st1 = eng.final_state
    assert st1 is not None
    assert eng.sim.config.resolved_algorithm() == "tree"
    assert bool(jnp.all(jnp.isfinite(st1.pos)))
    # trajectory continuity: the swapped-in solver continued from the
    # mesh solver's state. The bound must not depend on exactly how many
    # ticks slip in around the swap (machine-timing sensitive — measured
    # up to ~0.19 of motion on a contended host): the guarded failure
    # mode (state reset to zeros/garbage on swap) shows drift at scene
    # scale (~2+), so an order-of-magnitude margin below that is the
    # honest invariant.
    drift = np.abs(np.asarray(st1.pos, np.float64) - p0).max()
    assert drift < 0.5


def test_tree_dense_near_guard(monkeypatch):
    """Tree calibration flags (and on the pallas backend refuses) the
    measured-near-saturation shape: k_near ~ gg is the configuration
    that twice crashed the TPU worker (r4w6, theta=0.3 plummer at 1M).
    On XLA backends it degrades gracefully with a warning + the
    degenerate flag for family-fallback callers."""
    import warnings

    import spacetpu.sim as sim_mod
    from spacetpu.state import make_state

    rng = np.random.default_rng(11)
    n = 17000  # gg >= 64 at the default leaf (255)
    pos = rng.normal(size=(n, 3)) * 1e-6  # everything near everything
    st = make_state(pos, np.zeros_like(pos), np.ones(n),
                    dtype=jnp.float32)
    sim = make_simulation(n, algorithm="tree", theta=0.3, k_near="auto",
                          backend="xla", softening="plummer", eps=1e-2,
                          g=1.0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sim.calibrate(st)
    assert sim.degenerate == "tree-dense-near"
    assert any("saturate" in str(w.message) for w in rec)

    # the worker-crash shape proper (dense cap AND heavy tile count, on
    # the pallas backend) REFUSES instead of dispatching
    monkeypatch.setattr(sim_mod, "DENSE_TILES_SINGLE_STEP", 1)
    sim2 = make_simulation(n, algorithm="tree", theta=0.3, k_near="auto",
                           backend="pallas", softening="plummer",
                           eps=1e-2, g=1.0)
    with pytest.raises(RuntimeError, match="worker-crash"):
        sim2.calibrate(st)
    # the escape hatch runs it anyway (warning only)
    monkeypatch.setenv("SPACETPU_ALLOW_DENSE_NEAR", "1")
    sim3 = make_simulation(n, algorithm="tree", theta=0.3, k_near="auto",
                           backend="pallas", softening="plummer",
                           eps=1e-2, g=1.0)
    with warnings.catch_warnings(record=True) as rec3:
        warnings.simplefilter("always")
        sim3.calibrate(st)
    assert sim3.degenerate == "tree-dense-near"

    # a pinned integer cap bounds the near work by construction: exempt
    sim4 = make_simulation(n, algorithm="tree", theta=0.3, k_near=8,
                           backend="xla", softening="plummer", eps=1e-2,
                           g=1.0)
    sim4.calibrate(st)
    assert sim4.degenerate is None


def test_accurate_profile_keeps_tree():
    """The accurate profile keeps the structure-cached tree at every N:
    engine-level chip A/Bs (1M r5w2, 4M r5w8, 8M/16M r5w9) show it
    beats TreePM at each single-chip scale — the round-4 promotion
    premise (uncached per-step A/Bs) did not survive caching."""
    from spacetpu import constants as C
    from spacetpu.engine import select_solver

    scene = presets.random_cluster(4096, seed=3)
    st = scene.state(dtype=jnp.float32)

    class _FakeN:
        def __init__(self, st, n):
            self.pos, self.mass, self.n_active = st.pos, st.mass, None
            self.n = n

    import unittest.mock as mock
    with mock.patch.object(C, "MESH_SOLVER_CUTOFF", 1024):
        for n in (100_000, 20_000_000):
            algo, _ = select_solver(_FakeN(st, n), profile="accurate")
            assert algo == "tree", (n, algo)


def test_current_ticks_advances_without_consumer():
    """A frontend that polls progress but never samples must still see
    the loop advance (r5w8 probe: current_ticks froze at the first
    batch without a consumer — fixed by note_ticks per batch)."""
    sim, state, _ = _sim_and_state()
    eng = SimEngine(sim, state, delta=1e-3)
    with eng:
        deadline = time.time() + 60
        seen = 0
        while time.time() < deadline:
            eng.check_health()
            seen = eng.exchange.current_ticks()
            # strictly past the first batch, with zero sample() calls
            if seen > 2 * eng._check_interval:
                break
            time.sleep(0.02)
    assert seen > 2 * eng._check_interval, seen
