"""Bisect tree2's step overhead: cond-with-sort vs plain stepper."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import PartitionSpec as P

def fence(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:16]))

from spacetpu.ops import integrators, tree
from spacetpu.parallel import ring, tree2
from spacetpu.state import make_state, State

D = 1
N = tree2.required_n(1_000_000, D, far_levels=2)
rng = np.random.default_rng(0)
u = rng.normal(size=(N, 3)); u /= np.linalg.norm(u, axis=-1, keepdims=True)
r = rng.uniform(0, 1, size=(N, 1)) ** (1 / 3)
state = make_state((u * r).astype(np.float32), np.zeros((N, 3), np.float32),
                   (rng.uniform(0.5, 1.5, N) / N).astype(np.float32))
mesh = ring.make_mesh(D)
sim = tree2.ShardedTreeSimulation(
    mesh, N, theta=0.5, softening="plummer", eps=1e-3, g=1.0,
    backend="pallas", multipole_order=2, resort_every=8)

ts = sim.prime(sim.shard_state(state))
fence(ts.state.acc)

# (a) full step as shipped
t0 = time.perf_counter()
ts = sim.step(ts, jnp.float32(1e-3))
fence(ts.state.pos)
print(f"step #1 (incl compile): {time.perf_counter()-t0:.2f}s", flush=True)
for k in range(3):
    t0 = time.perf_counter()
    ts = sim.step(ts, jnp.float32(1e-3))
    fence(ts.state.pos)
    print(f"step (tick={int(ts.tick)}): {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)

# (b) stepper-only (no cond / no sort)
g_l = N // D // tree.LEAF
acc_fn = functools.partial(
    tree2._tree2_acc, axis=ring.AXIS, theta=0.5, k_near=sim.caps["k_near"],
    softening="plummer", eps=1e-3, g=1.0, backend="pallas",
    interpret=False, multipole_order=2, far_levels=2, halo_cap=sim.caps["halo_cap"])
stepper = integrators.get_stepper("leapfrog")

def plain(st, dt):
    return stepper(st, dt, lambda p, m: acc_fn(p, m))

sp = State(pos=P(ring.AXIS), vel=P(ring.AXIS), mass=P(ring.AXIS),
           acc=P(ring.AXIS), pos_c=None, vel_c=None, time=P(), n_active=P())
f_plain = jax.jit(jax.shard_map(plain, mesh=mesh, in_specs=(sp, P()),
                                out_specs=sp, check_vma=False))
st = ts.state
st = f_plain(st, jnp.float32(1e-3)); fence(st.pos)
t0 = time.perf_counter()
for _ in range(3):
    st = f_plain(st, jnp.float32(1e-3))
fence(st.pos)
print(f"stepper-only: {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)
print("DONE", flush=True)
