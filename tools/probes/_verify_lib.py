import jax, jax.numpy as jnp, spacetpu
from spacetpu.models import presets
from spacetpu.ops import energy
scene = presets.fixed_cloud(10000)
sim = spacetpu.make_simulation(scene.n, algorithm="direct",
                               integrator="leapfrog", softening="plummer", eps=1e-4)
state = sim.prime(scene.state(dtype=jnp.float32))
state = sim.run(state, spacetpu.constants.DELTA, 120)
print("E =", float(energy.total_energy(state.pos, state.vel, state.mass, eps=1e-4)), flush=True)
print("VERIFY LIB OK", flush=True)
