import time, jax, jax.numpy as jnp
t0=time.time()
x = jnp.arange(8.0)
print("devices:", jax.devices(), flush=True)
print("sum:", float(jnp.sum(x*x)), "t=%.1fs" % (time.time()-t0), flush=True)
