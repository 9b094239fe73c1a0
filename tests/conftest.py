"""Test configuration: CPU-only JAX with 8 virtual devices and f64 enabled.

Multi-chip sharding logic is tested on a fake 8-device CPU mesh
(xla_force_host_platform_device_count), the same trick SURVEY.md SS4
prescribes, so ring-pass/shard_map code paths run without TPU hardware.
f64 is enabled for golden-reference comparisons (the Rust reference is f64
end-to-end, sim/mod.rs:15-18).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's TPU plugin (sitecustomize) force-selects its backend via
# jax.config.update("jax_platforms", ...) at interpreter start, which beats
# env vars — override it back to CPU for the test session.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
