"""Distributed bitonic merge-exchange sort (parallel/dsort.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacetpu.parallel import dsort, ring


def _sorted_global(keys, *payload, n_dev=8):
    mesh = ring.make_mesh(n_dev)
    f = jax.jit(
        jax.shard_map(
            functools.partial(dsort.bitonic_sort_sharded, axis=ring.AXIS),
            mesh=mesh,
            in_specs=tuple(jax.sharding.PartitionSpec(ring.AXIS)
                           for _ in range(1 + len(payload))),
            out_specs=tuple(jax.sharding.PartitionSpec(ring.AXIS)
                            for _ in range(1 + len(payload))),
            check_vma=False,
        )
    )
    return f(keys, *payload)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_bitonic_sorts_globally(n_dev):
    rng = np.random.default_rng(0)
    n = n_dev * 1024
    keys = jnp.asarray(rng.integers(0, 2**31, n), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ks, vs = _sorted_global(keys, vals, n_dev=n_dev)
    ks = np.asarray(ks)
    assert (np.diff(ks) >= 0).all()
    # payload rode along with its key
    order = np.argsort(np.asarray(keys), kind="stable")
    np.testing.assert_array_equal(ks, np.asarray(keys)[order])
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vals)[order])


def test_bitonic_duplicate_keys():
    rng = np.random.default_rng(1)
    n = 8 * 512
    keys = jnp.asarray(rng.integers(0, 7, n), jnp.int32)  # heavy duplicates
    tag = jnp.arange(n, dtype=jnp.int32)
    ks, ts = _sorted_global(keys, tag)
    ks, ts = np.asarray(ks), np.asarray(ts)
    assert (np.diff(ks) >= 0).all()
    # every row accounted for exactly once
    assert np.array_equal(np.sort(ts), np.arange(n))
    np.testing.assert_array_equal(ks, np.asarray(keys)[np.argsort(np.asarray(keys), kind="stable")])


def test_bitonic_rejects_non_power_of_two():
    mesh = ring.make_mesh(6) if len(jax.devices()) >= 6 else None
    if mesh is None:
        pytest.skip("needs 6 devices")
    with pytest.raises(ValueError):
        jax.jit(
            jax.shard_map(
                functools.partial(dsort.bitonic_sort_sharded, axis=ring.AXIS),
                mesh=mesh,
                in_specs=(jax.sharding.PartitionSpec(ring.AXIS),),
                out_specs=(jax.sharding.PartitionSpec(ring.AXIS),),
                check_vma=False,
            )
        )(jnp.arange(6 * 8, dtype=jnp.int32))
