"""hier_sort must be bit-identical to stable lax.sort when the cmp
prefix is a total order (the rasterizer's uses: forward (key, slot) with
unique slot; backward keyed by the slot permutation itself)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s3gaussian_tpu.ops.sort_hier import hier_sort


def _ref(rows, num_keys):
    return jax.lax.sort(tuple(rows), num_keys=num_keys)


@pytest.mark.parametrize("m", [37, 64, 1000, 4096, 5000, 70000])
@pytest.mark.parametrize("chunk_log2", [6, 10])
def test_key_slot_matches_lax_sort(m, chunk_log2):
    rng = np.random.default_rng(m)
    # duplicate-heavy keys; slot makes the order total (the fwd contract)
    keys = jnp.asarray(rng.integers(0, max(4, m // 7), size=m,
                                    dtype=np.uint32))
    slot = jnp.arange(m, dtype=jnp.uint32)
    got = hier_sort((keys, slot), num_cmp=2, chunk_log2=chunk_log2)
    want = _ref((keys, slot), num_keys=1)  # stable == lex on (key, slot)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("m", [999, 4096, 30000])
def test_permutation_key_with_payloads(m):
    rng = np.random.default_rng(m)
    perm = jnp.asarray(rng.permutation(m).astype(np.uint32))
    pays = [jnp.asarray(rng.integers(0, 2**32 - 1, size=m, dtype=np.uint32))
            for _ in range(5)]
    got = hier_sort((perm,) + tuple(pays), num_cmp=1, chunk_log2=8)
    want = _ref((perm,) + tuple(pays), num_keys=1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_two_key_lex():
    m = 10000
    rng = np.random.default_rng(7)
    tile = jnp.asarray(rng.integers(0, 50, size=m, dtype=np.uint32))
    depth = jnp.asarray(rng.integers(0, 1000, size=m, dtype=np.uint32))
    slot = jnp.arange(m, dtype=jnp.uint32)
    got = hier_sort((tile, depth, slot), num_cmp=3, chunk_log2=7)
    want = _ref((tile, depth, slot), num_keys=2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_float_keys():
    m = 3000
    rng = np.random.default_rng(3)
    keys = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    slot = jnp.arange(m, dtype=jnp.int32)
    got = hier_sort((keys, slot), num_cmp=2, chunk_log2=6)
    want = _ref((keys, slot), num_keys=1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("m,chunk_log2", [(130, 5), (513, 7), (70000, 10)])
def test_real_key_equal_to_pad_sentinel_survives(m, chunk_log2):
    """Regression: a REAL cmp value equal to the pad sentinel (dtype max /
    +inf) must not lose its payload to a pad row on truncation — bitonic
    merges are unstable on ties, so pads carry a tiebreaker flag."""
    for seed in range(10):
        rng = np.random.default_rng(seed)
        keys_np = rng.permutation(m).astype(np.int32)
        keys_np[keys_np.argmax()] = np.iinfo(np.int32).max  # sentinel key
        keys = jnp.asarray(keys_np)
        pay = jnp.asarray(rng.integers(1, 2**31 - 1, size=m,
                                       dtype=np.int32))
        got = hier_sort((keys, pay), num_cmp=1, chunk_log2=chunk_log2)
        want = _ref((keys, pay), num_keys=1)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # float variant: +inf as a real key (keys drawn from a permutation so
    # they stay unique — float32 normal draws collide at m=70000, which
    # would make the payload order legitimately unspecified)
    rng = np.random.default_rng(99)
    fk = rng.permutation(m).astype(np.float32)
    fk[0] = np.inf
    fkeys = jnp.asarray(fk)
    slot = jnp.arange(m, dtype=jnp.int32)
    got = hier_sort((fkeys, slot), num_cmp=1, chunk_log2=chunk_log2)
    want = _ref((fkeys, slot), num_keys=1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_single_chunk_fast_path():
    m = 50
    keys = jnp.asarray(np.random.default_rng(1).permutation(m), jnp.uint32)
    got = hier_sort((keys,), num_cmp=1, chunk_log2=10)
    np.testing.assert_array_equal(np.asarray(got[0]), np.sort(np.asarray(keys)))
