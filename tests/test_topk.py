"""exact_top_k must be bit-exact vs jax.lax.top_k (values AND indices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from r3det_tpu.ops.topk import exact_top_k


def _check(x, k):
    ev, ei = exact_top_k(x, k)
    rv, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ri))


@pytest.mark.parametrize('k', [1, 7, 100, 1000])
def test_random_f32(k):
    rng = np.random.RandomState(0)
    _check(jnp.asarray(rng.randn(3, 4096).astype(np.float32)), k)


def test_heavy_ties():
    # quantized scores: long runs of equal values straddle the k-th
    # boundary — the stable ascending-index tie rule must match
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.round(rng.rand(4, 2048) * 8) / 8.0).astype(
        jnp.float32)
    for k in (1, 50, 513, 2000):
        _check(x, k)


def test_all_equal():
    _check(jnp.full((2, 300), 0.25, jnp.float32), 37)


def test_neg_inf_padding_and_negatives():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 1024).astype(np.float32)
    x[:, 700:] = -1e30                      # ops.nms NEG_INF gating
    x[0, :10] = -np.inf
    _check(jnp.asarray(x), 512)


def test_bf16_scores():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 4096), jnp.bfloat16)  # many exact ties
    _check(x, 1000)
    assert exact_top_k(x, 10)[0].dtype == jnp.bfloat16


def test_k_equals_n_fallback():
    rng = np.random.RandomState(4)
    _check(jnp.asarray(rng.randn(2, 128).astype(np.float32)), 128)


def test_leading_dims_and_1d():
    rng = np.random.RandomState(5)
    _check(jnp.asarray(rng.randn(2, 3, 257).astype(np.float32)), 20)
    _check(jnp.asarray(rng.randn(515).astype(np.float32)), 31)


def test_under_vmap():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 1024).astype(np.float32))
    ev, ei = jax.vmap(lambda r: exact_top_k(r, 100))(x)
    rv, ri = jax.lax.top_k(x, 100)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ri))
