"""Pallas IoU kernel parity vs the jnp path (interpreter mode on CPU)."""
import math

import numpy as np

import jax.numpy as jnp

from r3det_tpu.ops.pallas_iou import rotated_iou_pallas
from r3det_tpu.ops.rotated_iou import rotated_iou_pairwise

RNG = np.random.RandomState(9)


def rand(n, scale=500):
    return np.stack([
        RNG.uniform(0, scale, n), RNG.uniform(0, scale, n),
        RNG.uniform(5, 80, n), RNG.uniform(5, 80, n),
        RNG.uniform(-math.pi, math.pi, n)], -1).astype(np.float32)


import pytest


@pytest.mark.slow
def test_pallas_matches_jnp():
    b1, b2 = jnp.asarray(rand(24)), jnp.asarray(rand(130))
    got = np.asarray(rotated_iou_pallas(b1, b2, interpret=True))
    ref = np.asarray(rotated_iou_pairwise(b1, b2, backend='jnp'))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_pallas_identical_boxes():
    b = jnp.asarray(rand(8))
    out = np.asarray(rotated_iou_pallas(b, b, interpret=True))
    np.testing.assert_allclose(np.diag(out), 1.0, atol=2e-3)


def test_pallas_iof_mode():
    inner = jnp.asarray(np.array([[50., 50., 10., 10., 0.3]], np.float32))
    outer = jnp.asarray(np.array([[50., 50., 60., 40., 0.3]], np.float32))
    out = np.asarray(rotated_iou_pallas(inner, outer, mode='iof',
                                        interpret=True))
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-3)
