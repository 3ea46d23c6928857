"""MXU prefix-sum exactness vs jnp.cumsum (engine/scan_ops.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vargeno_tpu.engine.scan_ops import cumsum_mask


@pytest.mark.parametrize("n", [0, 1, 5, 127, 128, 129, 512, 513,
                               4 * 128, 4 * 128 + 1, 100_000, 3_178_496])
def test_cumsum_mask_bool(n):
    rng = np.random.default_rng(n + 1)
    x = rng.random(n) < 0.3
    got = np.asarray(cumsum_mask(jnp.asarray(x)))
    want = np.cumsum(x.astype(np.int32))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [200, 40_000])
def test_cumsum_mask_smallint(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 11, n).astype(np.int32)
    got = np.asarray(cumsum_mask(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))
