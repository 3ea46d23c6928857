"""Native in-place kv radix sort: ordering identical to stable argsort."""

import numpy as np
import pytest

from vargeno_tpu import native


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_radix_sort_kv_matches_stable_argsort():
    rng = np.random.default_rng(9)
    n = 300_000
    # duplicate-heavy keys: stability is observable through the values
    keys = rng.integers(0, 50_000, n, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    k2, v2 = keys.copy(), vals.copy()
    assert native.radix_sort_kv(k2, v2)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(k2, keys[order])
    np.testing.assert_array_equal(v2, vals[order])


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_radix_sort_kv_edge_cases():
    for arr in ([], [7], [3, 3, 3], list(range(100))[::-1]):
        k = np.array(arr, np.uint64)
        v = np.arange(len(arr), dtype=np.uint32)
        k2, v2 = k.copy(), v.copy()
        assert native.radix_sort_kv(k2, v2)
        order = np.argsort(k, kind="stable")
        np.testing.assert_array_equal(k2, k[order])
        np.testing.assert_array_equal(v2, v[order])
