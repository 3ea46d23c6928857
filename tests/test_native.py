"""Native C++ IO runtime vs the pure-Python/numpy paths."""

import os

import numpy as np
import pytest

from vargeno_tpu import native
from vargeno_tpu.core.kmer import (np_codes_from_bytes, np_rolling_kmers_u64,
                                   np_window_has_n)
from vargeno_tpu.io.fastq import iter_read_batches

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")
READS = os.path.join(FIX, "reads.fq")


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_fastq_batches_match_python():
    py = list(iter_read_batches(READS, 512, 128, 4, use_native=False))
    nat = list(iter_read_batches(READS, 512, 128, 4, use_native=True))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.n_valid == b.n_valid
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.n_kmers, b.n_kmers)
        np.testing.assert_array_equal(a.qual, b.qual)


def test_rolling_kmers_match_numpy():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, 5000).astype(np.uint8)  # includes N=4
    codes[100] = 7
    k_n, v_n = native.rolling_kmers(codes)
    k_p = np_rolling_kmers_u64(np.where(codes > 3, np.uint8(0), codes))
    v_p = ~np_window_has_n(codes)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(k_n[v_n], k_p[v_p])
