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


def test_ht_build_native_matches_numpy_lookups():
    """Placement may differ (sequential insertion vs numpy rounds) but every
    lookup result must be identical, present or absent."""
    import jax
    import jax.numpy as jnp

    from vargeno_tpu.engine.hashtable import build_hash_table, ht_lookup

    rng = np.random.default_rng(3)
    n = 1 << 17  # >= the native-path threshold in build_hash_table
    keys = np.unique(rng.integers(0, 1 << 63, n + n // 4,
                                  dtype=np.uint64))[:n]
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    pos = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    flag = rng.integers(0, 2, n, dtype=np.uint8)
    info = rng.integers(0, 256, n, dtype=np.uint8)

    tn = build_hash_table(hi, lo, pos, flag, info, use_native=True)
    tp = build_hash_table(hi, lo, pos, flag, info, use_native=False)
    assert tn.nb == tp.nb

    m = 20000
    qh = np.concatenate([hi[:m], rng.integers(0, 1 << 32, m,
                                              dtype=np.uint64)
                         .astype(np.uint32)])
    ql = np.concatenate([lo[:m], rng.integers(0, 1 << 32, m,
                                              dtype=np.uint64)
                         .astype(np.uint32)])
    f = jax.jit(lambda t, a, b, nb, ch: ht_lookup(t, nb, ch, a, b),
                static_argnums=(3, 4))
    rn = f(jnp.asarray(tn.table), jnp.asarray(qh), jnp.asarray(ql),
           tn.nb, tn.chain)
    rp = f(jnp.asarray(tp.table), jnp.asarray(qh), jnp.asarray(ql),
           tp.nb, tp.chain)
    for a, b, name in zip(rn, rp, ("hit", "pos", "flag", "info")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    assert int(np.asarray(rn[0])[:m].sum()) == m  # all present keys found


def test_rolling_kmers_match_numpy():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 5, 5000).astype(np.uint8)  # includes N=4
    codes[100] = 7
    k_n, v_n = native.rolling_kmers(codes)
    k_p = np_rolling_kmers_u64(np.where(codes > 3, np.uint8(0), codes))
    v_p = ~np_window_has_n(codes)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_array_equal(k_n[v_n], k_p[v_p])


def test_fastq_chunked_streaming_identical():
    """Bounded-window streaming (WGS files exceed RAM) must batch exactly
    like the numpy reader, including records split across window edges and
    a missing final newline."""
    import tempfile

    import numpy as np

    from vargeno_tpu import native
    from vargeno_tpu.io.fastq import iter_read_batches

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    fq = os.path.join(FIX, "reads.fq")

    def cat(rows):
        return tuple(np.concatenate([r[i] for r in rows]) for i in range(3))

    ref_rows = [(b.codes[: b.n_valid], b.n_kmers[: b.n_valid],
                 b.qual[: b.n_valid])
                for b in iter_read_batches(fq, 64, 128, 4, use_native=False)]
    ref = cat(ref_rows)
    data = open(fq, "rb").read().rstrip(b"\n")  # also drop final newline
    with tempfile.NamedTemporaryFile(suffix=".fq") as tf:
        tf.write(data)
        tf.flush()
        for chunk in (257, 4096):
            rows = [(c[:g], k[:g], q[:g]) for c, k, q, g in
                    native.fastq_batches(tf.name, 64, 128, 4,
                                         chunk_bytes=chunk)]
            got = cat(rows)
            assert all((a == b).all() for a, b in zip(ref, got))


def test_fastq_skip_reads_matches_numpy():
    import numpy as np

    from vargeno_tpu import native
    from vargeno_tpu.io.fastq import iter_read_batches

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    fq = READS
    for skip in (1, 777, 10**6):
        a = [(b.codes[: b.n_valid]) for b in
             iter_read_batches(fq, 64, 128, 4, skip_reads=skip,
                               use_native=True)]
        b = [(x.codes[: x.n_valid]) for x in
             iter_read_batches(fq, 64, 128, 4, skip_reads=skip,
                               use_native=False)]
        assert bool(a) == bool(b)
        if a:
            ca, cb = np.concatenate(a), np.concatenate(b)
            assert ca.shape == cb.shape and (ca == cb).all()
