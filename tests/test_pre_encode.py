"""Host-side batch pre-encoding parity.

The queued geno loop can ship packed (hi, lo) kmer words computed on host
(native.encode_batch / core.kmer.np_encode_batch) instead of (B, L) base
codes; all three encoders (native C++, numpy mirror, device encode_batch)
must agree bit-for-bit, and the end-to-end counts must be identical with
pre-encoding on and off.
"""

import os

import numpy as np
import pytest

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.core.kmer import np_encode_batch

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


def _random_codes(rng, B, L):
    codes = rng.integers(0, 8, (B, L)).astype(np.uint8)
    common = rng.random((B, L)) < 0.9
    codes[common] = rng.integers(0, 4, int(common.sum())).astype(np.uint8)
    return codes


def test_three_encoders_agree():
    import jax

    from vargeno_tpu import native
    from vargeno_tpu.engine.batch import encode_batch

    rng = np.random.default_rng(7)
    B, L, K = 193, 128, 4
    codes = _random_codes(rng, B, L)
    nk = rng.integers(0, K + 1, B).astype(np.int32)

    hi_n, lo_n, kv_n, ro_n = np_encode_batch(codes, nk, K)
    dev = jax.jit(encode_batch, static_argnums=2)(codes, nk, K)
    hi_d, lo_d, kv_d, ro_d = (np.asarray(a) for a in dev)
    assert (kv_n == kv_d).all() and (ro_n == ro_d).all()
    assert (hi_n == hi_d).all() and (lo_n == lo_d).all()

    if native.available():
        hi_c, lo_c, kv_c, ro_c = native.encode_batch(codes, nk, K)
        assert (kv_c == kv_n).all() and (ro_c == ro_n).all()
        assert (hi_c == hi_n).all() and (lo_c == lo_n).all()


@pytest.mark.parametrize("depth,group", [(1, 1), (3, 1), (2, 3)])
def test_pre_encode_end_to_end_identical(mini_index, depth, group):
    from vargeno_tpu.engine.geno import GenoRunner

    fq = os.path.join(FIX, "reads.fq")
    base = dict(batch_reads=256, max_read_len=128, max_kmers_per_read=4)
    a = GenoRunner(mini_index, GenoConfig(pre_encode=True,
                                          pipeline_depth=depth,
                                          group_size=group, **base))
    a.consume_fastq(fq)
    b = GenoRunner(mini_index, GenoConfig(pre_encode=False,
                                          pipeline_depth=1, **base))
    b.consume_fastq(fq)
    assert (np.asarray(a.ref_cnt) == np.asarray(b.ref_cnt)).all()
    assert (np.asarray(a.alt_cnt) == np.asarray(b.alt_cnt)).all()
    assert a.n_reads == b.n_reads


def test_rc_enc_matches_recode():
    """RC-from-packed-words must equal host reverse-complement + re-encode
    for every read length / N placement."""
    import jax

    from vargeno_tpu.engine.batch import encode_batch, rc_enc

    rng = np.random.default_rng(11)
    B, L, K = 127, 128, 4
    codes = _random_codes(rng, B, L)
    nk = rng.integers(0, K + 1, B).astype(np.int32)
    length = nk * 32
    idx = length[:, None] - 1 - np.arange(L)[None, :]
    g = np.take_along_axis(codes, np.clip(idx, 0, L - 1), axis=1)
    rc = np.where(g < 4, 3 - g, g)
    rc_codes = np.where(idx >= 0, rc, 4).astype(np.uint8)

    enc = jax.jit(encode_batch, static_argnums=2)(codes, nk, K)
    got = jax.jit(rc_enc, static_argnums=5)(*enc, nk, K)
    want = jax.jit(encode_batch, static_argnums=2)(rc_codes, nk, K)
    kv = np.asarray(want[2])
    assert (np.asarray(got[2]) == kv).all()
    assert (np.asarray(got[3]) == np.asarray(want[3])).all()
    assert (np.asarray(got[0])[kv] == np.asarray(want[0])[kv]).all()
    assert (np.asarray(got[1])[kv] == np.asarray(want[1])[kv]).all()
