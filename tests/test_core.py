"""Unit tests for the core codec / hash / u64 layers against numpy oracles."""

import numpy as np
import jax.numpy as jnp

from vargeno_tpu.core import hashes, kmer, u64


RNG = np.random.default_rng(0)


def test_u64_mul_add_xor_shift():
    a = RNG.integers(0, 2**64, size=256, dtype=np.uint64)
    b = RNG.integers(0, 2**64, size=256, dtype=np.uint64)

    def pair(x):
        return (jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
                jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)))

    pa, pb = pair(a), pair(b)
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(u64.to_u64_np(u64.mul(pa, pb)), a * b)
        np.testing.assert_array_equal(u64.to_u64_np(u64.add(pa, pb)), a + b)
    np.testing.assert_array_equal(u64.to_u64_np(u64.xor(pa, pb)), a ^ b)
    for n in (0, 1, 13, 30, 31, 32, 33, 47, 63):
        np.testing.assert_array_equal(
            u64.to_u64_np(u64.shr(pa, n)), a >> np.uint64(n))
        with np.errstate(over="ignore"):
            np.testing.assert_array_equal(
                u64.to_u64_np(u64.shl(pa, n)), a << np.uint64(n))


def test_u64_mod():
    a = RNG.integers(0, 2**64, size=512, dtype=np.uint64)
    for m in (1_120_000_000, 3, 2**31 - 1, 999_999_937):
        pa = ((a >> np.uint64(32)).astype(np.uint32),
              (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        got = np.asarray(u64.mod_u31((jnp.asarray(pa[0]), jnp.asarray(pa[1])), m))
        np.testing.assert_array_equal(got, (a % np.uint64(m)).astype(np.uint32))


def test_u64_mod_const():
    """Reciprocal mod (engine snp-BF path) exact vs numpy, incl. multiples
    of m +/- 1 (the conditional-subtract edge) and both magic regimes
    (M < 2**64 and M >= 2**64)."""
    base = RNG.integers(0, 2**64, size=4096, dtype=np.uint64)
    for m in (1_120_000_000, 3, 2**31 - 1, 999_999_937, 1009, 2**30 + 1,
              2**20, 6, 97):
        a = np.concatenate([
            base,
            (base % np.uint64(2**64 // m)) * np.uint64(m),
            (base % np.uint64(2**64 // m - 1)) * np.uint64(m)
            + np.uint64(m - 1),
            np.array([0, 1, m - 1, m, m + 1, 2**64 - 1, 2**63, 2**32],
                     dtype=np.uint64),
        ])
        pa = ((a >> np.uint64(32)).astype(np.uint32),
              (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        got = np.asarray(u64.mod_const(
            (jnp.asarray(pa[0]), jnp.asarray(pa[1])), m))
        np.testing.assert_array_equal(got, (a % np.uint64(m)).astype(np.uint32))


def test_pack_kmers_matches_u64_oracle():
    codes = RNG.integers(0, 4, size=(64, 32), dtype=np.uint8)
    want = kmer.np_pack_kmers_u64(codes)
    hi, lo = kmer.pack_kmers(jnp.asarray(codes))
    got = (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        lo, dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_get_base_and_all_bases():
    codes = RNG.integers(0, 4, size=(16, 32), dtype=np.uint8)
    hi, lo = kmer.pack_kmers(jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(kmer.all_bases(hi, lo)), codes)
    for i in (0, 7, 15, 16, 31):
        np.testing.assert_array_equal(
            np.asarray(kmer.get_base(hi, lo, i)), codes[:, i])


def test_mutate_base():
    codes = RNG.integers(0, 4, size=(8, 32), dtype=np.uint8)
    hi, lo = kmer.pack_kmers(jnp.asarray(codes))
    for b in (0, 15, 16, 31):
        h2, l2 = kmer.mutate_base(hi, lo, b, jnp.uint32(2))
        mutated = codes.copy()
        mutated[:, b] = 2
        np.testing.assert_array_equal(
            np.asarray(kmer.all_bases(h2, l2)), mutated)


def test_rolling_kmers():
    codes = RNG.integers(0, 4, size=200, dtype=np.uint8)
    codes[50] = 4  # an N
    roll = kmer.np_rolling_kmers_u64(codes)
    hasn = kmer.np_window_has_n(codes)
    assert roll.shape[0] == 200 - 31 and hasn.shape == roll.shape
    # windows covering index 50 are flagged
    assert hasn[19:51].all() and not hasn[:19].any() and not hasn[51:].any()
    # spot-check one window against direct packing
    w = 100
    np.testing.assert_equal(roll[w], kmer.np_pack_kmers_u64(codes[w:w + 32]))


def test_revcomp():
    codes = RNG.integers(0, 4, size=(4, 64), dtype=np.uint8)
    length = np.full(4, 64, np.int32)
    rc = np.asarray(kmer.revcomp_codes(jnp.asarray(codes), jnp.asarray(length)))
    np.testing.assert_array_equal(rc, 3 - codes[:, ::-1])
    # packed revcomp oracle agrees
    k = kmer.np_pack_kmers_u64(codes[:, :32])
    krc = kmer.np_revcomp_u64(k)
    np.testing.assert_array_equal(
        krc, kmer.np_pack_kmers_u64((3 - codes[:, :32])[:, ::-1]))


def test_hash32_hash40_match_reference_formulas():
    x32 = RNG.integers(0, 2**32, size=1024, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(hashes.hash32(jnp.asarray(x32))), hashes.np_hash32(x32))
    # lo40 values
    x40 = RNG.integers(0, 2**40, size=1024, dtype=np.uint64)
    want = hashes.np_hash40(x40) % np.uint64(1_120_000_000)
    hi = (x40 >> np.uint64(32)).astype(np.uint32)
    lo = (x40 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    got = np.asarray(
        hashes.snp_bf_bit(jnp.asarray(hi), jnp.asarray(lo), 1_120_000_000))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_hash_reference_vectors():
    # Known-answer vectors computed from the reference formulas
    # (src/generate_bf.h:125-142) by direct evaluation.
    assert int(hashes.np_hash32(np.uint32(0))) == 0
    assert int(hashes.np_hash40(np.uint64(0))) == 0
    v = np.uint32(0xDEADBEEF)
    assert int(hashes.np_hash32(v)) == int(hashes.np_hash32(v))  # determinism
