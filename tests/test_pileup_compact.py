"""PCOMPACT pileup variant (reference src/pileup.{h,c}, PCOMPACT=1):
structural + equivalence tests for the chained-hash model."""

import numpy as np

from vargeno_tpu.engine.pileup_compact import PileupTableCompact, _hash


def test_hash_matches_reference_bit_ops():
    # java.util.HashMap supplemental hash (pileup.h:28-33)
    def ref_hash(h):
        h &= 0xFFFFFFFF
        h ^= ((h >> 20) ^ (h >> 12))
        return (h ^ (h >> 7) ^ (h >> 4)) & 0xFFFFFFFF

    rng = np.random.default_rng(3)
    for k in rng.integers(0, 2**32, 1000, dtype=np.uint64):
        assert _hash(int(k)) == ref_hash(int(k))


def test_first_insert_wins_and_counts_saturate():
    t = PileupTableCompact(size=8)
    t.add(100, 1, 2, 200, 55)
    t.add(100, 3, 0, 1, 1)      # ptable_add early-returns on existing key
    e = t.get(100)
    assert (e["ref"], e["alt"], e["ref_freq"], e["alt_freq"]) == (1, 2,
                                                                  200, 55)
    for _ in range(100):
        t.bump(100, True)
    assert t.get(100)["ref_cnt"] == 63          # MAX_COV saturation
    assert t.get(100)["alt_cnt"] == 0
    assert t.get(999) is None


def test_growth_threshold_and_chains():
    t = PileupTableCompact(size=8)   # threshold = 3
    keys = list(range(50))
    for k in keys:
        t.add(k, 0, 1, 10, 20)
    assert t.size > 8                 # grew (count > 0.4 * size repeatedly)
    assert t.count == 50
    for k in keys:
        assert t.get(k) is not None
        assert k in t.chain_of(k)


def test_compact_equals_flat_pileup_on_fixture(mini_index):
    """Seeding the compact table from the snp dict (qv.cc:637-660 under
    PCOMPACT) yields the same site set / alleles / freqs as the flat site
    tensors the engine uses."""
    from vargeno_tpu.index.store import derive_sites

    s = mini_index.sites
    t = PileupTableCompact(size=1 << 10)
    for p, r, a, rf, af in zip(s.pos, s.ref, s.alt, s.rf, s.af):
        t.add(int(p), int(r), int(a), int(rf), int(af))
    assert t.count == s.pos.shape[0]
    for p, r, a, rf, af in zip(s.pos, s.ref, s.alt, s.rf, s.af):
        e = t.get(int(p))
        assert (e["ref"], e["alt"], e["ref_freq"], e["alt_freq"]) == \
            (int(r), int(a), int(rf), int(af))
    # derive_sites is idempotent with the dict it came from
    s2 = derive_sites(mini_index.snp)
    np.testing.assert_array_equal(s2.pos, s.pos)
