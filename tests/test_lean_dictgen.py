"""Memory-lean ref-dict grouping (whole-genome path) must be bit-identical
to the np.unique path it replaces (the latter OOM'd a 125 GB host at 3G
k-mers: several full-width int64 temporaries plus an internal re-sort)."""

import numpy as np

from vargeno_tpu.index.dictgen import (_aux_rows, _build_ref_rows_lean,
                                       _group_ambiguity, _rank_at)


def _reference_rows(kmers_sorted, pos_sorted, aux_cols=10):
    uniq, first, counts, pos_or_aux, flag, has_aux = _group_ambiguity(
        kmers_sorted, aux_cols)
    out_pos = np.where(
        counts == 1,
        pos_sorted[np.minimum(first, len(pos_sorted) - 1)]
        if len(pos_sorted) else 0, pos_or_aux).astype(np.uint32)
    aux = _aux_rows(first, counts, has_aux, pos_sorted, aux_cols, np.uint32)
    return uniq, out_pos, flag, aux


def test_lean_grouping_matches_unique_path():
    rng = np.random.default_rng(11)
    # heavy-duplication key space so 1, 2..10 and >10 copy groups all occur
    keys = rng.integers(0, 5000, 200_000, dtype=np.uint64)
    pos = rng.integers(1, 2**31, 200_000, dtype=np.int64).astype(np.uint32)
    order = np.argsort(keys, kind="stable")
    ks, ps = keys[order], pos[order]

    ref = _reference_rows(ks, ps)
    lean = _build_ref_rows_lean(ks, ps, 10)
    for a, b in zip(ref, lean):
        np.testing.assert_array_equal(a, b)


def test_lean_grouping_all_unique_and_empty():
    ks = np.arange(1000, dtype=np.uint64) * 7
    ps = np.arange(1000, dtype=np.uint32) + 1
    ref = _reference_rows(ks, ps)
    lean = _build_ref_rows_lean(ks, ps, 10)
    for a, b in zip(ref, lean):
        np.testing.assert_array_equal(a, b)
    uniq, out_pos, flag, aux = _build_ref_rows_lean(
        np.zeros(0, np.uint64), np.zeros(0, np.uint32), 10)
    assert uniq.size == 0 and aux.shape == (0, 10)


def test_rank_at_chunked():
    rng = np.random.default_rng(5)
    mask = rng.random(100_000) < 0.3
    qs = np.sort(rng.choice(100_000, 500, replace=False))
    expect = np.cumsum(mask)[qs] - mask[qs]   # count strictly before q
    got = _rank_at(mask, qs, chunk=1 << 10)
    np.testing.assert_array_equal(got, expect)


def test_build_ref_dict_chunked_matches_golden(mini_index):
    """The chunked two-pass builder reproduces the golden mini ref dict
    (also covered by test_index_parity, re-asserted here for locality)."""
    import os

    from vargeno_tpu.index import dictgen, store
    from vargeno_tpu.io import fasta as fasta_io

    FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")
    seqs = fasta_io.parse_fasta(os.path.join(FIX, "genome.fa"))
    ref_dict, _ = dictgen.build_ref_dict(seqs)
    np.testing.assert_array_equal(ref_dict.kmers, mini_index.ref.kmers)
    np.testing.assert_array_equal(ref_dict.pos, mini_index.ref.pos)
    np.testing.assert_array_equal(ref_dict.flag, mini_index.ref.flag)
    np.testing.assert_array_equal(ref_dict.aux, mini_index.ref.aux)
