"""Bit-exact parity of our index build against the reference binary's output.

The goldens under tests/fixtures/mini were produced by the actual reference
`vargeno index` run (see tools/make_fixture.py): its .ref.dict/.snp.dict files
and the set-bit lists of its three sdsl Bloom filters.
"""

import os

import numpy as np
import pytest

from vargeno_tpu.index import bloom, dictgen, store
from vargeno_tpu.io import fasta as fasta_io

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


@pytest.fixture(scope="module")
def seqs():
    return fasta_io.parse_fasta(os.path.join(FIX, "genome.fa"))


def test_chrlens(seqs):
    with open(os.path.join(FIX, "golden.chrlens")) as f:
        golden = f.read()
    assert fasta_io.chrlens_text(seqs) == golden


def test_ref_dict_parity(seqs):
    golden = store.read_ref_dict(os.path.join(FIX, "golden.ref.dict"))
    ours, _ = dictgen.build_ref_dict(seqs)
    np.testing.assert_array_equal(ours.kmers, golden.kmers)
    np.testing.assert_array_equal(ours.pos, golden.pos)
    np.testing.assert_array_equal(ours.flag, golden.flag)
    np.testing.assert_array_equal(ours.aux, golden.aux)


def test_snp_dict_parity(seqs):
    golden = store.read_snp_dict(os.path.join(FIX, "golden.snp.dict"))
    ours, locs = dictgen.build_snp_dict_from_vcf(
        seqs, os.path.join(FIX, "snps.vcf"))
    np.testing.assert_array_equal(ours.kmers, golden.kmers)
    np.testing.assert_array_equal(ours.pos, golden.pos)
    np.testing.assert_array_equal(ours.snp, golden.snp)
    np.testing.assert_array_equal(ours.flag, golden.flag)
    np.testing.assert_array_equal(ours.ref_freq, golden.ref_freq)
    np.testing.assert_array_equal(ours.alt_freq, golden.alt_freq)
    np.testing.assert_array_equal(ours.aux_kmer, golden.aux_kmer)
    np.testing.assert_array_equal(ours.aux_pos, golden.aux_pos)
    np.testing.assert_array_equal(ours.aux_snp, golden.aux_snp)
    np.testing.assert_array_equal(ours.aux_rf, golden.aux_rf)
    np.testing.assert_array_equal(ours.aux_af, golden.aux_af)
    assert locs.any()


def _set_bits(bv: bloom.BitVector) -> np.ndarray:
    nz = np.flatnonzero(bv.words)
    w = bv.words[nz]
    bits = np.unpackbits(w.view(np.uint8), bitorder="little").reshape(
        len(nz), 64)
    rows, cols = np.nonzero(bits)
    return np.sort(nz[rows].astype(np.uint64) * np.uint64(64)
                   + cols.astype(np.uint64))


def test_bloom_parity(seqs):
    ref_g = np.load(os.path.join(FIX, "golden_ref_bf.npz"))
    lite_g = np.load(os.path.join(FIX, "golden_ref_bf_lite_bf.npz"))
    snp_g = np.load(os.path.join(FIX, "golden_snp_bf.npz"))

    ref_bf, lite_bf = bloom.build_ref_bfs(
        seqs, int(ref_g["bits"]), int(lite_g["bits"]))
    snp_bf = bloom.build_snp_bf(
        seqs, os.path.join(FIX, "snps.vcf"), int(snp_g["bits"]))

    np.testing.assert_array_equal(_set_bits(ref_bf), ref_g["set_bits"])
    np.testing.assert_array_equal(_set_bits(lite_bf), lite_g["set_bits"])
    np.testing.assert_array_equal(_set_bits(snp_bf), snp_g["set_bits"])
