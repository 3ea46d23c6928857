"""UCSC SNP-txt path parity against reference `vargeno ucscd` / `gbf ucsc`."""

import os

import numpy as np

from vargeno_tpu.index import store, ucsc
from vargeno_tpu.io import fasta as fasta_io

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


def _set_bits(bv):
    nz = np.flatnonzero(bv.words)
    w = bv.words[nz]
    bits = np.unpackbits(w.view(np.uint8), bitorder="little").reshape(
        len(nz), 64)
    r, c = np.nonzero(bits)
    return np.sort(nz[r].astype(np.uint64) * np.uint64(64)
                   + c.astype(np.uint64))


def test_ucsc_snp_dict_parity():
    seqs = fasta_io.parse_fasta(os.path.join(FIX, "genome.fa"))
    golden = store.read_snp_dict(os.path.join(FIX, "golden.ucsc.snp.dict"))
    ours, locs = ucsc.build_snp_dict_ucsc(
        seqs, os.path.join(FIX, "snps.ucsc"))
    np.testing.assert_array_equal(ours.kmers, golden.kmers)
    np.testing.assert_array_equal(ours.pos, golden.pos)
    np.testing.assert_array_equal(ours.snp, golden.snp)
    np.testing.assert_array_equal(ours.flag, golden.flag)
    np.testing.assert_array_equal(ours.ref_freq, golden.ref_freq)
    np.testing.assert_array_equal(ours.alt_freq, golden.alt_freq)
    np.testing.assert_array_equal(ours.aux_pos, golden.aux_pos)
    assert locs.any()


def test_ucsc_snp_bf_parity():
    seqs = fasta_io.parse_fasta(os.path.join(FIX, "genome.fa"))
    g = np.load(os.path.join(FIX, "golden_ucsc_snp_bf.npz"))
    bf = ucsc.build_snp_bf_ucsc(seqs, os.path.join(FIX, "snps.ucsc"),
                                int(g["bits"]))
    np.testing.assert_array_equal(_set_bits(bf), g["set_bits"])


def test_encode_bf():
    import tempfile

    from vargeno_tpu.core.hashes import np_hash40

    with tempfile.NamedTemporaryFile("w", suffix=".enc", delete=False) as f:
        f.write("12345 x\n0x1f\n999999999999\n")
        path = f.name
    bf = ucsc.build_snp_bf_encode(path, 1 << 20)
    want = np_hash40(np.array([12345, 0x1F, 999999999999],
                              np.uint64)) % np.uint64(1 << 20)
    got = _set_bits(bf)
    np.testing.assert_array_equal(got, np.unique(want))
