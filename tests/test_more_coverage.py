"""Longer reads, CAF extraction quirks, finalize mapping."""

import os

import numpy as np
import pytest

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.geno import GenoRunner
from vargeno_tpu.finalize import global_to_chrom
from vargeno_tpu.io.vcf import CafExtractor
from vargeno_tpu.oracle import OracleEngine
from vargeno_tpu.testing import make_synthetic


def test_longer_reads_match_oracle(tmp_path):
    """160bp reads use 5 k-mer slots and trailing-base truncation."""
    index, fa, vcf, fq = make_synthetic(
        seed=21, tmpdir=str(tmp_path), sizes=(30_000,), n_snps=25,
        n_reads=600, read_len=160)
    cfg = GenoConfig(batch_reads=256, max_read_len=160,
                     max_kmers_per_read=5)
    runner = GenoRunner(index, cfg)
    runner.consume_fastq(fq)
    assert all(v == 0 for k, v in runner.stats_totals.items()
               if "overflow" in k), runner.stats_totals

    oracle = OracleEngine(index, cfg)
    oracle.run_fastq(fq)
    s = index.sites
    o_ref = np.array([oracle.pileup[int(p)][4] for p in s.pos])
    o_alt = np.array([oracle.pileup[int(p)][5] for p in s.pos])
    n = s.pos.shape[0]
    np.testing.assert_array_equal(
        np.minimum(np.asarray(runner.ref_cnt)[:n], 63), o_ref)
    np.testing.assert_array_equal(
        np.minimum(np.asarray(runner.alt_cnt)[:n], 63), o_alt)


def test_caf_extractor_quirks():
    caf = CafExtractor()
    # normal line
    assert caf.extract("RS=1;CAF=0.9,0.1;COMMON=1") == (
        pytest.approx(0.9), pytest.approx(0.1))
    # line WITHOUT CAF after one with: stale freq_index (3) reads whatever
    # token sits at that slot (reference src/dictgen.c:716-735): here the
    # "1" of COMMON=1
    f1, f2 = caf.extract("RS=2;COMMON=1")
    assert f1 == 1.0
    # CAF appearing later updates the index again
    assert caf.extract("RS=3;CAF=0.8,0.2")[0] == pytest.approx(0.8)

    # never-seen CAF: has_freq goes false permanently -> 0.5 defaults
    caf2 = CafExtractor()
    assert caf2.extract("RS=1;COMMON=1") == (0.5, 0.5)
    assert caf2.extract("RS=2;CAF=0.7,0.3") == (0.5, 0.5)


def test_global_to_chrom_boundaries():
    chrlens = [("c1", 100), ("c2", 50)]
    assert global_to_chrom(chrlens, 1) == ("c1", 1)
    assert global_to_chrom(chrlens, 100) == ("c1", 100)  # index > len test
    assert global_to_chrom(chrlens, 101) == ("c2", 1)
    assert global_to_chrom(chrlens, 150) == ("c2", 50)
