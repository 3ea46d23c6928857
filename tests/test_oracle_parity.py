"""End-to-end parity: oracle engine output VCF == reference binary output.

Runs the full mini fixture (20.6K reads) through the sequential oracle and
compares the rewritten VCF byte-for-byte with golden_output.vcf produced by
the compiled reference. This pins down every behavioral quirk in SURVEY §6.1.
"""

import os

import numpy as np
import pytest

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.finalize import finalize_calls
from vargeno_tpu.index import bloom, dictgen, store
from vargeno_tpu.io import fasta as fasta_io
from vargeno_tpu.io.vcf_writer import write_calls_vcf
from vargeno_tpu.oracle import OracleEngine

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


def test_oracle_end_to_end_parity(mini_index, tmp_path):
    eng = OracleEngine(mini_index)
    eng.run_fastq(os.path.join(FIX, "reads.fq"))
    s = mini_index.sites
    ref_cnt = np.array([eng.pileup[int(p)][4] for p in s.pos])
    alt_cnt = np.array([eng.pileup[int(p)][5] for p in s.pos])
    calls = finalize_calls(mini_index.chrlens, s.pos, s.ref, s.alt, s.rf,
                           s.af, ref_cnt, alt_cnt, eng.config)
    out = str(tmp_path / "oracle_output.vcf")
    write_calls_vcf(os.path.join(FIX, "snps.vcf"), out, calls)
    golden = open(os.path.join(FIX, "golden_output.vcf")).read()
    assert open(out).read() == golden
