"""Cohort mode and checkpoint/resume tests."""

import os

import numpy as np

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.cohort import CohortRunner
from vargeno_tpu.engine.geno import GenoRunner

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")
READS = os.path.join(FIX, "reads.fq")
VCF = os.path.join(FIX, "snps.vcf")
GOLD = os.path.join(FIX, "golden_output.vcf")


def _cfg(b=512):
    return GenoConfig(batch_reads=b, max_read_len=128, max_kmers_per_read=4)


def test_cohort_two_samples_same_reads(mini_index, tmp_path):
    runner = CohortRunner(mini_index, ["donorA", "donorB"], _cfg())
    runner.consume_sample("donorA", READS)
    runner.consume_sample("donorB", READS, limit_batches=2)
    outs = runner.write_vcfs(VCF, str(tmp_path / "{sample}.vcf"))
    golden = open(GOLD).read()
    # full-stream sample reproduces the reference output; truncated one differs
    assert open(outs[0]).read() == golden
    assert open(outs[1]).read() != golden


def test_checkpoint_resume_bit_exact(mini_index, tmp_path):
    ck = str(tmp_path / "ck")
    # run 1: only 8 batches, checkpoint every 4
    r1 = GenoRunner(mini_index, _cfg())
    r1.consume_fastq(READS, limit_batches=8, checkpoint_path=ck,
                     checkpoint_every=4)
    # run 2: resume from checkpoint, finish the stream
    r2 = GenoRunner(mini_index, _cfg())
    r2.consume_fastq(READS, checkpoint_path=ck)
    out = str(tmp_path / "resumed.vcf")
    r2.write_vcf(VCF, out)
    assert open(out).read() == open(GOLD).read()
