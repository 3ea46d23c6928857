"""Sharded-dictionary mode (hi-bit partition + all_to_all) parity tests.

route_factor=8 because the mini fixture's tiny per-lane query counts have
high relative variance; production batches run at ~3x the uniform share."""

import os

import numpy as np

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.dist.sharded_dict import ShardedDictGenoRunner
from vargeno_tpu.dist.sharding import make_mesh

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


def test_sharded_dict_end_to_end(mini_index, tmp_path):
    cfg = GenoConfig(batch_reads=256, max_read_len=128, max_kmers_per_read=4)
    mesh = make_mesh(8)
    runner = ShardedDictGenoRunner(mini_index, mesh, cfg,
                                   route_factor=8.0)
    runner.consume_fastq(os.path.join(FIX, "reads.fq"))
    ovf = {k: v for k, v in runner.stats_totals.items()
           if "overflow" in k and v}
    assert not ovf, ovf
    out = str(tmp_path / "sharded_dict_output.vcf")
    runner.write_vcf(os.path.join(FIX, "snps.vcf"), out)
    golden = open(os.path.join(FIX, "golden_output.vcf")).read()
    assert open(out).read() == golden
