"""Multi-device (8-way virtual CPU mesh) data-parallel parity tests."""

import os

import jax
import numpy as np
import pytest

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.dist.sharding import ShardedGenoRunner, make_mesh
from vargeno_tpu.engine.geno import GenoRunner

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_geno_matches_single_device(mini_index, tmp_path):
    cfg = GenoConfig(batch_reads=128, max_read_len=128, max_kmers_per_read=4)
    mesh = make_mesh(8)
    sharded = ShardedGenoRunner(mini_index, mesh, cfg)
    sharded.consume_fastq(os.path.join(FIX, "reads.fq"), limit_batches=4)
    assert all(v == 0 for k, v in sharded.stats_totals.items()
               if "overflow" in k)

    single_cfg = GenoConfig(batch_reads=1024, max_read_len=128,
                            max_kmers_per_read=4)
    single = GenoRunner(mini_index, single_cfg, queued_orientation=False)
    single.consume_fastq(os.path.join(FIX, "reads.fq"), limit_batches=4)

    ref_d, alt_d = sharded.merge_counts()
    n = sharded.n_sites
    np.testing.assert_array_equal(np.asarray(ref_d)[:n],
                                  np.asarray(single.ref_cnt)[:n])
    np.testing.assert_array_equal(np.asarray(alt_d)[:n],
                                  np.asarray(single.alt_cnt)[:n])


def test_sharded_end_to_end_vcf(mini_index, tmp_path):
    cfg = GenoConfig(batch_reads=256, max_read_len=128, max_kmers_per_read=4)
    mesh = make_mesh(8)
    runner = ShardedGenoRunner(mini_index, mesh, cfg)
    runner.consume_fastq(os.path.join(FIX, "reads.fq"))
    out = str(tmp_path / "sharded_output.vcf")
    runner.write_vcf(os.path.join(FIX, "snps.vcf"), out)
    golden = open(os.path.join(FIX, "golden_output.vcf")).read()
    assert open(out).read() == golden
