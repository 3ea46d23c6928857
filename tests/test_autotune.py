"""Runtime capacity auto-tuning (engine.autotune).

Tuning may only SHRINK capacities, must leave results byte-identical
(overflow escalation restores exactness if a tuned cap trips), and must
actually fire on a workload whose defaults are oversized.
"""

import dataclasses
import os

import numpy as np

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.autotune import tuned_config
from vargeno_tpu.engine.geno import GenoRunner

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


class _Dix:
    ref_scan_max = 4
    snp_scan_max = 6


def test_tuned_config_shrinks_only():
    cfg = GenoConfig(batch_reads=1024, max_kmers_per_read=4)
    bm = dict(ev_max=4, lowq_n=80, probe_lanes_max=100,
              act_lanes_max=500, sparse_lanes_max=60,
              ref_scan_lanes_max=90, snp_scan_lanes_max=120)
    t = tuned_config(cfg, _Dix(), bm, headroom=2.0)
    assert t.events_per_read <= cfg.events_per_read
    assert t.neighbor_item_frac <= cfg.neighbor_item_frac
    assert t.probe_hit_cap <= cfg.probe_hit_cap
    assert t.probe_active_frac <= cfg.probe_active_frac
    assert t.sparse_frac <= cfg.sparse_frac
    assert t.scan_active_frac <= cfg.scan_active_frac
    assert t != cfg
    # capacities still cover the measured need with headroom
    B, K = cfg.batch_reads, cfg.max_kmers_per_read
    NI = max(8, int(B * K * t.neighbor_item_frac))
    assert NI >= bm["lowq_n"] * 2
    assert t.events_per_read >= bm["ev_max"] * 2


def test_tuned_config_never_grows():
    cfg = GenoConfig(batch_reads=1024, max_kmers_per_read=4,
                     events_per_read=4, probe_hit_cap=2)
    bm = dict(ev_max=100, lowq_n=10**6, probe_lanes_max=10**6)
    t = tuned_config(cfg, _Dix(), bm, headroom=2.0)
    assert t.events_per_read == 4
    assert t.probe_hit_cap == 2


def test_auto_tune_preserves_golden(mini_index, tmp_path):
    cfg = GenoConfig(batch_reads=512, max_read_len=128,
                     max_kmers_per_read=4, auto_tune=True, tune_batches=3)
    runner = GenoRunner(mini_index, cfg)
    runner.consume_fastq(os.path.join(FIX, "reads.fq"))
    assert runner._tuned
    assert runner._cfg_run != cfg           # tuning actually fired
    assert runner._cfg_run.events_per_read < cfg.events_per_read
    out = str(tmp_path / "tuned.vcf")
    runner.write_vcf(os.path.join(FIX, "snps.vcf"), out)
    golden = open(os.path.join(FIX, "golden_output.vcf")).read()
    assert open(out).read() == golden
