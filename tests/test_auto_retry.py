"""Auto-retry capacity escalation: a run started with absurdly small
engine capacities must still produce byte-identical output, because any
batch that trips an overflow counter is re-run with the tripped caps
doubled before its counts are merged (engine/geno.py:_run_batch).

The reference has no capacity limits at all (unbounded heap buffers,
src/qv.cc:700-758), so overflow-free execution is a correctness
requirement, not a tuning preference.
"""

import os

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.geno import GenoRunner, _escalate_config

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "mini")


def test_escalate_config_doubles_tripped_caps():
    cfg = GenoConfig(events_per_read=4, candidates_per_read=2,
                     probe_hit_cap=4, agree_cap=2, scan_slot_cap=80,
                     neighbor_item_frac=0.6, sparse_frac=0.6)
    up = _escalate_config(cfg, ["fwd_event_overflow", "rev_cand_overflow",
                                "probe_overflow", "agree_overflow",
                                "fwd_snp_scan_overflow", "ni_overflow",
                                "sparse_overflow"])
    assert up.events_per_read == 8
    assert up.candidates_per_read == 4
    assert up.probe_hit_cap == 8
    assert up.agree_cap == 4
    # capped at block_size_threshold / 1.0
    assert up.scan_slot_cap == cfg.block_size_threshold
    assert up.neighbor_item_frac == 1.0
    assert up.sparse_frac == 1.0
    # untripped fields untouched
    assert up.batch_reads == cfg.batch_reads
    # no-op when nothing tripped
    assert _escalate_config(cfg, []) is cfg


def test_tiny_caps_recover_exact_output(mini_index, tmp_path):
    cfg = GenoConfig(batch_reads=512, max_read_len=128,
                     max_kmers_per_read=4,
                     events_per_read=6, candidates_per_read=4,
                     probe_hit_cap=4, agree_cap=2, scan_slot_cap=4,
                     sites_per_context=1, sparse_events_frac=0.001,
                     neighbor_item_frac=0.004, auto_retry_max=6)
    runner = GenoRunner(mini_index, cfg)
    runner.consume_fastq(os.path.join(FIX, "reads.fq"))
    # escalation happened (the starting caps are too small for the fixture)
    assert runner._cfg_run != cfg
    # and the FINAL attempts were all overflow-free
    assert all(v == 0 for k, v in runner.stats_totals.items()
               if "overflow" in k), runner.stats_totals
    out = str(tmp_path / "retry_output.vcf")
    runner.write_vcf(os.path.join(FIX, "snps.vcf"), out)
    golden = open(os.path.join(FIX, "golden_output.vcf")).read()
    assert open(out).read() == golden
