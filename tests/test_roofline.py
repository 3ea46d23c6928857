"""Roofline accounting sanity: the model must track config knobs in the
right direction and produce finite bounds."""

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.utils import roofline


def test_roofline_report_shape(mini_index):
    from vargeno_tpu.engine.device_index import build_device_index

    dix = build_device_index(mini_index)
    cfg = GenoConfig(batch_reads=4096, max_read_len=128,
                     max_kmers_per_read=4)
    rep = roofline.roofline(cfg, dix, "TPU v5 lite", 4096, 100_000.0)
    assert rep["lane_bound_reads_per_sec"] > 0
    assert rep["bw_bound_reads_per_sec"] > rep["lane_bound_reads_per_sec"]
    assert 0 < rep["lane_roofline_frac"] < 10
    # halving the probe grid's active fraction lowers lane counts
    cfg2 = GenoConfig(batch_reads=4096, max_read_len=128,
                      max_kmers_per_read=4, probe_active_frac=0.125)
    rep2 = roofline.roofline(cfg2, dix, "TPU v5 lite", 4096, 100_000.0)
    assert rep2["lane_bound_reads_per_sec"] > rep["lane_bound_reads_per_sec"]


def test_lane_rates_override():
    r = roofline.device_lane_rates(
        "TPU v5 lite",
        {"word_gather_1048576": 50e6, "row_gather_1048576": None,
         "scatter_rows": 10e6})
    assert r["word"] == 50e6
    assert r["row"] == 30e6     # null measurement keeps the default
    assert r["scatter"] == 10e6
