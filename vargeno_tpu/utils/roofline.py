"""Roofline accounting for the genotyping inner loop.

The north-star metric is reads/sec/chip for the Bloom-probe + dictionary-
lookup loop *at roofline* (BASELINE.md). This module computes two bounds for
a given engine configuration + measured per-batch telemetry:

1. ``bytes`` bound -- the HBM traffic the engine's own data layout implies
   per read (bucket rows, prefilter words, scan windows, event buffers,
   pileup rows), divided into the chip's peak HBM bandwidth. This is the
   classic bandwidth roofline.
2. ``gather`` bound -- random-access descriptor throughput. The loop is
   gather-dominated and each gathered lane costs far more than its bytes
   (HBM transaction latency, XLA gather lowering); the measured per-lane
   rate (tools/bench_gather.py) turns the engine's lane count into a bound.

The reference implementation's analogous accounting would be pointer-chase
latency over its 25 GiB working set (src/qv.cc:834-1367, SURVEY.md §3.2) --
it runs at ~8K reads/s on one core precisely because every probe is a
dependent cache miss.
"""

from __future__ import annotations

import dataclasses


# peak specs by device_kind substring: (HBM GB/s, notes)
DEVICE_HBM_GBPS = {
    "TPU v6": 1640.0,
    "TPU v5p": 2765.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5": 819.0,
    "TPU v4": 1228.0,
    "TPU v3": 900.0,
    "TPU v2": 700.0,
    "cpu": 50.0,            # nominal host DDR
}

# measured random-gather descriptor rates (lanes/sec) by device kind, from
# tools/bench_gather.py on real hardware; used for the gather-bound roofline.
# Updated whenever the microbench is re-run (values recorded in docs/).
DEVICE_GATHER_LANES_PER_SEC = {
    "TPU v5 lite": None,   # filled from bench_gather results at runtime
}


def device_hbm_gbps(device_kind: str) -> float:
    for k, v in DEVICE_HBM_GBPS.items():
        if k.lower() in device_kind.lower():
            return v
    return DEVICE_HBM_GBPS["cpu"]


@dataclasses.dataclass
class StepTraffic:
    """Per-single-orientation-step HBM traffic model (bytes + gather lanes).

    Each term mirrors one gather/scatter family in engine/batch.py; the
    `frac_*` inputs come from the engine's own telemetry (lowq_n,
    probe_hits, ev_max) so the model tracks the actual workload."""

    bytes_total: float
    lanes_total: float
    detail: dict


def step_traffic(cfg, dix, B: int, lowq_frac: float = 0.05,
                 pf_pass_frac: float = 0.03,
                 agree_frac: float = 1.0) -> StepTraffic:
    """Model one single-orientation step of B reads.

    cfg: GenoConfig; dix: DeviceIndex (geometry source).
    lowq_frac: fraction of (read, kmer) lanes entering neighbor search
    (telemetry: lowq_n / (B*K)).
    pf_pass_frac: prefilter pass rate among neighbor probes (telemetry:
    probe_hits is a lower bound; default from measurements).
    """
    K = cfg.max_kmers_per_read
    chain = dix.both_ht_chain
    row_b = dix.both_ht.shape[1] * 4        # bucket row bytes (128)
    NI = max(8, int(B * K * cfg.neighbor_item_frac))
    NI_live = min(NI, int(B * K * lowq_frac) + 1)
    NH = max(64, 4 * NI)
    E = cfg.events_per_read
    FA = max(64, B * cfg.agree_cap)

    d = {}
    # exact combined lookups: one bucket-row chain per (read, kmer) lane
    d["exact"] = (B * K * chain, B * K * chain * row_b)
    # block bounds: hi24 jumpgate pairs + ref_hi window rows
    d["bounds"] = (NI_live * (2 + dix.ref_win_rows),
                   NI_live * (2 * 4 + dix.ref_win_rows * 128))
    # Bloom probes (2 per item) + small-block scans
    scan_r = min(cfg.scan_slot_cap, dix.ref_scan_max)
    scan_s = min(cfg.scan_slot_cap, dix.snp_scan_max)
    d["bf"] = (NI_live * 2, NI_live * 2 * 4)
    d["scan"] = (NI_live * (scan_r * 2 + scan_s * 2),
                 NI_live * (scan_r * (4 + 8) + scan_s * (8 + 8)))
    # neighbor prefilter: 128 lanes per item, 4 B each
    d["prefilter"] = (NI_live * 128, NI_live * 128 * 4)
    # sparse survivors: bucket chains for prefilter passers
    ns = max(64, int(NI * 128 * min(pf_pass_frac * 4, cfg.sparse_frac)))
    d["sparse"] = (ns * chain, ns * chain * row_b)
    # aux expansion rows (80 B) + per-event site-bit tests
    d["aux"] = (NH, NH * 80)
    # event buffer: zero-fill + grouped scatters (writes)
    d["events"] = (B * 2 * K + NH, (B * (E + 1) * 20) + NH * 10 * 20)
    # vote: Pallas VMEM kernel streams the (E, B) fields once
    d["vote"] = (0, E * B * 16)
    # pileup: packed context rows + site directory + site ra + count scatter
    d["pileup"] = (FA * 3 + FA // 2 * 2,
                   FA * (20 + 16) + (FA // 2) * (4 + 8))
    lanes = float(sum(v[0] for v in d.values()))
    byts = float(sum(v[1] for v in d.values()))
    return StepTraffic(bytes_total=byts, lanes_total=lanes, detail=d)


def roofline(cfg, dix, device_kind: str, B: int,
             measured_reads_per_sec: float,
             lowq_frac: float = 0.05,
             retry_frac: float = 0.25,
             gather_lanes_per_sec: float | None = None) -> dict:
    """Returns the roofline report dict for the bench output.

    retry_frac: extra device work from reverse-orientation retry batches
    (reads that failed forward re-run reversed; measured ~20-30%)."""
    tr = step_traffic(cfg, dix, B, lowq_frac=lowq_frac)
    mult = (1.0 + retry_frac) / B          # per read
    bytes_per_read = tr.bytes_total * mult
    lanes_per_read = tr.lanes_total * mult
    bw = device_hbm_gbps(device_kind) * 1e9
    bw_bound = bw / bytes_per_read
    out = dict(
        device=device_kind,
        hbm_gbps=bw / 1e9,
        bytes_per_read=round(bytes_per_read, 1),
        gather_lanes_per_read=round(lanes_per_read, 1),
        bw_bound_reads_per_sec=round(bw_bound, 0),
        achieved_reads_per_sec=round(measured_reads_per_sec, 1),
        bw_roofline_frac=round(measured_reads_per_sec / bw_bound, 4),
    )
    if gather_lanes_per_sec:
        g_bound = gather_lanes_per_sec / lanes_per_read
        out["gather_bound_reads_per_sec"] = round(g_bound, 0)
        out["gather_roofline_frac"] = round(
            measured_reads_per_sec / g_bound, 4)
    return out
