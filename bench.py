#!/usr/bin/env python3
"""Benchmark: genotyping throughput (reads/sec/chip) on TPU.

Workload: synthetic 48 Mb (chr22-scale) genome + 500K SNPs + 101bp reads at the reference's
error/quality profile, streamed through the batched engine on one chip.
Baseline: the reference binary's steady-state streaming rate measured on this
machine (stored in bench_baseline.json; recomputed if absent and the binary
exists), with index-load setup time excluded for fairness.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.environ.get("VGT_BENCH_CACHE", "/tmp/vgt_bench48")
N_READS = int(os.environ.get("VGT_BENCH_READS", 262_144))
GENOME_MB = int(os.environ.get("VGT_BENCH_MB", 48))
N_SNPS = int(os.environ.get("VGT_BENCH_SNPS", 500_000))
BATCH = int(os.environ.get("VGT_BENCH_BATCH", 32768))
PASSES = int(os.environ.get("VGT_BENCH_PASSES", 5))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
REF_BINARY = "/tmp/refbuild/vargeno"


def build_dataset():
    os.makedirs(CACHE, exist_ok=True)
    marker = os.path.join(CACHE, "ready2")
    fa = os.path.join(CACHE, "genome.fa")
    vcf = os.path.join(CACHE, "snps.vcf")
    fq = os.path.join(CACHE, "reads.fq")
    if os.path.exists(marker):
        return fa, vcf, fq
    from vargeno_tpu.testing import synth_genome, write_inputs

    rng = np.random.default_rng(20260817)
    genome = synth_genome(rng, sizes=(GENOME_MB * 1_000_000,),
                          names=("chrB1",))
    write_inputs(CACHE, rng, genome, n_snps=N_SNPS, n_reads=N_READS,
                 err_frac=0.15)
    open(marker, "w").write("ok")
    return fa, vcf, fq


def build_index(fa, vcf):
    from vargeno_tpu.config import GenoConfig
    from vargeno_tpu.index import store
    from vargeno_tpu.index.build import build_index as bi

    prefix = os.path.join(CACHE, "bench")
    if store.exists(prefix):
        return store.load(prefix)
    return bi(fa, vcf, prefix)


def measure_reference(fa, vcf, fq) -> float:
    """reads/sec of the reference binary, setup time excluded."""
    if os.path.exists(BASELINE_FILE):
        return json.load(open(BASELINE_FILE))["ref_reads_per_sec"]
    if not os.path.exists(REF_BINARY):
        return float("nan")
    prefix = os.path.join(CACHE, "refidx")
    if not os.path.exists(prefix + ".ref.dict"):
        subprocess.run([REF_BINARY, "index", fa, vcf, prefix], check=True,
                       stdout=subprocess.DEVNULL)
    # empty-read run isolates setup (jumpgate init, dict load)
    empty = os.path.join(CACHE, "empty.fq")
    open(empty, "w").close()
    out = os.path.join(CACHE, "ref_out.vcf")

    def timed(reads_file):
        t0 = time.time()
        subprocess.run([REF_BINARY, "geno", prefix, reads_file, vcf, out],
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return time.time() - t0

    timed(empty)            # cold run: page in the 3.6 GB of BF/dict files
    t_setup = timed(empty)  # warm setup (jumpgate init + loads)
    t_full = timed(fq)      # warm full
    n = sum(1 for _ in open(fq)) // 4
    rate = n / max(t_full - t_setup, 1e-3)
    json.dump({"ref_reads_per_sec": rate, "n_reads": n,
               "t_setup": t_setup, "t_full": t_full},
              open(BASELINE_FILE, "w"))
    return rate


def main():
    fa, vcf, fq = build_dataset()
    ref_rate = measure_reference(fa, vcf, fq)

    import jax

    from vargeno_tpu.config import GenoConfig
    from vargeno_tpu.engine.geno import GenoRunner

    index = build_index(fa, vcf)
    # grouped dispatch amortizes the tunneled dispatch link's round trips;
    # fall back to per-batch dispatch if the grouped program fails to build
    group = int(os.environ.get("VGT_BENCH_GROUP", "8"))
    ladder = [(group, True), (1, True), (1, False)]
    for i, (g, pv) in enumerate(ladder):
        cfg = GenoConfig(batch_reads=BATCH, max_read_len=128,
                         max_kmers_per_read=4, pallas_vote=pv,
                         group_size=g, pipeline_depth=2,
                         # measured workload maxima (ev_max=4, lowq 4.7%):
                         # 4x headroom, auto-retry escalates if ever hit
                         events_per_read=16)
        runner = GenoRunner(index, cfg, queued_orientation=True)
        try:
            # warm up / compile every step variant the loop will use
            runner.consume_fastq(fq, limit_batches=max(2, 2 * g))
            break
        except Exception as e:  # noqa: BLE001 - bench must self-heal
            if i == len(ladder) - 1:
                raise
            print(f"# config group={g} pallas={pv} failed ({e!r}); "
                  f"falling back", file=sys.stderr)

    # median of full passes: the measurement environment (shared chip /
    # tunneled dispatch) shows 1.5-2x transient throughput swings, so a
    # single long pass is a lottery; the median pass is the steady state
    rates = []
    for _ in range(PASSES):
        t0 = time.time()
        n0 = runner.n_reads
        runner.consume_fastq(fq)
        jax.block_until_ready(runner.ref_cnt)
        dt = time.time() - t0
        rates.append((runner.n_reads - n0) / dt)
    rate = sorted(rates)[len(rates) // 2]
    ovf = {k: v for k, v in runner.stats_totals.items()
           if "overflow" in k and v}
    if ovf:
        print(f"# WARNING overflows: {ovf}", file=sys.stderr)

    vs = rate / ref_rate if ref_rate == ref_rate else None
    print(json.dumps({
        "metric": "geno_throughput",
        "value": round(rate, 1),
        "unit": "reads/sec/chip",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
