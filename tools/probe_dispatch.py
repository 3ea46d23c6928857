#!/usr/bin/env python3
"""Dissect the bench gap: device-bound rate vs end-to-end rate.

Measures, on the bench workload/config:
  1. steady-state DEVICE rate: K pre-encoded batches dispatched
     back-to-back with one sync at the end (no per-batch host fetch);
  2. per-batch SYNC cost: same but fetching host_vec per batch;
  3. the full host loop at (group, depth) combos.

Usage: python tools/probe_dispatch.py [n_batches]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.device_index import build_device_index
from vargeno_tpu.engine.geno import GenoRunner
from vargeno_tpu.index import store

CACHE = os.environ.get("VGT_CACHE", "/tmp/vgt_bench48")
B = int(os.environ.get("VGT_BATCH", 32768))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def bench_cfg(**kw):
    base = dict(batch_reads=B, max_read_len=128, max_kmers_per_read=3,
                neighbor_item_frac=0.0834, probe_active_frac=0.35,
                pallas_vote=True, events_per_read=16,
                sparse_frac=0.015625, scan_active_frac=0.15,
                probe_hit_cap=8, ht_target_load=0.24)
    base.update(kw)
    return GenoConfig(**base)


def main():
    import jax

    index = store.load(os.path.join(CACHE, "bench"))
    dix = build_device_index(index, ht_target_load=0.24)
    fq = os.path.join(CACHE, "reads.fq")

    cfg = bench_cfg()
    runner = GenoRunner(index, cfg, queued_orientation=True, dix=dix)
    # pre-encode N batches on host once
    from vargeno_tpu import native
    from vargeno_tpu.io.fastq import iter_read_batches

    encs = []
    quals = []
    for i, b in enumerate(iter_read_batches(fq, B, 128, 3)):
        if i >= N:
            break
        encs.append(native.encode_batch(b.codes, b.n_kmers, 3))
        quals.append(b.qual)

    proc = runner._proc(cfg)
    import jax.numpy as jnp

    def dev_arrays(e, q):
        return tuple(jnp.asarray(x) for x in e) + (jnp.asarray(q),)

    host_sets = [dev_arrays(e, q) for e, q in zip(encs, quals)]
    jax.block_until_ready(host_sets)

    # --- 1. device-bound: no per-batch sync, data already on device ---
    def run_device_only(reps=3):
        rates = []
        for _ in range(reps):
            z, z2 = runner._fresh_counts()
            t0 = time.time()
            for hs in host_sets:
                hi, lo, kv, rok, q = hs
                z, z2, process, read_ok, stats = proc.single_enc(
                    hi, lo, kv, rok, q, z, z2)
            np.asarray(z)[:1]
            rates.append(N * B / (time.time() - t0))
        return max(rates)

    r_dev = run_device_only()
    print(f"device-only (data resident, sync at end): {r_dev:,.0f} reads/s"
          f"  ({B / r_dev * 1e3 * 1:.1f} ms/batch)")

    # --- 1b. same but with host->device transfer per batch ---
    def run_with_transfer(reps=3):
        rates = []
        for _ in range(reps):
            z, z2 = runner._fresh_counts()
            t0 = time.time()
            for e, q in zip(encs, quals):
                hi, lo, kv, rok, qq = dev_arrays(e, q)
                z, z2, process, read_ok, stats = proc.single_enc(
                    hi, lo, kv, rok, qq, z, z2)
            np.asarray(z)[:1]
            rates.append(N * B / (time.time() - t0))
        return max(rates)

    r_xfer = run_with_transfer()
    print(f"with per-batch H2D transfer: {r_xfer:,.0f} reads/s")

    # --- 2. with per-batch host_vec fetch (the sync the host loop pays) --
    from vargeno_tpu.engine.geno import _pack_host, _pack_stats

    def run_with_sync(reps=3):
        rates = []
        for _ in range(reps):
            z, z2 = runner._fresh_counts()
            t0 = time.time()
            prev = None
            for e, q in zip(encs, quals):
                hi, lo, kv, rok, qq = dev_arrays(e, q)
                z, z2, process, read_ok, stats = proc.single_enc(
                    hi, lo, kv, rok, qq, z, z2)
                svec = _pack_stats([stats[k] for k in sorted(stats)])
                hv = _pack_host(svec, process, read_ok)
                f = getattr(hv, "copy_to_host_async", None)
                if f:
                    f()
                if prev is not None:
                    np.asarray(prev)
                prev = hv
            np.asarray(prev)
            np.asarray(z)[:1]
            rates.append(N * B / (time.time() - t0))
        return max(rates)

    r_sync = run_with_sync()
    print(f"with per-batch packed sync fetch (depth1): {r_sync:,.0f} "
          f"reads/s")

    # --- 3. host loop at configs ---
    for g, d in ((1, 2), (1, 3), (1, 4), (2, 2), (4, 2)):
        c = bench_cfg(group_size=g, pipeline_depth=d)
        r = GenoRunner(index, c, queued_orientation=True, dix=dix)
        r.consume_fastq(fq, limit_batches=max(2, 2 * g))
        t0 = time.time()
        n0 = r.n_reads
        r.consume_fastq(fq)
        np.asarray(r.ref_cnt)[:1]
        rate = (r.n_reads - n0) / (time.time() - t0)
        print(f"host loop group={g} depth={d}: {rate:,.0f} reads/s")


if __name__ == "__main__":
    main()
