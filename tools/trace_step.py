#!/usr/bin/env python3
"""Capture a jax.profiler device trace of the batch step for op-level
attribution (the host-side ablations disagree at the ~10 ms level, so
kernel-level data decides what to optimize next).

Usage:  python tools/trace_step.py [out_dir] [batch_reads]
Then:   inspect <out_dir>/plugins/profile/*/  (trace.json.gz is Perfetto-
        compatible; tools/summarize_trace.py prints top ops).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.batch import make_batch_processor
from vargeno_tpu.engine.device_index import build_device_index
from vargeno_tpu.index import store
from vargeno_tpu.io.fastq import iter_read_batches

CACHE = os.environ.get("VGT_CACHE", "/tmp/vgt_bench48")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vgt_trace"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    index = store.load(os.path.join(CACHE, "bench"))
    # VGT_EPR defaults to 16 (the bench config), NOT the GenoConfig default
    # of 96 -- traces are meant to profile the same step the bench measures;
    # set VGT_EPR=96 to trace the engine-default capacity instead
    cfg = GenoConfig(batch_reads=B, max_read_len=128,
                     max_kmers_per_read=int(os.environ.get("VGT_K", 3)),
                     neighbor_item_frac=float(
                         os.environ.get("VGT_NIF", 0.0834)),
                     probe_active_frac=float(
                         os.environ.get("VGT_PAF", 0.35)),
                     pallas_vote=True,
                     events_per_read=int(os.environ.get("VGT_EPR", 16)),
                     # mirror bench.py's right-sized capacities so traces
                     # profile the same step the bench measures
                     sparse_frac=float(os.environ.get("VGT_SPF", 0.015625)),
                     scan_active_frac=float(os.environ.get("VGT_SAF", 0.15)),
                     probe_hit_cap=int(os.environ.get("VGT_PHC", 8)))
    dix = build_device_index(index, ht_target_load=0.24)
    proc = make_batch_processor(dix, cfg)
    K = cfg.max_kmers_per_read
    b = next(iter_read_batches(os.path.join(CACHE, "reads.fq"), B, 128, K))
    from vargeno_tpu import native

    hi_n, lo_n, kv_n, rok_n = native.encode_batch(b.codes, b.n_kmers, K)
    hi = jnp.asarray(hi_n)
    lo = jnp.asarray(lo_n)
    kv = jnp.asarray(kv_n)
    rok = jnp.asarray(rok_n)
    qual = jnp.asarray(b.qual)
    n = dix.n_sites

    def run():
        rc = jnp.zeros(n + 1, jnp.int32)
        ac = jnp.zeros(n + 1, jnp.int32)
        return proc.single_enc(hi, lo, kv, rok, qual, rc, ac)[0]

    jax.block_until_ready(run())  # compile outside the trace
    t0 = time.time()
    jax.block_until_ready(run())
    print(f"single step: {(time.time()-t0)*1e3:.1f} ms")
    jax.profiler.start_trace(out)
    for _ in range(3):
        r = run()
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
