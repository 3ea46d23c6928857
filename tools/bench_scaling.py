#!/usr/bin/env python3
"""Multi-chip scaling-efficiency benchmark: BOTH mesh modes.

Measures global reads/sec at mesh sizes 1..D for the data-parallel
(replicated index) runner and the sharded-dictionary (all_to_all routed)
runner, and reports efficiency relative to linear scaling of each mode's
1-device rate. On a real pod slice this validates the >=85% target
(BASELINE.md); on a single host it exercises the same code paths over the
virtual CPU mesh (relative numbers only -- all "devices" share the cores).

Usage: python tools/bench_scaling.py [--devices 8] [--batches 8]
           [--cpu] [--modes dp,routed]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all available)")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-reads", type=int, default=2048)
    ap.add_argument("--modes", default="dp,routed")
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vargeno_tpu.config import GenoConfig
    from vargeno_tpu.dist.sharded_dict import ShardedDictGenoRunner
    from vargeno_tpu.dist.sharding import ShardedGenoRunner, make_mesh
    from vargeno_tpu.testing import make_synthetic

    ndev = len(jax.devices())
    maxd = args.devices or ndev
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= maxd]
    modes = args.modes.split(",")

    index, fa, vcf, fq = make_synthetic(
        seed=123, sizes=(2_000_000,), n_snps=5_000,
        n_reads=args.batch_reads * max(sizes) * (args.batches + 1))

    def run_mode(mode):
        results = []
        base_rate = None
        for d in sizes:
            cfg = GenoConfig(batch_reads=args.batch_reads,
                             max_read_len=128, max_kmers_per_read=4)
            mesh = make_mesh(d)
            if mode == "routed":
                if d == 1:
                    continue   # routing needs >=2 shards
                runner = ShardedDictGenoRunner(index, mesh, cfg,
                                               route_factor=6.0)
            else:
                runner = ShardedGenoRunner(index, mesh, cfg)
            runner.consume_fastq(fq, limit_batches=1)  # compile
            t0 = time.time()
            n0 = runner.n_reads
            runner.consume_fastq(fq, limit_batches=args.batches)
            np.asarray(runner.ref_cnt)[:1]   # value fetch = real sync
            dt = time.time() - t0
            rate = (runner.n_reads - n0) / dt
            if base_rate is None:
                base_rate = rate / d   # per-device base at first size
            eff = rate / (base_rate * d)
            results.append(dict(mode=mode, devices=d,
                                reads_per_sec=round(rate, 1),
                                per_device=round(rate / d, 1),
                                efficiency=round(eff, 3)))
            print(json.dumps(results[-1]), flush=True)
        return results

    all_results = []
    for m in modes:
        all_results += run_mode(m)
    print(json.dumps({"metric": "scaling", "results": all_results}))


if __name__ == "__main__":
    main()
