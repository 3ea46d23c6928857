#!/usr/bin/env python3
"""Multi-PROCESS scaling probe: the multihost runners on a local cluster.

Spawns N worker processes x K virtual CPU devices each (Gloo collectives),
streams the same synthetic workload through MultiHostGenoRunner /
MultiHostDictGenoRunner, and reports the global rate next to the
single-process rate on the same total device count -- i.e. the measured
OVERHEAD of crossing a process (DCN-like) boundary, which is the part of
multi-host scaling a single machine can validate (the compute itself
shares the same cores either way; see docs/SCALING.md).

Usage:
  python tools/bench_scaling_mh.py [--procs 2] [--devices-per-proc 2]
      [--batches 6] [--batch-reads 2048] [--modes dp,routed]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coord")
    ap.add_argument("--procs", type=int)
    ap.add_argument("--pid", type=int)
    ap.add_argument("--devices-per-proc", type=int)
    ap.add_argument("--prefix")
    ap.add_argument("--fq")
    ap.add_argument("--mode")
    ap.add_argument("--batches", type=int)
    ap.add_argument("--batch-reads", type=int)
    a = ap.parse_args()

    from vargeno_tpu.dist import multihost

    multihost.initialize(a.coord, a.procs, a.pid,
                         cpu_devices=a.devices_per_proc)
    import numpy as np

    from vargeno_tpu.config import GenoConfig
    from vargeno_tpu.dist.sharding import make_mesh
    from vargeno_tpu.index import store

    index = store.load_npz(a.prefix)
    cfg = GenoConfig(batch_reads=a.batch_reads, max_read_len=128,
                     max_kmers_per_read=4)
    mesh = make_mesh()
    cls = (multihost.MultiHostDictGenoRunner if a.mode == "routed"
           else multihost.MultiHostGenoRunner)
    kw = dict(route_factor=6.0) if a.mode == "routed" else {}
    runner = cls(index, mesh, cfg, **kw)
    runner.consume_fastq(a.fq, limit_batches=1)   # compile
    multihost.barrier("warm")
    t0 = time.time()
    n0 = runner.n_reads
    runner.consume_fastq(a.fq, limit_batches=a.batches)
    rc, _ = runner.merge_counts()
    np.asarray(rc)[:1]
    dt = time.time() - t0
    if a.pid == 0:
        print(json.dumps({"mode": a.mode, "procs": a.procs,
                          "devices": mesh.devices.size,
                          "reads_per_sec": round(
                              (runner.n_reads - n0) / dt, 1)}),
              flush=True)
    multihost.barrier("done")
    import jax

    jax.distributed.shutdown()


def main():
    if "--worker" in sys.argv:
        worker()
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-reads", type=int, default=2048)
    ap.add_argument("--modes", default="dp,routed")
    a = ap.parse_args()

    # dataset + index built once by the parent (workers mmap-load)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from vargeno_tpu.index import store
    from vargeno_tpu.testing import make_synthetic

    D = a.procs * a.devices_per_proc
    cache = f"/tmp/vgt_mh_scale_{a.batch_reads}"
    prefix = os.path.join(cache, "idx")
    fqp = os.path.join(cache, "reads.fq")
    if not os.path.exists(prefix + ".vgt.npz"):
        os.makedirs(cache, exist_ok=True)
        index, fa, vcf, fq = make_synthetic(
            seed=123, tmpdir=cache, sizes=(2_000_000,), n_snps=5_000,
            n_reads=a.batch_reads * D * (a.batches + 2))
        store.save_npz(prefix, index)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    results = []
    for mode in a.modes.split(","):
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        procs = []
        for pid in range(a.procs):
            procs.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--coord", f"localhost:{port}",
                 "--procs", str(a.procs), "--pid", str(pid),
                 "--devices-per-proc", str(a.devices_per_proc),
                 "--prefix", prefix, "--fq", fqp, "--mode", mode,
                 "--batches", str(a.batches),
                 "--batch-reads", str(a.batch_reads)],
                cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        outs = [p.communicate(timeout=580)[0].decode(errors="replace")
                for p in procs]
        for p, o in zip(procs, outs):
            if p.returncode != 0:
                print(o[-3000:], file=sys.stderr)
                raise SystemExit(f"worker failed ({mode})")
        for line in outs[0].splitlines():
            if line.startswith("{"):
                r = json.loads(line)
                results.append(r)
                print(json.dumps(r), flush=True)
    print(json.dumps({"metric": "scaling_multiprocess", "results": results}))


if __name__ == "__main__":
    main()
