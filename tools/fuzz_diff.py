#!/usr/bin/env python3
"""Differential fuzzing: batched engine vs sequential oracle on freshly
synthesized fixtures. Any count mismatch is a correctness bug (the oracle is
the executable spec, itself pinned byte-identical to the compiled reference
binary on tests/fixtures/mini).

Usage: python tools/fuzz_diff.py [n_seeds] [start_seed]
Sweeps genome size, read counts, error rate and capacity pressure across
seeds. Prints PASS/FAIL per seed; exits nonzero on any failure.

Env: VGT_FUZZ_BIG=1 scales every seed up ~100x (10^5-10^6 reads, larger
genomes) -- the oracle side runs fork-parallel so a big seed stays in
minutes; use for release-level shakes of engine changes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"  # force: the oracle/engine diff is a
# host-side correctness check; never attach to (possibly tunneled) devices

import numpy as np  # noqa: E402


def run_seed(seed: int) -> bool:
    from vargeno_tpu.config import GenoConfig
    from vargeno_tpu.engine.geno import GenoRunner
    from vargeno_tpu.oracle import OracleEngine
    from vargeno_tpu.testing import make_synthetic

    rng = np.random.default_rng(seed ^ 0xF00D)
    big = os.environ.get("VGT_FUZZ_BIG", "0") == "1"
    scale = 100 if big else 1
    sizes = tuple(int(rng.integers(6_000, 40_000)) * (10 if big else 1)
                  for _ in range(int(rng.integers(1, 3))))
    names = tuple(f"chr{i}" for i in range(len(sizes)))
    n_snps = int(rng.integers(10, 200)) * scale
    n_reads = int(rng.integers(200, 1500)) * (1000 if big else 1)
    err = float(rng.choice([0.0, 0.1, 0.3, 0.6]))
    index, fa, vcf, fq = make_synthetic(
        seed=seed, sizes=sizes, names=names, n_snps=n_snps,
        n_reads=n_reads, err_frac=err)

    t0 = time.time()
    eng_cfg = GenoConfig(
        batch_reads=int(rng.choice([64, 256, 509])),
        max_read_len=128, max_kmers_per_read=4,
        group_size=int(rng.choice([1, 3])),
        pipeline_depth=int(rng.choice([1, 2])),
        sparse_exact_snp=bool(rng.integers(0, 2)),
        # low caps exercise the auto-retry escalation path
        events_per_read=int(rng.choice([16, 96])),
        agree_cap=int(rng.choice([2, 4])),
    )
    runner = GenoRunner(index, eng_cfg,
                        queued_orientation=bool(rng.integers(0, 2)))
    runner.consume_fastq(fq)

    oracle = OracleEngine(index)
    if n_reads >= 20_000:
        oracle.run_fastq_parallel(fq)
    else:
        oracle.run_fastq(fq)
    s = index.sites
    orc_ref = np.array([oracle.pileup[int(p)][4] for p in s.pos], np.int64)
    orc_alt = np.array([oracle.pileup[int(p)][5] for p in s.pos], np.int64)
    n = s.pos.shape[0]
    # engine counts are unsaturated; oracle saturates at max_cov
    eng_ref = np.minimum(np.asarray(runner.ref_cnt)[:n], 63)
    eng_alt = np.minimum(np.asarray(runner.alt_cnt)[:n], 63)
    ok = (eng_ref == np.minimum(orc_ref, 63)).all() and \
         (eng_alt == np.minimum(orc_alt, 63)).all()
    cfgs = (f"sizes={sizes} snps={n_snps} reads={n_reads} err={err} "
            f"B={eng_cfg.batch_reads} g={eng_cfg.group_size} "
            f"E={eng_cfg.events_per_read} queued={runner.queued}")
    print(f"seed {seed}: {'PASS' if ok else 'FAIL'} "
          f"({time.time()-t0:.1f}s engine+oracle) {cfgs}", flush=True)
    if not ok:
        bad = np.flatnonzero((eng_ref != np.minimum(orc_ref, 63))
                             | (eng_alt != np.minimum(orc_alt, 63)))
        for i in bad[:10]:
            print(f"  site {i} pos={s.pos[i]} engine=({eng_ref[i]},"
                  f"{eng_alt[i]}) oracle=({orc_ref[i]},{orc_alt[i]})")
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = 0
    for seed in range(start, start + n):
        try:
            if not run_seed(seed):
                fails += 1
        except Exception as e:  # noqa: BLE001 - report and continue
            import traceback

            traceback.print_exc()
            print(f"seed {seed}: ERROR {e!r}", flush=True)
            fails += 1
    print(f"{n - fails}/{n} passed")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
