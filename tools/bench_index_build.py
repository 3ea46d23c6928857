#!/usr/bin/env python3
"""Index-build benchmark: `vargeno-tpu index` vs the reference binary.

The reference's `vargeno index` (src/qv.cc:2239-2389) is half its CLI
surface: two Bloom-filter passes (generate_bf.cc:90-168), the SNP + ref
dictionary builds (dictgen.c:12-154, 561-794 -- each dominated by a qsort
over every genome/SNP-window 32-mer), and binary serialization. Ours is
vargeno_tpu.index.build (numpy rolling encodes + threaded native radix
kv-sort). This tool times both COLD (fresh output prefix, subprocess incl.
interpreter/JIT-free startup) on the bench dataset, checks the artifacts
exist, and records the reference seconds into bench_baseline.json so
bench.py can report `index_build_vs` on machines without the binary.

Usage: python tools/bench_index_build.py [--dataset DIR] [--reps N]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_BINARY = os.environ.get("VGT_REF_BINARY", "/tmp/refbuild/vargeno")
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")


def wipe(prefix):
    for suf in (".vgt.npz", ".chrlens", ".ref.dict", ".snp.dict",
                ".ref.bf", ".ref.bf.lite.bf", ".snp.bf"):
        try:
            os.remove(prefix + suf)
        except OSError:
            pass
    shutil.rmtree(prefix + ".vgt", ignore_errors=True)


def timed_run(cmd, cwd=None):
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=cwd,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=os.environ.get(
        "VGT_BENCH_CACHE", "/tmp/vgt_bench48"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--reference-format", action="store_true",
                    help="our build also writes the reference's binary "
                         "formats (the fair apples-to-apples config)")
    args = ap.parse_args()
    fa = os.path.join(args.dataset, "genome.fa")
    vcf = os.path.join(args.dataset, "snps.vcf")
    if not os.path.exists(fa):
        sys.exit(f"dataset not found: {fa} (run bench.py once to synth)")

    out = {"dataset": args.dataset,
           "genome_bytes": os.path.getsize(fa),
           "vcf_bytes": os.path.getsize(vcf)}

    # --- ours (cold subprocess; min over reps = best steady machine) ---
    ours_prefix = os.path.join(args.dataset, "ibench")
    cmd = [sys.executable, "-m", "vargeno_tpu.cli", "index", fa, vcf,
           ours_prefix]
    if args.reference_format:
        cmd.append("--reference-format")
    ts = []
    for _ in range(args.reps):
        wipe(ours_prefix)
        ts.append(timed_run(cmd, cwd=REPO))
    out["ours_s"] = round(min(ts), 2)
    out["ours_all_s"] = [round(t, 2) for t in ts]
    ok = os.path.exists(ours_prefix + ".vgt.npz") or os.path.isdir(
        ours_prefix + ".vgt")
    if not ok:
        sys.exit("our index build produced no artifacts")

    # --- reference binary ---
    if os.path.exists(REF_BINARY):
        ref_prefix = os.path.join(args.dataset, "ibench_ref")
        ts = []
        for _ in range(args.reps):
            wipe(ref_prefix)
            ts.append(timed_run([REF_BINARY, "index", fa, vcf, ref_prefix]))
        out["ref_s"] = round(min(ts), 2)
        out["ref_all_s"] = [round(t, 2) for t in ts]
        out["speedup_vs_ref"] = round(out["ref_s"] / out["ours_s"], 2)
        try:   # persist for bench.py's index_build_vs on binary-less hosts
            base = json.load(open(BASELINE_FILE)) \
                if os.path.exists(BASELINE_FILE) else {}
            base["ref_index_build_s"] = out["ref_s"]
            base["ref_index_dataset_bytes"] = out["genome_bytes"]
            json.dump(base, open(BASELINE_FILE, "w"))
        except OSError as e:
            print(f"# could not update {BASELINE_FILE}: {e}",
                  file=sys.stderr)
    else:
        print(f"# reference binary not found at {REF_BINARY}; "
              f"skipping the comparison leg", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
