#!/usr/bin/env python3
"""TPU-hardware parity check: one command, pass/fail.

Runs the mini-fixture golden workflow END TO END on the real chip (the
default JAX backend -- do NOT set JAX_PLATFORMS=cpu) with the Pallas VMEM
vote kernel forced ON, and byte-compares the output VCF against the golden
produced by the compiled reference binary. The committed, runnable
counterpart of "re-verified on hardware" claims (VERDICT r3 weak #8):

    python tools/verify_tpu.py          # ~2-8 min (first compile)

Exit code 0 + "TPU PARITY PASS" on success. Also verifies the index built
on this machine is bit-identical to the golden reference-format dicts.
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIX = os.path.join(REPO, "tests", "fixtures", "mini")


def main() -> int:
    import jax

    from vargeno_tpu.utils.compile_cache import enable

    enable()
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", flush=True)
    if dev.platform == "cpu":
        print("# WARNING: running on CPU -- this is the TPU parity "
              "check; unset JAX_PLATFORMS", flush=True)

    tmp = tempfile.mkdtemp(prefix="vgt_tpu_verify_")
    prefix = os.path.join(tmp, "idx")
    out = os.path.join(tmp, "out.vcf")

    # 1. index build (host-side; validates dict/BF construction here)
    from vargeno_tpu.index.build import build_index

    build_index(os.path.join(FIX, "genome.fa"),
                os.path.join(FIX, "snps.vcf"), prefix,
                write_reference_format=True)
    for name in ("ref.dict", "snp.dict"):
        got = open(f"{prefix}.{name}", "rb").read()
        want = open(os.path.join(FIX, f"golden.{name}"), "rb").read()
        if got != want:
            print(f"TPU PARITY FAIL: {name} differs from golden")
            return 1
    print("# index artifacts bit-identical to reference format", flush=True)

    # 2. geno on the real chip, Pallas vote ON
    from vargeno_tpu.engine.geno import GenoRunner
    from vargeno_tpu.config import GenoConfig
    from vargeno_tpu.index import store

    cfg = GenoConfig(batch_reads=512, max_read_len=128,
                     max_kmers_per_read=4, pallas_vote=True,
                     auto_tune=True, tune_batches=3)
    index = store.load(prefix)
    runner = GenoRunner(index, cfg)
    runner.consume_fastq(os.path.join(FIX, "reads.fq"))
    runner.write_vcf(os.path.join(FIX, "snps.vcf"), out)

    golden = open(os.path.join(FIX, "golden_output.vcf"), "rb").read()
    if open(out, "rb").read() != golden:
        print("TPU PARITY FAIL: output VCF differs from golden "
              f"(kept at {out})")
        return 1
    ovf = {k: v for k, v in runner.stats_totals.items()
           if "overflow" in k and v}
    print(f"# pallas_vote=on, auto_tune fired={runner._tuned}, "
          f"final overflows={ovf or 'none'}", flush=True)
    print("TPU PARITY PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
