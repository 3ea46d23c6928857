#!/usr/bin/env python3
"""Dev driver: run the oracle engine on the mini fixture and diff the output
VCF against the reference binary's golden_output.vcf."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.finalize import finalize_calls
from vargeno_tpu.index import bloom, dictgen, store
from vargeno_tpu.io import fasta as fasta_io
from vargeno_tpu.io.vcf_writer import write_calls_vcf
from vargeno_tpu.oracle import OracleEngine

FIX = "tests/fixtures/mini"
CACHE = "/tmp/mini_index"


def load_or_build_index() -> store.VarGenoIndex:
    cfg = GenoConfig()
    if os.path.exists(CACHE + ".vgt.npz"):
        return store.load_npz(CACHE)
    seqs = fasta_io.parse_fasta(os.path.join(FIX, "genome.fa"))
    ref_bf, _lite = bloom.build_ref_bfs(seqs, cfg.ref_bf_bits, 64)
    snp_bf = bloom.build_snp_bf(seqs, os.path.join(FIX, "snps.vcf"),
                                cfg.snp_bf_bits)
    snp_dict, locs = dictgen.build_snp_dict_from_vcf(
        seqs, os.path.join(FIX, "snps.vcf"))
    ref_dict, _ = dictgen.build_ref_dict(seqs)
    index = store.VarGenoIndex(
        ref=ref_dict, snp=snp_dict, ref_bf=ref_bf, snp_bf=snp_bf,
        chrlens=[(s.name, s.size) for s in seqs],
        sites=store.derive_sites(snp_dict), snp_locations=locs)
    store.save_npz(CACHE, index)
    return index


def main():
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else None
    index = load_or_build_index()
    eng = OracleEngine(index)
    t0 = time.time()
    eng.run_fastq(os.path.join(FIX, "reads.fq"), limit=limit)
    dt = time.time() - t0
    nreads = limit or sum(1 for _ in open(os.path.join(FIX, "reads.fq"))) // 4
    print(f"oracle: {nreads} reads in {dt:.1f}s ({nreads/dt:.0f} reads/s)")

    s = index.sites
    ref_cnt = np.array([eng.pileup[int(p)][4] for p in s.pos])
    alt_cnt = np.array([eng.pileup[int(p)][5] for p in s.pos])
    calls = finalize_calls(index.chrlens, s.pos, s.ref, s.alt, s.rf, s.af,
                           ref_cnt, alt_cnt, eng.config)
    out = "/tmp/oracle_output.vcf"
    write_calls_vcf(os.path.join(FIX, "snps.vcf"), out, calls)

    golden = open(os.path.join(FIX, "golden_output.vcf")).read()
    ours = open(out).read()
    if golden == ours:
        print("PARITY OK: oracle output byte-identical to reference")
    else:
        import difflib
        diff = list(difflib.unified_diff(
            golden.splitlines(), ours.splitlines(), "golden", "oracle",
            lineterm=""))
        print(f"DIFF ({len(diff)} lines):")
        print("\n".join(diff[:40]))
        sys.exit(1)


if __name__ == "__main__":
    main()
