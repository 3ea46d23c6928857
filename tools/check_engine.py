#!/usr/bin/env python3
"""Dev: run the batched engine vs the oracle on fixture reads, compare
per-read decisions and final pileup counts."""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import dataclasses

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.batch import make_batch_processor
from vargeno_tpu.engine.device_index import build_device_index
from vargeno_tpu.index import store
from vargeno_tpu.io.fastq import iter_read_batches
from vargeno_tpu.oracle import OracleEngine

FIX = "tests/fixtures/mini"
CACHE = "/tmp/mini_index"


def main():
    n_limit = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    index = store.load_npz(CACHE)
    cfg = GenoConfig(batch_reads=256, max_read_len=128, max_kmers_per_read=4)
    dix = build_device_index(index)
    step = make_batch_processor(dix, cfg, return_debug=True)

    oracle = OracleEngine(index, cfg)

    s = index.sites
    n_sites = dix.n_sites
    ref_cnt = np.zeros(n_sites + 1, np.int32)
    alt_cnt = np.zeros(n_sites + 1, np.int32)
    import jax.numpy as jnp
    ref_cnt = jnp.asarray(ref_cnt)
    alt_cnt = jnp.asarray(alt_cnt)

    # read raw reads for the oracle
    raw = []
    with open(os.path.join(FIX, "reads.fq")) as f:
        while True:
            rid = f.readline()
            if not rid:
                break
            seq = f.readline().rstrip("\n")
            f.readline()
            q = f.readline().rstrip("\n")
            raw.append((seq, q))
            if len(raw) >= n_limit:
                break

    mismatches = 0
    t0 = time.time()
    done = 0
    for batch in iter_read_batches(os.path.join(FIX, "reads.fq"),
                                   cfg.batch_reads, cfg.max_read_len,
                                   cfg.max_kmers_per_read):
        ref_cnt, alt_cnt, stats, debug = step(
            jnp.asarray(batch.codes), jnp.asarray(batch.n_kmers),
            jnp.asarray(batch.qual), ref_cnt, alt_cnt)
        stats = {k: int(v) for k, v in stats.items()}
        ovf = {k: v for k, v in stats.items() if "overflow" in k and v}
        if ovf:
            print("OVERFLOWS:", ovf)
        fwd_p = np.asarray(debug["fwd_process"])
        fwd_t = np.asarray(debug["fwd_target"])
        rev_p = np.asarray(debug["rev_process"])
        rev_t = np.asarray(debug["rev_target"])

        for i in range(batch.n_valid):
            g = done + i
            if g >= len(raw):
                break
            seq, q = raw[g]
            dbg = oracle.process_read(seq, q)
            oo = dbg["orientations"]
            o_fp = oo[0]["process"] if len(oo) > 0 else False
            o_ft = oo[0]["target"] if len(oo) > 0 else 0
            o_rp = oo[1]["process"] if len(oo) > 1 else False
            o_rt = oo[1]["target"] if len(oo) > 1 else 0
            e_fp, e_ft = bool(fwd_p[i]), int(fwd_t[i])
            e_rp, e_rt = bool(rev_p[i]), int(rev_t[i])
            bad = (o_fp != e_fp or (o_fp and o_ft != e_ft))
            if not o_fp and len(oo) > 1:
                bad = bad or (o_rp != e_rp) or (o_rp and o_rt != e_rt)
            if bad:
                mismatches += 1
                if mismatches <= 10:
                    print(f"read {g}: oracle fwd=({o_fp},{o_ft}) "
                          f"rev=({o_rp},{o_rt}) ; engine "
                          f"fwd=({e_fp},{e_ft}) rev=({e_rp},{e_rt})")
                    print("  seq:", seq[:64], "qual:", q[:8])
        done += batch.n_valid
        if done >= n_limit:
            break

    print(f"{done} reads compared, {mismatches} decision mismatches, "
          f"{time.time()-t0:.1f}s")

    # counts comparison
    eref = np.asarray(ref_cnt)[:n_sites]
    ealt = np.asarray(alt_cnt)[:n_sites]
    oref = np.array([oracle.pileup[int(p)][4] for p in s.pos])
    oalt = np.array([oracle.pileup[int(p)][5] for p in s.pos])
    # oracle saturates at 63 during accumulation; engine clips later
    eref = np.minimum(eref, 63)
    ealt = np.minimum(ealt, 63)
    nref = int((eref != oref).sum())
    nalt = int((ealt != oalt).sum())
    print(f"count mismatches: ref={nref} alt={nalt} of {n_sites} sites")
    if nref or nalt:
        bad = np.flatnonzero((eref != oref) | (ealt != oalt))[:10]
        for b in bad:
            print(f"  site pos={int(s.pos[b])} engine=({eref[b]},{ealt[b]}) "
                  f"oracle=({oref[b]},{oalt[b]})")
        sys.exit(1)
    print("ENGINE == ORACLE")


if __name__ == "__main__":
    main()
