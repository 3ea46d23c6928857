#!/usr/bin/env python3
"""Profile the engine's stages on the real TPU chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vargeno_tpu.config import GenoConfig
from vargeno_tpu.engine.backend import LocalBackend
from vargeno_tpu.engine.batch import make_batch_processor, encode_batch
from vargeno_tpu.engine.device_index import build_device_index
from vargeno_tpu.index import store
from vargeno_tpu.io.fastq import iter_read_batches

CACHE = os.environ.get("VGT_CACHE", "/tmp/vgt_bench48")


def timeit(fn, *args, n=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    nif = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0625
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    index = store.load_npz(os.path.join(CACHE, "bench"))
    cfg = GenoConfig(batch_reads=B, max_read_len=128, max_kmers_per_read=4,
                     neighbor_item_frac=nif)
    dix = build_device_index(index)
    print(f"devices: {jax.devices()}  n_ref={dix.n_ref} n_snp={dix.n_snp}")

    batches = list(iter_read_batches(os.path.join(CACHE, "reads.fq"),
                                     cfg.batch_reads, cfg.max_read_len,
                                     cfg.max_kmers_per_read))
    b = batches[0]
    codes = jnp.asarray(b.codes)
    nk = jnp.asarray(b.n_kmers)
    qual = jnp.asarray(b.qual)

    # how many kmers are actually low-quality?
    lowq = (b.qual < ord("8")) & (np.arange(4)[None, :] < b.n_kmers[:, None])
    print(f"low-quality kmers in batch: {lowq.sum()} "
          f"(NI capacity {int(B*4*nif)})")

    # full step
    step = make_batch_processor(dix, cfg)
    n = dix.n_sites
    rc = jnp.zeros(n + 1, jnp.int32)
    ac = jnp.zeros(n + 1, jnp.int32)
    t0 = time.time()
    out = step(codes, nk, qual, rc, ac)
    jax.block_until_ready(out[0])
    print(f"compile+first run: {time.time()-t0:.2f}s")

    def run_step(codes, nk, qual):
        rc = jnp.zeros(n + 1, jnp.int32)
        ac = jnp.zeros(n + 1, jnp.int32)
        return step(codes, nk, qual, rc, ac)[0]

    dt = timeit(run_step, codes, nk, qual, n=5)
    print(f"full step: {dt*1e3:.1f} ms -> {B/dt:.0f} reads/s")

    # stage micro-benchmarks
    be_f = lambda d: LocalBackend(d, cfg.replicate_stride_bug,
                                  cfg.block_size_threshold)

    @jax.jit
    def stage_encode(dix_t, codes, nk):
        return encode_batch(codes, nk, 4)

    @jax.jit
    def stage_exact(dix_t, codes, nk):
        hi, lo, kv, ok = encode_batch(codes, nk, 4)
        be = be_f(dix_t)
        r = be.exact_ref(hi, lo)
        s = be.exact_snp(hi, lo)
        return r[0], s[0]

    @jax.jit
    def stage_scan100(dix_t, hi, lo):
        be = be_f(dix_t)
        res = be.ref_scan(hi, lo, jnp.ones(hi.shape[0], bool))
        res2 = be.snp_scan(hi, lo, jnp.ones(hi.shape[0], bool))
        return res.hit, res2.hit

    @jax.jit
    def stage_hiprobes(dix_t, hi, lo):
        be = be_f(dix_t)
        # 128 exact queries per item (hi-half ref+snp)
        bases = jnp.arange(16, dtype=jnp.int32)
        jj = jnp.arange(4, dtype=jnp.int32)
        bg = jnp.repeat(bases, 4)[None, :]
        jg = jnp.tile(jj, 16)[None, :]
        nb_hi = ((hi[:, None] & ~(jnp.uint32(3) << (2*bg).astype(jnp.uint32)))
                 | (jg.astype(jnp.uint32) << (2*bg).astype(jnp.uint32)))
        nb_lo = jnp.broadcast_to(lo[:, None], nb_hi.shape)
        r = be.exact_ref(nb_hi, nb_lo)
        s = be.exact_snp(nb_hi, nb_lo)
        return r[0], s[0]

    hi, lo, kv, ok = jax.jit(lambda c, k: encode_batch(c, k, 4))(codes, nk)
    NI = max(8, int(B * 4 * nif))
    it_hi = hi.reshape(-1)[:NI]
    it_lo = lo.reshape(-1)[:NI]

    for name, fn, args in [
        ("encode", stage_encode, (dix, codes, nk)),
        ("exact(BK)", stage_exact, (dix, codes, nk)),
        (f"scan100(NI={NI})", stage_scan100, (dix, it_hi, it_lo)),
        (f"hi128probes(NI={NI})", stage_hiprobes, (dix, it_hi, it_lo)),
    ]:
        dt = timeit(fn, *args, n=3)
        print(f"{name:24s} {dt*1e3:9.2f} ms")


def ablate_profile():
    nif = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0625
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    index = store.load_npz(os.path.join(CACHE, "bench"))
    cfg = GenoConfig(batch_reads=B, max_read_len=128, max_kmers_per_read=4,
                     neighbor_item_frac=nif,
                     pallas_vote=bool(os.environ.get("PALLAS")))
    dix = build_device_index(index)
    batches = list(iter_read_batches(os.path.join(CACHE, "reads.fq"),
                                     cfg.batch_reads, cfg.max_read_len,
                                     cfg.max_kmers_per_read))
    b = batches[0]
    codes = jnp.asarray(b.codes); nk = jnp.asarray(b.n_kmers); qual = jnp.asarray(b.qual)
    n = dix.n_sites
    for mode in ("probes", "no_vote", "no_pileup", ""):
        step = make_batch_processor(dix, cfg, _ablate=mode)
        def run(codes, nk, qual):
            rc = jnp.zeros(n + 1, jnp.int32); ac = jnp.zeros(n + 1, jnp.int32)
            return step(codes, nk, qual, rc, ac)[0]
        dt = timeit(run, codes, nk, qual, n=3)
        print(f"ablate={mode or 'full':10s} {dt*1e3:9.1f} ms  {B/dt:9.0f} reads/s")

if __name__ == "__main__":
    if os.environ.get("ABLATE"):
        ablate_profile()
    else:
        main()
