"""End-to-end `geno` driver: FASTQ stream -> batched engine -> output VCF.

The TPU-native counterpart of the reference's genotype() (src/qv.cc:475-1787):
loads the index, streams fixed-shape read batches to the device, accumulates
per-site pileup counts on device, then calls genotypes (float64 host math for
bit-parity with the reference's double model) and rewrites the VCF.
"""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import GenoConfig, DEFAULT_CONFIG
from ..finalize import finalize_calls
from ..index import store
from ..io.fastq import iter_read_batches
from ..io.vcf_writer import write_calls_vcf
from .batch import make_batch_processor
from .device_index import build_device_index


class GenoRunner:
    def __init__(self, index: store.VarGenoIndex,
                 config: GenoConfig = DEFAULT_CONFIG):
        self.index = index
        self.config = config
        self.dix = build_device_index(index)
        self.step = make_batch_processor(self.dix, config)
        n = self.dix.n_sites
        self.ref_cnt = jnp.zeros(n + 1, jnp.int32)
        self.alt_cnt = jnp.zeros(n + 1, jnp.int32)
        self.stats_totals: dict = {}
        self.n_reads = 0

    def consume_fastq(self, fastq_path: str,
                      limit_batches: Optional[int] = None,
                      checkpoint_path: Optional[str] = None,
                      checkpoint_every: int = 64) -> None:
        cfg = self.config
        nb = 0
        skip = 0
        if checkpoint_path:
            from . import checkpoint as ckpt

            state = ckpt.load(checkpoint_path)
            if state is not None:
                rc, ac, meta = state
                self.ref_cnt = jnp.asarray(rc)
                self.alt_cnt = jnp.asarray(ac)
                skip = meta["n_reads"]
                self.n_reads = skip
        for batch in iter_read_batches(fastq_path, cfg.batch_reads,
                                       cfg.max_read_len,
                                       cfg.max_kmers_per_read,
                                       skip_reads=skip):
            self.ref_cnt, self.alt_cnt, stats = self.step(
                jnp.asarray(batch.codes), jnp.asarray(batch.n_kmers),
                jnp.asarray(batch.qual), self.ref_cnt, self.alt_cnt)
            self.n_reads += batch.n_valid
            for k, v in stats.items():
                self.stats_totals[k] = self.stats_totals.get(k, 0) + int(v)
            nb += 1
            if checkpoint_path and nb % checkpoint_every == 0:
                from . import checkpoint as ckpt

                ckpt.save(checkpoint_path, self.ref_cnt, self.alt_cnt,
                          self.n_reads)
            if limit_batches and nb >= limit_batches:
                break
        if checkpoint_path:
            from . import checkpoint as ckpt

            ckpt.save(checkpoint_path, self.ref_cnt, self.alt_cnt,
                      self.n_reads)
        overflow = {k: v for k, v in self.stats_totals.items()
                    if "overflow" in k and v}
        if overflow:
            import warnings
            warnings.warn(f"engine capacity overflows (results may diverge "
                          f"from reference): {overflow}")

    def calls(self):
        s = self.index.sites
        n = s.pos.shape[0]
        ref = np.minimum(np.asarray(self.ref_cnt)[:n], self.config.max_cov)
        alt = np.minimum(np.asarray(self.alt_cnt)[:n], self.config.max_cov)
        return finalize_calls(self.index.chrlens, s.pos, s.ref, s.alt,
                              s.rf, s.af, ref, alt, self.config)

    def write_vcf(self, vcf_in: str, vcf_out: str) -> None:
        write_calls_vcf(vcf_in, vcf_out, self.calls())


def run_geno(prefix: str, fastq_path: str, vcf_in: str, vcf_out: str,
             config: GenoConfig = DEFAULT_CONFIG) -> GenoRunner:
    t0 = time.time()
    index = store.load_npz(prefix)
    runner = GenoRunner(index, config)
    runner.consume_fastq(fastq_path)
    runner.write_vcf(vcf_in, vcf_out)
    print(f"Time: {time.time()-t0:.3f} sec "
          f"({runner.n_reads} reads, "
          f"{runner.stats_totals.get('n_processed', 0)} matched)")
    return runner
