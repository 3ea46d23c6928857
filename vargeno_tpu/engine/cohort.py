"""Multi-sample cohort genotyping: N donors against one replicated index.

No reference equivalent (the reference genotypes one FASTQ per run); this is
the BASELINE.json "multi-sample cohort" configuration: the index and engine
are built once, each sample streams through the same compiled step with its
own pileup accumulators, and per-sample VCFs are written at the end.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, GenoConfig
from ..finalize import finalize_calls
from ..index import store
from ..io.fastq import iter_read_batches
from ..io.vcf_writer import write_calls_vcf
from .batch import make_batch_processor
from .device_index import build_device_index


class CohortRunner:
    def __init__(self, index: store.VarGenoIndex,
                 sample_names: Sequence[str],
                 config: GenoConfig = DEFAULT_CONFIG):
        self.index = index
        self.config = config
        self.dix = build_device_index(index)
        self.step = make_batch_processor(self.dix, config)
        n = self.dix.n_sites
        self.counts = {
            name: (jnp.zeros(n + 1, jnp.int32), jnp.zeros(n + 1, jnp.int32))
            for name in sample_names
        }
        self.stats: Dict[str, dict] = {name: {} for name in sample_names}

    def consume_sample(self, name: str, fastq_path: str,
                       limit_batches: Optional[int] = None) -> None:
        cfg = self.config
        rc, ac = self.counts[name]
        nb = 0
        for batch in iter_read_batches(fastq_path, cfg.batch_reads,
                                       cfg.max_read_len,
                                       cfg.max_kmers_per_read):
            rc, ac, stats = self.step(
                jnp.asarray(batch.codes), jnp.asarray(batch.n_kmers),
                jnp.asarray(batch.qual), rc, ac)
            st = self.stats[name]
            for k, v in stats.items():
                st[k] = st.get(k, 0) + int(v)
            nb += 1
            if limit_batches and nb >= limit_batches:
                break
        self.counts[name] = (rc, ac)

    def sample_calls(self, name: str):
        s = self.index.sites
        n = s.pos.shape[0]
        rc, ac = self.counts[name]
        ref = np.minimum(np.asarray(rc)[:n], self.config.max_cov)
        alt = np.minimum(np.asarray(ac)[:n], self.config.max_cov)
        return finalize_calls(self.index.chrlens, s.pos, s.ref, s.alt,
                              s.rf, s.af, ref, alt, self.config)

    def write_vcfs(self, vcf_in: str, out_pattern: str) -> List[str]:
        """out_pattern must contain '{sample}'."""
        outs = []
        for name in self.counts:
            out = out_pattern.format(sample=name)
            write_calls_vcf(vcf_in, out, self.sample_calls(name))
            outs.append(out)
        return outs
