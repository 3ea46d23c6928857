"""Multi-chip execution: data-parallel read streaming over a device mesh.

The reference is strictly single-threaded (SURVEY.md §2.4); all parallelism
here is new, TPU-native design:

- Reads are the data axis: each device processes ``batch_reads`` reads per
  step (global batch = D * batch_reads), with the index replicated.
- Pileup counts are a per-device accumulator (a leading device axis), so the
  inner loop is collective-free; counts are merged with one ``psum``-style
  reduction at the END of the stream, not per batch -- per-SNP counts are
  order-independent saturating sums, so late merging is exact.
- The merge + genotype-calling step runs jitted over the same mesh.

A second configuration (sharded-dictionary mode for indexes that exceed
one chip's HBM: hi-bit dictionary partition + all_to_all k-mer routing) is
in dist.sharded_dict.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GenoConfig
from ..engine.batch import make_batch_processor
from ..engine.device_index import DeviceIndex, build_device_index
from ..index.store import VarGenoIndex


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


class ShardedGenoRunner:
    """Data-parallel geno over a mesh. Host feeds global batches of
    D * batch_reads reads; device d handles reads [d*B, (d+1)*B)."""

    def __init__(self, index: VarGenoIndex, mesh: Mesh,
                 config: GenoConfig):
        self.config = config
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.D = mesh.devices.size
        self.index = index
        dix = build_device_index(index)
        # replicate the index across the mesh
        repl = NamedSharding(mesh, P())
        self.dix = jax.tree.map(
            lambda a: jax.device_put(a, repl)
            if isinstance(a, jax.Array) else a, dix)
        proc = make_batch_processor(dix, config)
        raw_enc = proc.raw_enc
        n = dix.n_sites
        self.n_sites = n

        data = P(self.axis)
        none = P()

        @partial(jax.jit, donate_argnums=(7, 8),
                 static_argnames=())
        def sharded_step(dix_t, hi, lo, kv, rok, n_kmers, qual,
                         ref_cnt_d, alt_cnt_d):
            def local(dix_l, hi_l, lo_l, kv_l, rok_l, nk_l, q_l, rc_l,
                      ac_l):
                rc, ac, stats = raw_enc(dix_l, hi_l, lo_l, kv_l, rok_l,
                                        nk_l, q_l, rc_l[0], ac_l[0])
                stats = {k: jax.lax.psum(v, self.axis)
                         for k, v in stats.items()}
                return rc[None], ac[None], stats

            return jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(none, data, data, data, data, data, data, data,
                          data),
                out_specs=(data, data, none),
                check_vma=False,
            )(dix_t, hi, lo, kv, rok, n_kmers, qual, ref_cnt_d, alt_cnt_d)

        self._step = sharded_step

        @jax.jit
        def merge(ref_cnt_d, alt_cnt_d):
            return (jnp.sum(ref_cnt_d, axis=0), jnp.sum(alt_cnt_d, axis=0))

        self._merge = merge

        self.ref_cnt_d = jax.device_put(
            jnp.zeros((self.D, n + 1), jnp.int32), NamedSharding(mesh, data))
        self.alt_cnt_d = jax.device_put(
            jnp.zeros((self.D, n + 1), jnp.int32), NamedSharding(mesh, data))
        self.stats_totals: dict = {}
        self.n_reads = 0
        self._shardings = dict(
            codes=NamedSharding(mesh, data),
            none=repl,
        )

    def global_batch(self) -> int:
        return self.D * self.config.batch_reads

    def _bump(self, stats):
        # one packed transfer for all stat scalars (not one RTT each)
        keys = sorted(stats)
        vals = np.asarray(jnp.stack([jnp.asarray(stats[k], jnp.int32)
                                     for k in keys])).tolist()
        for k, v in zip(keys, vals):
            self.stats_totals[k] = self.stats_totals.get(k, 0) + int(v)

    def consume_fastq(self, fastq_path: str,
                      limit_batches: Optional[int] = None) -> None:
        from ..io.fastq import iter_read_batches, prefetch

        cfg = self.config
        K = cfg.max_kmers_per_read
        nb = 0
        shard = self._shardings["codes"]

        def encoded_batches():
            """Host-side pre-encode on the prefetch thread: the mesh ships
            packed kmer words (~3.6x less than base codes per device)."""
            from .. import native
            from ..core.kmer import np_encode_batch

            enc = (native.encode_batch if native.available()
                   else lambda c, k, K_: np_encode_batch(c, k, K_))
            for batch in iter_read_batches(
                    fastq_path, self.global_batch(), cfg.max_read_len, K):
                hi, lo, kv, rok = enc(batch.codes, batch.n_kmers, K)
                yield hi, lo, kv, rok, batch.n_kmers, batch.qual, \
                    batch.n_valid

        pending = None   # one-behind stats sync keeps the host feeding
        for hi, lo, kv, rok, nk, qual, n_valid in prefetch(
                encoded_batches()):
            args = [jax.device_put(a, shard)
                    for a in (hi, lo, kv, rok, nk, qual)]
            self.ref_cnt_d, self.alt_cnt_d, stats = self._step(
                self.dix, *args, self.ref_cnt_d, self.alt_cnt_d)
            self.n_reads += n_valid
            if pending is not None:
                self._bump(pending)
            pending = stats
            nb += 1
            if limit_batches and nb >= limit_batches:
                break
        if pending is not None:
            self._bump(pending)

    def calls(self):
        from ..finalize import finalize_calls

        ref_cnt, alt_cnt = self._merge(self.ref_cnt_d, self.alt_cnt_d)
        s = self.index.sites
        n = s.pos.shape[0]
        ref = np.minimum(np.asarray(ref_cnt)[:n], self.config.max_cov)
        alt = np.minimum(np.asarray(alt_cnt)[:n], self.config.max_cov)
        return finalize_calls(self.index.chrlens, s.pos, s.ref, s.alt,
                              s.rf, s.af, ref, alt, self.config)

    def write_vcf(self, vcf_in: str, vcf_out: str) -> None:
        from ..io.vcf_writer import write_calls_vcf

        write_calls_vcf(vcf_in, vcf_out, self.calls())
