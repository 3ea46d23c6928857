"""Multi-host execution: N processes over a pod slice via jax.distributed.

The reference is one thread in one process (SURVEY.md §2.4); BASELINE
targets data-parallel streaming "across a multi-host TPU pod slice" with
>=85% scaling at N>=2 hosts. This module is that axis:

- ``initialize()`` brings up the process group (DCN coordination service);
  each process then addresses only its local chips.
- Each process reads ONLY ITS STRIPE of the FASTQ
  (io.fastq.iter_read_batches_strided): global batch g is file reads
  [g*GB, (g+1)*GB); process p parses rows [p*LB, (p+1)*LB) of it and skips
  the rest at newline-count speed. Every stripe yields the same number of
  batches with the same ``global_n_valid``, so the N host loops stay
  collectively aligned with zero host-level communication.
- Global device arrays are assembled with
  ``jax.make_array_from_process_local_data``; the compiled step is the
  SAME shard_map program as single-process mesh mode, so collectives ride
  ICI within a host and DCN across hosts exactly as the mesh lays them
  out. Per-SNP counts stay per-device and merge once at the end
  (order-independent sums -- late merge is exact, SURVEY §2.4).
- Batch stats are replicated across processes inside the step (one tiny
  all_gather, dist.sharding._MeshProc) so every process sees identical
  overflow counters and takes identical escalation-and-rerun decisions --
  the fault-tolerance path needs no extra coordination.
- Orientation handling is the INLINE dual step (forward + reverse in one
  dispatch, src/qv.cc:1504-1510 semantics): counts are bit-identical to
  the queued-retry mode, and the host loop becomes a pure function of the
  read stream -- the property that keeps N processes in lockstep without
  negotiating retry-queue flushes over DCN.

Checkpoints hold the MERGED (n_sites+1,) counts plus the global read
count, so a run may be resumed on a different host count (or a single
host) and vice versa.

Local validation without hardware: N processes x K virtual CPU devices on
one machine (``initialize(..., cpu_devices=K)``), collectives via Gloo --
see tests/test_multihost.py.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np

from ..config import GenoConfig
from ..index.store import VarGenoIndex


def initialize(coordinator: str, num_processes: int, process_id: int,
               cpu_devices: int = 0) -> None:
    """Join the process group. MUST run before any other jax use in the
    process. ``cpu_devices > 0`` forces a virtual CPU host with that many
    devices (local multi-process testing; collectives go through Gloo)."""
    import os

    if cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cpu_devices}")
    import jax

    if cpu_devices:
        # the axon TPU plugin ignores JAX_PLATFORMS; the config API wins
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def barrier(name: str = "vgt") -> None:
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


class _MultiHostMixin:
    """Overrides that turn a single-process mesh runner into a
    multi-process one. Mix in FRONT of ShardedGenoRunner /
    ShardedDictGenoRunner."""

    _stats_replicated = True   # see dist.sharding._MeshProc

    def __init__(self, index: VarGenoIndex, mesh, config: GenoConfig,
                 **kw):
        import jax

        self._pid = jax.process_index()
        self._n_procs = jax.process_count()
        # the inline dual-orientation step keeps the N host loops in
        # lockstep (no retry-queue negotiation); results are identical
        kw["queued_orientation"] = False
        super().__init__(index, mesh, config, **kw)
        if self.D % self._n_procs:
            raise ValueError(
                f"mesh of {self.D} devices is not divisible by "
                f"{self._n_procs} processes")

    # --- device placement: local stripe -> global array ---

    @property
    def _local_D(self) -> int:
        return self.D // self._n_procs

    def _put_data(self, a):
        import jax

        a = np.asarray(a)
        return jax.make_array_from_process_local_data(self._data_sh, a)

    def _put_gdata(self, a):
        import jax

        a = np.asarray(a)
        return jax.make_array_from_process_local_data(self._gdata_sh, a)

    def _put_repl(self, a):
        import jax

        a = np.asarray(a)
        return jax.make_array_from_process_local_data(self._repl_sh, a,
                                                      a.shape)

    def _put_dstack(self, a):
        """Full (D, ...) stack -> sharded rows; ship only the local
        slice. (Each process still BUILDS the full stack on host --
        acceptable for index partitioning; the device memory is what
        sharding is for.)"""
        import jax

        a = np.asarray(a)
        lo = self._pid * self._local_D
        return jax.make_array_from_process_local_data(
            self._data_sh, np.ascontiguousarray(a[lo:lo + self._local_D]),
            a.shape)

    # --- count merge / checkpoint (collective on every process) ---

    def merge_counts(self):
        import jax

        if not hasattr(self, "_merge_repl"):
            self._merge_repl = jax.jit(
                lambda r, a: (r.sum(0), a.sum(0)),
                out_shardings=(self._repl_sh, self._repl_sh))
        return self._merge_repl(self.ref_cnt, self.alt_cnt)

    def _host_counts(self):
        rc, ac = self.merge_counts()
        # fully-replicated global arrays are host-readable on any process
        return np.asarray(rc), np.asarray(ac)

    def _restore_ckpt(self, rc, ac) -> None:
        rc = np.asarray(rc)
        ac = np.asarray(ac)
        if rc.ndim == 2:
            rc, ac = rc.sum(axis=0), ac.sum(axis=0)
        n = self.dix.n_sites
        lr = np.zeros((self._local_D, n + 1), np.int32)
        la = np.zeros((self._local_D, n + 1), np.int32)
        if self._pid == 0:   # merged totals live in global device row 0
            lr[0] = rc
            la[0] = ac
        self.ref_cnt = self._put_data(lr)
        self.alt_cnt = self._put_data(la)

    def _ckpt_save(self, path: str) -> None:
        """Merged counts are identical on every process; only process 0
        writes (a shared FS would race, per-host FSes just duplicate)."""
        from ..engine import checkpoint as ckpt

        arrays = self._ckpt_arrays()   # collective: all processes run it
        if self._pid == 0:
            ckpt.save(path, *arrays, self.n_reads)
        barrier("ckpt")

    # --- the multi-host host loop ---

    def consume_fastq(self, fastq_path: str,
                      limit_batches: Optional[int] = None,
                      checkpoint_path: Optional[str] = None,
                      checkpoint_every: int = 64) -> None:
        from ..io.fastq import iter_read_batches_strided, prefetch

        cfg = self.config
        LB = cfg.batch_reads * self._local_D
        skip = 0
        if checkpoint_path:
            from ..engine import checkpoint as ckpt

            state = ckpt.load(checkpoint_path)
            if state is not None:
                rc, ac, meta = state
                self._restore_ckpt(rc, ac)
                skip = meta["n_reads"]
                self.n_reads = skip
        inflight: deque = deque()
        depth = max(1, cfg.pipeline_depth)
        nb = 0
        for batch in prefetch(iter_read_batches_strided(
                fastq_path, LB, self._n_procs, self._pid,
                cfg.max_read_len, cfg.max_kmers_per_read,
                skip_reads=skip)):
            p = self._dispatch_batch(batch.codes, batch.n_kmers,
                                     batch.qual, single=False)
            self.n_reads += batch.global_n_valid
            p["count"] = batch.global_n_valid
            inflight.append(p)
            nb += 1
            while len(inflight) > depth:
                q = inflight.popleft()
                self._finalize_batch(q)
                self.meter.bump(q["count"])
            if checkpoint_path and nb % checkpoint_every == 0:
                while inflight:
                    q = inflight.popleft()
                    self._finalize_batch(q)
                    self.meter.bump(q["count"])
                self._ckpt_save(checkpoint_path)
            if limit_batches and nb >= limit_batches:
                break
        while inflight:
            q = inflight.popleft()
            self._finalize_batch(q)
            self.meter.bump(q["count"])
        if checkpoint_path:
            self._ckpt_save(checkpoint_path)
        overflow = {k: v for k, v in self.stats_totals.items()
                    if "overflow" in k and v}
        if overflow:
            import warnings

            warnings.warn(f"engine capacity overflows (results may "
                          f"diverge from reference): {overflow}")

    def write_vcf(self, vcf_in: str, vcf_out: str) -> None:
        calls = self.calls()   # collective (_host_counts) on all processes
        if self._pid == 0:
            from ..io.vcf_writer import write_calls_vcf

            write_calls_vcf(vcf_in, vcf_out, calls)
        barrier("vcf")


from .sharded_dict import ShardedDictGenoRunner  # noqa: E402
from .sharding import ShardedGenoRunner  # noqa: E402


class MultiHostGenoRunner(_MultiHostMixin, ShardedGenoRunner):
    """Data-parallel (replicated index) geno across processes."""


class MultiHostDictGenoRunner(_MultiHostMixin, ShardedDictGenoRunner):
    """Sharded-dictionary (all_to_all routed) geno across processes: dict
    shards span the GLOBAL device set, so N hosts hold indexes N times
    larger than one host's HBM; probe routing rides ICI within a host and
    DCN across."""
