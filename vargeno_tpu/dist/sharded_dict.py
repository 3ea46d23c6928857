"""Sharded-dictionary mode: hi-bit partitioned index + all_to_all routing.

For indexes that exceed a single chip's HBM (whole-genome: ~3G ref k-mers),
the sorted dictionaries are range-partitioned across the mesh:

- the ref dictionary into D contiguous row ranges with boundaries snapped to
  hi32 jumpgate-block starts (a block never straddles shards), plus a
  stride-window tail of the following rows so the reference's small-block
  scan stride bug (qv.cc:359: reads up to 9*(S-1) rows past the block) reads
  the exact same cells it would in the unsharded layout;
- the snp dictionary likewise with hi24-snapped boundaries (11*(S-1) tail);
- aux tables, Bloom filters and site tensors replicate (they are orders of
  magnitude smaller).

Reads stay data-parallel on the same axis: every device streams its own
shard of the batch and resolves each dictionary probe by routing the query
k-mer to the owner shard with all_to_all, which answers with materialized
row fields. Capacity per (src, dst) lane is provisioned at ~2.2x the uniform
share (hi bits of genomic k-mers are near-uniform); truncation is counted in
the overflow stats like every other fixed-shape cap.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GenoConfig
from ..engine.backend import LocalBackend, ScanResult
from ..engine.batch import make_batch_processor
from ..engine.device_index import DeviceIndex, build_device_index
from ..index.store import VarGenoIndex
from ..engine import search

U32 = jnp.uint32
I32 = jnp.int32

REF_TAIL = 9 * 99 + 1     # stride-bug read window beyond a block start
SNP_TAIL = 11 * 99 + 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardPlan:
    """Replicated routing metadata + per-device owned-row counts."""

    ref_bounds_hi: jax.Array    # (D,) u32: first hi32 owned by shard d
    snp_bounds_hi24: jax.Array  # (D,) u32
    ref_owned: jax.Array        # (D,) i32 rows owned (tail excluded)
    snp_owned: jax.Array        # (D,) i32


def _snap_boundaries(keys_hi: np.ndarray, D: int):
    """Row boundaries snapped down to block starts; returns (row_bounds D+1,
    first_hi_per_shard D)."""
    n = keys_hi.shape[0]
    rows = [0]
    for d in range(1, D):
        t = (n * d) // D
        if t >= n:
            rows.append(n)
            continue
        # snap to the first row of t's block
        hv = keys_hi[t]
        b = int(np.searchsorted(keys_hi, hv, side="left"))
        rows.append(max(b, rows[-1]))
    rows.append(n)
    firsts = []
    for d in range(D):
        if rows[d] < n:
            firsts.append(int(keys_hi[rows[d]]))
        else:
            firsts.append(0xFFFFFFFF)
    firsts[0] = 0  # shard 0 owns everything below the second boundary
    return rows, np.asarray(firsts, np.uint32)


def partition_device_index(index: VarGenoIndex, D: int):
    """Host-side plan: returns (stacked shard DeviceIndex arrays with a
    leading D axis, ShardPlan). Dict arrays are per-shard (owned + tail,
    padded to the max shard size); aux/BF/site arrays replicated."""
    base = build_device_index(index)  # host->device of full arrays; we reuse
    ref_hi = np.asarray(base.ref_hi)
    snp_hi = np.asarray(base.snp_hi)
    ref_rows, ref_firsts = _snap_boundaries(ref_hi, D)
    snp_rows, snp_firsts24 = _snap_boundaries(snp_hi >> 8, D)

    def shard_stack(arr, rows, tail):
        arr = np.asarray(arr)
        n = arr.shape[0]
        sizes = [min(rows[d + 1] + tail, n) - rows[d] for d in range(D)]
        m = max(sizes)
        out = np.zeros((D, m) + arr.shape[1:], arr.dtype)
        for d in range(D):
            seg = arr[rows[d]: min(rows[d + 1] + tail, n)]
            out[d, : seg.shape[0]] = seg
        return out

    ref_owned = np.asarray(
        [ref_rows[d + 1] - ref_rows[d] for d in range(D)], np.int32)
    snp_owned = np.asarray(
        [snp_rows[d + 1] - snp_rows[d] for d in range(D)], np.int32)

    stacked = dict(
        ref_hi=shard_stack(base.ref_hi, ref_rows, REF_TAIL),
        ref_lo=shard_stack(base.ref_lo, ref_rows, REF_TAIL),
        ref_pos=shard_stack(base.ref_pos, ref_rows, REF_TAIL),
        ref_flag=shard_stack(base.ref_flag, ref_rows, REF_TAIL),
        snp_hi=shard_stack(base.snp_hi, snp_rows, SNP_TAIL),
        snp_lo=shard_stack(base.snp_lo, snp_rows, SNP_TAIL),
        snp_pos=shard_stack(base.snp_pos, snp_rows, SNP_TAIL),
        snp_info=shard_stack(base.snp_info, snp_rows, SNP_TAIL),
        snp_flag=shard_stack(base.snp_flag, snp_rows, SNP_TAIL),
    )
    plan = ShardPlan(
        ref_bounds_hi=jnp.asarray(ref_firsts),
        snp_bounds_hi24=jnp.asarray(snp_firsts24),
        ref_owned=jnp.asarray(ref_owned),
        snp_owned=jnp.asarray(snp_owned))
    return base, stacked, plan


class RoutedBackend:
    """Backend answering probes via all_to_all routing to owner shards.

    Constructed inside shard_map: dict arrays are this device's shard
    (owned rows + stride tail); `my_owned` bounds the searchable range."""

    def __init__(self, dix_local: DeviceIndex, plan: ShardPlan, axis: str,
                 D: int, stride_bug: bool, block_size_threshold: int,
                 my_ref_owned, my_snp_owned, scan_slots: int = 16,
                 route_factor: float = 2.2):
        self.dix = dix_local
        self.plan = plan
        self.axis = axis
        self.D = D
        self.S = block_size_threshold
        self.scan_slots = scan_slots
        self.stride_bug = stride_bug
        self.my_ref_owned = my_ref_owned
        self.my_snp_owned = my_snp_owned
        self.route_factor = route_factor
        self.overflow = jnp.zeros((), I32)

    # ---- generic router ----

    def _route(self, owner, send_fields, answer_fn, ans_specs):
        """owner (N,) i32; send_fields tuple of (N,) arrays; answer_fn maps
        tuple of (M,) query arrays -> tuple of (M,) answers with dtypes
        ans_specs. Returns tuple of (N,) answers."""
        N = owner.shape[0]
        D = self.D
        Q = max(16, int(self.route_factor * N / D) + 1)
        order = jnp.argsort(owner, stable=True)
        so = owner[order]
        start = jnp.searchsorted(so, jnp.arange(D, dtype=owner.dtype))
        posg = jnp.arange(N, dtype=I32) - start[jnp.minimum(so, D - 1)]
        ok = posg < Q
        self.overflow = self.overflow + jnp.sum(~ok)
        slot_sorted = jnp.where(ok, posg, Q)
        # scatter queries into (D, Q(+1 dump))
        send = []
        for fld in send_fields:
            buf = jnp.zeros((D, Q + 1), fld.dtype)
            buf = buf.at[so, slot_sorted].set(fld[order], mode="drop")
            send.append(buf[:, :Q])
        recv = [jax.lax.all_to_all(b, self.axis, 0, 0, tiled=False)
                for b in send]
        # answer all received queries
        flat = [r.reshape(-1) for r in recv]
        answers = answer_fn(*flat)
        back = [jax.lax.all_to_all(a.reshape(D, Q), self.axis, 0, 0,
                                   tiled=False)
                for a in answers]
        # gather per original query
        out = []
        inv_slot = jnp.zeros(N, I32).at[order].set(slot_sorted)
        safe_slot = jnp.minimum(inv_slot, Q - 1)
        for a, spec in zip(back, ans_specs):
            v = a[owner, safe_slot]
            v = jnp.where(inv_slot < Q, v, jnp.zeros((), a.dtype))
            out.append(v)
        return tuple(out)

    def _ref_owner(self, q_hi):
        return (jnp.searchsorted(self.plan.ref_bounds_hi, q_hi,
                                 side="right") - 1).astype(I32)

    def _snp_owner(self, q_hi):
        return (jnp.searchsorted(self.plan.snp_bounds_hi24, q_hi >> 8,
                                 side="right") - 1).astype(I32)

    # ---- local answering (bounded by owned rows) ----

    def _local_exact(self, keys_hi, keys_lo, pos, flag, info, owned,
                     q_hi, q_lo):
        n_pad = keys_hi.shape[0]
        i = search.lower_bound(keys_hi, keys_lo, q_hi, q_lo)
        # lower_bound searches the padded array; restrict to owned rows
        i = jnp.minimum(i, jnp.maximum(owned - 1, 0))
        ic = jnp.minimum(i, n_pad - 1)
        hit = (keys_hi[ic] == q_hi) & (keys_lo[ic] == q_lo) & (i < owned)
        p = jnp.take(pos, ic, axis=0, mode="clip")
        f = jnp.take(flag, ic, axis=0, mode="clip")
        if info is None:
            return hit, p, f
        return hit, p, f, jnp.take(info, ic, axis=0, mode="clip")

    # careful: lower_bound over the padded array can land in the tail
    # region for queries beyond my range; those are clamped and fail the
    # equality check or the i < owned check, so they answer no-hit -- the
    # true owner answers them.

    def exact_ref(self, q_hi, q_lo):
        shp = q_hi.shape
        d = self.dix
        hit, pos, flag = self._route(
            self._ref_owner(q_hi.reshape(-1)),
            (q_hi.reshape(-1), q_lo.reshape(-1)),
            lambda qh, ql: self._pack_exact_ref(qh, ql),
            (bool, U32, jnp.uint8))
        return hit.reshape(shp), pos.reshape(shp), flag.reshape(shp)

    def _pack_exact_ref(self, qh, ql):
        d = self.dix
        hit, pos, flag = self._local_exact(
            d.ref_hi, d.ref_lo, d.ref_pos, d.ref_flag, None,
            self.my_ref_owned, qh, ql)
        return hit, pos, flag

    def exact_snp(self, q_hi, q_lo):
        shp = q_hi.shape
        hit, pos, flag, info = self._route(
            self._snp_owner(q_hi.reshape(-1)),
            (q_hi.reshape(-1), q_lo.reshape(-1)),
            lambda qh, ql: self._pack_exact_snp(qh, ql),
            (bool, U32, jnp.uint8, jnp.uint8))
        return (hit.reshape(shp), pos.reshape(shp), info.reshape(shp),
                flag.reshape(shp))

    def _pack_exact_snp(self, qh, ql):
        d = self.dix
        hit, pos, flag, info = self._local_exact(
            d.snp_hi, d.snp_lo, d.snp_pos, d.snp_flag, d.snp_info,
            self.my_snp_owned, qh, ql)
        return hit, pos, flag, info

    def ref_block_size(self, q_hi):
        shp = q_hi.shape
        (bs,) = self._route(
            self._ref_owner(q_hi.reshape(-1)),
            (q_hi.reshape(-1),),
            lambda qh: (self._local_block_size(qh),),
            (I32,))
        return bs.reshape(shp)

    def _local_block_size(self, qh):
        d = self.dix
        zeros = jnp.zeros_like(qh)
        start = search.lower_bound(d.ref_hi, d.ref_lo, qh, zeros)
        end = search.lower_bound(d.ref_hi, d.ref_lo, qh + U32(1), zeros)
        end = jnp.where(qh == U32(0xFFFFFFFF), self.my_ref_owned, end)
        start = jnp.minimum(start, self.my_ref_owned)
        end = jnp.minimum(end, self.my_ref_owned)
        return (end - start).astype(I32)

    # ---- routed block scans (compacted to scan_slots per item) ----

    def _scan_compact(self, local: LocalBackend, is_ref: bool, qh, ql, act):
        res = (local.ref_scan(qh, ql, act) if is_ref
               else local.snp_scan(qh, ql, act))
        R = self.scan_slots
        M = qh.shape[0]
        tgt = jnp.cumsum(res.hit.astype(I32), axis=1) - 1
        keep = res.hit & (tgt < R)
        ovf = jnp.sum(res.hit) - jnp.sum(keep) + res.overflow
        rows = jnp.arange(M)[:, None]
        scat = jnp.where(keep, tgt, R)

        def cp(a, fill):
            out = jnp.full((M, R + 1), fill, a.dtype)
            out = out.at[rows, scat].set(a, mode="drop")
            return out[:, :R]

        return (cp(keep, False), cp(res.pos, U32(0)),
                cp(res.flag, jnp.uint8(0)), cp(res.info, jnp.uint8(0)),
                cp(res.nb_hi, U32(0)), cp(res.nb_lo, U32(0)),
                cp(res.diff, 0), ovf)

    def _routed_scan(self, is_ref: bool, q_hi, q_lo, active) -> ScanResult:
        R = self.scan_slots
        NI = q_hi.shape[0]
        owner = (self._ref_owner(q_hi) if is_ref
                 else self._snp_owner(q_hi))
        ovf_box = [jnp.zeros((), I32)]

        def answer(qh, ql, act):
            local = _ShardLocal(self.dix, self.stride_bug, self.S,
                                self.my_ref_owned, self.my_snp_owned,
                                self.scan_slots)
            hit, pos, flag, info, nbhi, nblo, diff, ovf = \
                self._scan_compact(local, is_ref, qh, ql, act)
            ovf_box[0] = ovf_box[0] + ovf
            # flatten slot axis into per-query packed columns
            return (hit.reshape(-1, R).reshape(qh.shape[0] * R),) + tuple(
                a.reshape(qh.shape[0] * R)
                for a in (pos, flag, info, nbhi, nblo, diff))

        # route with R answer slots per query: replicate queries per slot is
        # wasteful; instead route once and return R-wide answers by treating
        # each answer field as (M*R,) reshaped -- the router works on (M,)
        # lanes, so we pack R values per query into R separate routed fields.
        fields = []
        # Simpler: answer each of the R slots as its own routed field set.
        # Overhead is fine for small R.
        outs = self._route_multi(owner, (q_hi, q_lo, active), answer, R)
        hit, pos, flag, info, nbhi, nblo, diff = outs
        psum_ovf = jax.lax.psum(ovf_box[0], self.axis)
        return ScanResult(hit=hit, pos=pos, flag=flag, info=info,
                          nb_hi=nbhi, nb_lo=nblo, diff=diff,
                          overflow=psum_ovf)

    def _route_multi(self, owner, send_fields, answer_fn, R):
        """Like _route but the answer has R slots per query: answers are
        (M*R,) arrays laid out query-major."""
        N = owner.shape[0]
        D = self.D
        Q = max(16, int(self.route_factor * N / D) + 1)
        order = jnp.argsort(owner, stable=True)
        so = owner[order]
        start = jnp.searchsorted(so, jnp.arange(D, dtype=owner.dtype))
        posg = jnp.arange(N, dtype=I32) - start[jnp.minimum(so, D - 1)]
        ok = posg < Q
        self.overflow = self.overflow + jnp.sum(~ok)
        slot_sorted = jnp.where(ok, posg, Q)
        send = []
        for fld in send_fields:
            buf = jnp.zeros((D, Q + 1), fld.dtype)
            buf = buf.at[so, slot_sorted].set(fld[order], mode="drop")
            send.append(buf[:, :Q])
        recv = [jax.lax.all_to_all(b, self.axis, 0, 0) for b in send]
        flat = [r.reshape(-1) for r in recv]
        answers = answer_fn(*flat)          # tuple of (D*Q*R,)
        back = []
        for a in answers:
            b = jax.lax.all_to_all(a.reshape(D, Q * R), self.axis, 0, 0)
            back.append(b.reshape(D, Q, R))
        inv_slot = jnp.zeros(N, I32).at[order].set(slot_sorted)
        safe_slot = jnp.minimum(inv_slot, Q - 1)
        outs = []
        for a in back:
            v = a[owner, safe_slot]          # (N, R)
            v = jnp.where((inv_slot < Q)[:, None], v,
                          jnp.zeros((), a.dtype))
            outs.append(v)
        return tuple(outs)

    def ref_scan(self, q_hi, q_lo, active) -> ScanResult:
        return self._routed_scan(True, q_hi, q_lo, active)

    def snp_scan(self, q_hi, q_lo, active) -> ScanResult:
        return self._routed_scan(False, q_hi, q_lo, active)


class _ShardLocal(LocalBackend):
    """LocalBackend over a shard: searches bounded to owned rows, stride
    test reads allowed into the tail (mirroring the unsharded layout)."""

    def __init__(self, dix, stride_bug, S, ref_owned, snp_owned, scan_slots):
        super().__init__(dix, stride_bug, S)
        self.scan_slots = S  # full block scan width before compaction
        self.ref_owned = ref_owned
        self.snp_owned = snp_owned

    def ref_scan(self, q_hi, q_lo, active):
        res = super().ref_scan(q_hi, q_lo, active)
        # restrict block bounds to owned rows
        d = self.dix
        zeros = jnp.zeros_like(q_hi)
        blo = search.lower_bound(d.ref_hi, d.ref_lo, q_hi, zeros)
        in_owned = blo < self.ref_owned
        return ScanResult(hit=res.hit & in_owned[:, None], pos=res.pos,
                          flag=res.flag, info=res.info, nb_hi=res.nb_hi,
                          nb_lo=res.nb_lo, diff=res.diff,
                          overflow=res.overflow)

    def snp_scan(self, q_hi, q_lo, active):
        res = super().snp_scan(q_hi, q_lo, active)
        d = self.dix
        zeros = jnp.zeros_like(q_hi)
        slo = search.lower_bound(d.snp_hi, d.snp_lo,
                                 (q_hi >> 8) << 8, zeros)
        in_owned = slo < self.snp_owned
        return ScanResult(hit=res.hit & in_owned[:, None], pos=res.pos,
                          flag=res.flag, info=res.info, nb_hi=res.nb_hi,
                          nb_lo=res.nb_lo, diff=res.diff,
                          overflow=res.overflow)
