"""Sharded-dictionary mode: hi-bit partitioned index + all_to_all routing.

For indexes that exceed a single chip's HBM (whole-genome: ~3G ref k-mers),
the sorted dictionaries are range-partitioned across the mesh:

- the ref dictionary into D contiguous row ranges with boundaries snapped to
  hi32 jumpgate-block starts (a block never straddles shards), plus a
  stride-window tail of the following rows so the reference's small-block
  scan stride bug (qv.cc:359: reads up to 9*(S-1) rows past a block start)
  reads the exact same cells as the unsharded layout;
- the snp dictionary likewise with hi24-snapped boundaries (11*(S-1) tail);
- aux tables, Bloom filters and site tensors replicate (orders of magnitude
  smaller).

Reads stay data-parallel on the same axis: each device streams its own
shard of the global batch and resolves every dictionary probe by routing the
query k-mer to the owner shard with all_to_all; owners answer with
materialized row fields. Per-(src,dst) lane capacity is ~2.2x the uniform
share (genomic k-mer hi bits are near-uniform); truncation feeds the
route_overflow stat.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GenoConfig
from ..engine import search
from ..engine.backend import LocalBackend, ScanResult
from ..engine.device_index import DeviceIndex, build_device_index
from ..index.store import VarGenoIndex
from .sharding import ShardedGenoRunner

U32 = jnp.uint32
I32 = jnp.int32

REF_TAIL = 9 * 99 + 1     # stride-bug read window beyond a block start
SNP_TAIL = 11 * 99 + 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardPlan:
    ref_bounds_hi: jax.Array    # (D,) u32: first hi32 owned by shard d
    snp_bounds_hi24: jax.Array  # (D,) u32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedIndexArg:
    """What the sharded step receives: the local shard's DeviceIndex view
    plus routing metadata. Attribute access falls through to the inner
    DeviceIndex so engine.batch can use it unchanged."""

    dix: DeviceIndex
    plan: ShardPlan
    my_ref_owned: jax.Array   # (1,) i32
    my_snp_owned: jax.Array   # (1,) i32
    my_ref_total: jax.Array   # (1,) i32 owned + real tail rows
    my_snp_total: jax.Array   # (1,) i32

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "dix"), name)


def _snap_boundaries(keys_hi: np.ndarray, D: int):
    n = keys_hi.shape[0]
    rows = [0]
    for d in range(1, D):
        t = (n * d) // D
        if t >= n:
            rows.append(n)
            continue
        hv = keys_hi[t]
        b = int(np.searchsorted(keys_hi, hv, side="left"))
        rows.append(max(b, rows[-1]))
    rows.append(n)
    firsts = []
    for d in range(D):
        firsts.append(int(keys_hi[rows[d]]) if rows[d] < n else 0xFFFFFFFF)
    firsts[0] = 0
    return rows, np.asarray(firsts, np.uint32)


def partition_index(index: VarGenoIndex, D: int):
    """Host plan. Returns (base DeviceIndex [for replicated fields], stacked
    per-shard arrays dict, plan, owned/total row counts)."""
    base = build_device_index(index, skip_tables=True, host_only=True)
    # trim the 32-row alignment padding: shards partition true rows only
    ref_hi = np.asarray(base.ref_hi)[:base.n_ref_rows]
    snp_hi = np.asarray(base.snp_hi)[:base.n_snp_rows]
    ref_rows, ref_firsts = _snap_boundaries(ref_hi, D)
    snp_rows, snp_firsts24 = _snap_boundaries(snp_hi >> 8, D)
    del ref_hi, snp_hi   # views pin the unsharded arrays freed below

    def shard_stack(arr, rows, tail, key_fill=None, true_n=None):
        arr = np.asarray(arr)
        n = arr.shape[0] if true_n is None else true_n
        sizes = [min(rows[d + 1] + tail, n) - rows[d] for d in range(D)]
        if max(sizes) >= (1 << 31):
            # per-shard row offsets are int32 on device (search/scan
            # indices); a >2^31-row shard cannot be represented. The
            # reference caps whole dictionaries at 2^32 rows
            # (src/qv.cc:523-526); sharded mode additionally needs
            # >= ceil(n / 2^31) devices.
            raise ValueError(
                f"shard of {max(sizes)} rows exceeds the 2^31-row "
                f"per-device limit; partition across more devices "
                f"(D={D} given, need >= {-(-n // (1 << 31))})")
        m = max(max(sizes), 1)
        fill = key_fill if key_fill is not None else 0
        out = np.full((D, m) + arr.shape[1:], fill, arr.dtype)
        for d in range(D):
            seg = arr[rows[d]: min(rows[d + 1] + tail, n)]
            out[d, : seg.shape[0]] = seg
        return out, np.asarray(sizes, np.int32)

    stacked = {}
    nr, ns = base.n_ref_rows, base.n_snp_rows

    def stack_and_free(field, rows, tail, true_n):
        """Stack one dict array, then drop the base's copy (at 3G rows the
        unsharded + stacked ref arrays together exceed host RAM)."""
        out = shard_stack(getattr(base, field), rows, tail, 0xFFFFFFFF,
                          true_n)
        setattr(base, field, np.zeros((1,) + out[0].shape[2:],
                                      out[0].dtype))
        return out

    stacked["ref_hi"], ref_tot = stack_and_free("ref_hi", ref_rows,
                                                REF_TAIL, nr)
    stacked["ref_lo"], _ = stack_and_free("ref_lo", ref_rows, REF_TAIL, nr)
    # meta pad rows read as [POS_AMBIGUOUS, flag=0xFF]: unambiguous-looking
    # pads are impossible (same defensive fill as the old pos/flag arrays)
    stacked["ref_meta"], _ = stack_and_free("ref_meta", ref_rows, REF_TAIL,
                                            nr)
    stacked["snp_hi"], snp_tot = stack_and_free("snp_hi", snp_rows,
                                                SNP_TAIL, ns)
    stacked["snp_lo"], _ = stack_and_free("snp_lo", snp_rows, SNP_TAIL, ns)
    stacked["snp_meta"], _ = stack_and_free("snp_meta", snp_rows, SNP_TAIL,
                                            ns)
    stacked["snp_test"], _ = stack_and_free("snp_test", snp_rows, SNP_TAIL,
                                            ns)

    plan = ShardPlan(ref_bounds_hi=jnp.asarray(ref_firsts),
                     snp_bounds_hi24=jnp.asarray(snp_firsts24))
    owned = dict(
        ref=np.asarray([ref_rows[d + 1] - ref_rows[d] for d in range(D)],
                       np.int32),
        snp=np.asarray([snp_rows[d + 1] - snp_rows[d] for d in range(D)],
                       np.int32))
    totals = dict(ref=ref_tot, snp=snp_tot)
    return base, stacked, plan, owned, totals


class _ShardLocal(LocalBackend):
    """Scan answering over one shard (owned rows + stride tail)."""

    def __init__(self, dix, stride_bug, S, ref_owned, snp_owned,
                 ref_total, snp_total):
        super().__init__(dix, stride_bug, S)
        self.ref_owned = ref_owned
        self.snp_owned = snp_owned
        self.ref_total = ref_total
        self.snp_total = snp_total

    def _ref_limit(self):
        return self.ref_total

    def _snp_limit(self):
        return self.snp_total

    def _ref_block_bounds(self, q_hi):
        d = self.dix
        zeros = jnp.zeros_like(q_hi)
        blo = search.lower_bound(d.ref_hi, d.ref_lo, q_hi, zeros)
        bhi = search.lower_bound(d.ref_hi, d.ref_lo, q_hi + U32(1), zeros)
        bhi = jnp.where(q_hi == U32(0xFFFFFFFF), self.ref_owned, bhi)
        blo_c = jnp.minimum(blo, self.ref_owned)
        bhi_c = jnp.minimum(bhi, self.ref_owned)
        return blo.astype(I32), (bhi_c - blo_c).astype(I32)

    def _snp_block_bounds(self, q_hi24):
        d = self.dix
        zeros = jnp.zeros_like(q_hi24)
        slo = search.lower_bound(d.snp_hi, d.snp_lo, q_hi24 << 8, zeros)
        shi = search.lower_bound(d.snp_hi, d.snp_lo,
                                 (q_hi24 + U32(1)) << 8, zeros)
        shi = jnp.where(q_hi24 == U32(0xFFFFFF), self.snp_owned, shi)
        slo_c = jnp.minimum(slo, self.snp_owned)
        shi_c = jnp.minimum(shi, self.snp_owned)
        return slo.astype(I32), (shi_c - slo_c).astype(I32)

    def ref_scan(self, q_hi, q_lo, active):
        res = super().ref_scan(q_hi, q_lo, active)
        d = self.dix
        zeros = jnp.zeros_like(q_hi)
        blo = search.lower_bound(d.ref_hi, d.ref_lo, q_hi, zeros)
        return dataclasses.replace(
            res, hit=res.hit & (blo < self.ref_owned)[:, None])

    def snp_scan(self, q_hi, q_lo, active):
        res = super().snp_scan(q_hi, q_lo, active)
        d = self.dix
        zeros = jnp.zeros_like(q_hi)
        slo = search.lower_bound(d.snp_hi, d.snp_lo, (q_hi >> 8) << 8,
                                 zeros)
        return dataclasses.replace(
            res, hit=res.hit & (slo < self.snp_owned)[:, None])


class RoutedBackend:
    """Answers probes by all_to_all routing to owner shards."""

    def __init__(self, arg: ShardedIndexArg, axis: str, D: int,
                 stride_bug: bool, block_size_threshold: int,
                 scan_slots: int = 16, route_factor: float = 2.2):
        self.arg = arg
        self.dix = arg.dix
        self.axis = axis
        self.D = D
        self.S = block_size_threshold
        self.stride_bug = stride_bug
        self.scan_slots = scan_slots
        self.route_factor = route_factor
        self.route_overflow = jnp.zeros((), I32)

    def _local(self) -> _ShardLocal:
        a = self.arg
        return _ShardLocal(a.dix, self.stride_bug, self.S,
                           a.my_ref_owned[0], a.my_snp_owned[0],
                           a.my_ref_total[0], a.my_snp_total[0])

    def _ref_owner(self, q_hi):
        return (jnp.searchsorted(self.arg.plan.ref_bounds_hi, q_hi,
                                 side="right") - 1).astype(I32)

    def _snp_owner(self, q_hi):
        return (jnp.searchsorted(self.arg.plan.snp_bounds_hi24, q_hi >> 8,
                                 side="right") - 1).astype(I32)

    def _route(self, owner, valid, send_fields, answer_fn, n_ans, R=1):
        """Route (N,)-shaped queries to owners; lanes with valid=False are
        sent nowhere (answers are zeros). Answers have R values per query
        laid out query-major. Returns tuple of (N, R) or (N,) arrays
        (squeezed when R==1) plus the count of DROPPED VALID queries.

        All send fields ride ONE packed (D, Q, F) all_to_all, and all
        answers ride ONE packed (D, Q*R, Fa) all_to_all back -- one
        collective per direction per stage instead of one per field (the
        narrow per-field u32 buffers wasted ICI latency, not bandwidth)."""
        N = owner.shape[0]
        D = self.D
        Q = max(16, -(-int(self.route_factor * N) // D))
        owner = jnp.where(valid, owner, D)  # invalid lanes -> dump bucket
        order = jnp.argsort(owner, stable=True)
        so = owner[order]
        start = jnp.searchsorted(so, jnp.arange(D + 1, dtype=owner.dtype))
        posg = jnp.arange(N, dtype=I32) - start[jnp.clip(so, 0, D)]
        ok = posg < Q
        slot_sorted = jnp.where(ok, posg, Q)

        def as_u32(f):
            if f.dtype == jnp.bool_:
                return f.astype(U32)
            if f.dtype == U32:
                return f
            return jax.lax.bitcast_convert_type(f.astype(I32), U32)

        def from_u32(v, dt):
            if dt == jnp.bool_:
                return v != 0
            if dt == U32:
                return v
            return jax.lax.bitcast_convert_type(v, I32).astype(dt)

        send_f = list(send_fields)
        sdts = [f.dtype for f in send_f]
        stacked = jnp.stack([as_u32(f) for f in send_f], axis=-1)  # (N, F)
        buf = jnp.zeros((D, Q + 1, len(send_f)), U32)
        buf = buf.at[so, slot_sorted].set(stacked[order], mode="drop")
        recv = jax.lax.all_to_all(buf[:, :Q], self.axis, 0, 0)  # (D, Q, F)
        rflat = recv.reshape(D * Q, len(send_f))

        answers = answer_fn(*[from_u32(rflat[:, i], dt)
                              for i, dt in enumerate(sdts)])
        adts = [a.dtype for a in answers]
        ans_rows = jnp.stack([as_u32(a) for a in answers], axis=-1)
        back = jax.lax.all_to_all(
            ans_rows.reshape(D, Q * R, len(answers)), self.axis, 0, 0)
        back = back.reshape(D, Q, R, len(answers))

        inv_slot = jnp.zeros(N, I32).at[order].set(slot_sorted)
        safe = jnp.minimum(inv_slot, Q - 1)
        got = valid & (inv_slot < Q)
        safe_owner = jnp.clip(owner, 0, D - 1)
        rows = back[safe_owner, safe]                    # (N, R, Fa)
        outs = []
        for i, dt in enumerate(adts):
            v = jnp.where(got[:, None], rows[..., i], U32(0))
            v = from_u32(v, dt)
            outs.append(v[:, 0] if R == 1 else v)
        route_ovf = jnp.sum(~ok & (so <= D - 1))
        self.route_overflow = self.route_overflow + route_ovf
        return tuple(outs), route_ovf

    # --- exact queries ---

    def _local_exact(self, keys_hi, keys_lo, meta, with_info, owned,
                     q_hi, q_lo):
        i = search.lower_bound(keys_hi, keys_lo, q_hi, q_lo)
        n_pad = keys_hi.shape[0]
        ic = jnp.minimum(i, n_pad - 1)
        hit = (keys_hi[ic] == q_hi) & (keys_lo[ic] == q_lo) & (i < owned)
        m = jnp.take(meta, ic, axis=0, mode="clip")
        p = m[..., 0]
        f = (m[..., 1] & U32(0xFF)).astype(jnp.uint8)
        if not with_info:
            return hit, p, f
        return hit, p, f, ((m[..., 1] >> 8) & U32(0xFF)).astype(jnp.uint8)

    def exact_ref(self, q_hi, q_lo, valid=None):
        shp = q_hi.shape
        d = self.dix
        a = self.arg
        v = (jnp.ones(q_hi.size, bool) if valid is None
             else valid.reshape(-1))

        def ans(qh, ql):
            return self._local_exact(d.ref_hi, d.ref_lo, d.ref_meta,
                                     False, a.my_ref_owned[0], qh, ql)

        (hit, pos, flag), _ = self._route(
            self._ref_owner(q_hi.reshape(-1)), v,
            (q_hi.reshape(-1), q_lo.reshape(-1)), ans, 3)
        return (hit != 0).reshape(shp), pos.reshape(shp), flag.reshape(shp)

    def exact_snp(self, q_hi, q_lo, valid=None):
        shp = q_hi.shape
        d = self.dix
        a = self.arg
        v = (jnp.ones(q_hi.size, bool) if valid is None
             else valid.reshape(-1))

        def ans(qh, ql):
            return self._local_exact(d.snp_hi, d.snp_lo, d.snp_meta,
                                     True, a.my_snp_owned[0], qh, ql)

        (hit, pos, flag, info), _ = self._route(
            self._snp_owner(q_hi.reshape(-1)), v,
            (q_hi.reshape(-1), q_lo.reshape(-1)), ans, 4)
        return ((hit != 0).reshape(shp), pos.reshape(shp),
                info.reshape(shp), flag.reshape(shp))

    def exact_ref_sparse(self, q_hi, q_lo, valid=None):
        return self.exact_ref(q_hi, q_lo, valid)

    def exact_snp_sparse(self, q_hi, q_lo, valid=None):
        return self.exact_snp(q_hi, q_lo, valid)

    def ref_block_size(self, q_hi):
        shp = q_hi.shape
        d = self.dix
        a = self.arg

        def ans(qh):
            zeros = jnp.zeros_like(qh)
            start = search.lower_bound(d.ref_hi, d.ref_lo, qh, zeros)
            end = search.lower_bound(d.ref_hi, d.ref_lo, qh + U32(1), zeros)
            owned = a.my_ref_owned[0]
            end = jnp.where(qh == U32(0xFFFFFFFF), owned, end)
            return ((jnp.minimum(end, owned)
                     - jnp.minimum(start, owned)).astype(I32),)

        (bs,), _ = self._route(self._ref_owner(q_hi.reshape(-1)),
                               jnp.ones(q_hi.size, bool),
                               (q_hi.reshape(-1),), ans, 1)
        return bs.reshape(shp)

    # --- routed block scans ---

    def _scan(self, is_ref: bool, q_hi, q_lo, active) -> ScanResult:
        R = self.scan_slots
        NI = q_hi.shape[0]
        owner = self._ref_owner(q_hi) if is_ref else self._snp_owner(q_hi)
        ovf_box = [jnp.zeros((), I32)]

        def ans(qh, ql, act):
            local = self._local()
            res = (local.ref_scan(qh, ql, act != 0) if is_ref
                   else local.snp_scan(qh, ql, act != 0))
            M = qh.shape[0]
            tgt = jnp.cumsum(res.hit.astype(I32), axis=1) - 1
            keep = res.hit & (tgt < R)
            ovf_box[0] = (jnp.sum(res.hit) - jnp.sum(keep)) + res.overflow
            rows = jnp.arange(M)[:, None]
            scat = jnp.where(keep, tgt, R)

            def cp(arr, fill, dt):
                out = jnp.full((M, R + 1), fill, dt)
                out = out.at[rows, scat].set(arr.astype(dt), mode="drop")
                return out[:, :R].reshape(M * R)

            return (cp(keep, 0, I32), cp(res.pos, 0, U32),
                    cp(res.flag, 0, U32), cp(res.info, 0, U32),
                    cp(res.nb_hi, 0, U32), cp(res.nb_lo, 0, U32),
                    cp(res.diff, 0, I32))

        outs, route_ovf = self._route(owner, active,
                                      (q_hi, q_lo, active), ans, 7, R=R)
        hit, pos, flag, info, nbhi, nblo, diff = outs
        # per-device overflow count (this device answered other shards'
        # queries): stats are host-aggregated across devices, no psum here
        scan_ovf = ovf_box[0]
        return ScanResult(
            hit=hit != 0, pos=pos, flag=flag.astype(jnp.uint8),
            info=info.astype(jnp.uint8), nb_hi=nbhi, nb_lo=nblo,
            diff=diff, overflow=scan_ovf + route_ovf)

    def ref_scan(self, q_hi, q_lo, active) -> ScanResult:
        return self._scan(True, q_hi, q_lo, active)

    def snp_scan(self, q_hi, q_lo, active) -> ScanResult:
        return self._scan(False, q_hi, q_lo, active)


class ShardedDictGenoRunner(ShardedGenoRunner):
    """Data-parallel reads + range-partitioned dictionaries on one mesh.

    Subclasses the data-parallel mesh runner, so it inherits the full host
    loop: prefetch + native pre-encode, depth-N pipelined dispatch, queued
    reverse-orientation retries, per-batch overflow escalation-and-rerun
    (including route_factor / route_scan_slots via GenoConfig), and
    checkpoint/resume. Only the index layout (ShardedIndexArg), its
    shard_map specs/local view, and the backend (RoutedBackend) differ."""

    def __init__(self, index: VarGenoIndex, mesh: Mesh, config: GenoConfig,
                 scan_slots: Optional[int] = None,
                 route_factor: Optional[float] = None, **kw):
        # legacy ctor knobs fold into the config (the escalation path
        # doubles these fields on overflow and re-runs the batch)
        upd = {}
        if scan_slots is not None:
            upd["route_scan_slots"] = scan_slots
        if route_factor is not None:
            upd["route_factor"] = route_factor
        if upd:
            config = dataclasses.replace(config, **upd)
        super().__init__(index, mesh, config, **kw)
        self.arg = self.dix   # back-compat alias

    # --- mesh plumbing overrides ---

    def _prepare_dix(self, index: VarGenoIndex):
        D = self.D
        base, stacked, plan, owned, totals = partition_index(index, D)
        self._base_static = dict(
            n_ref_aux=base.n_ref_aux,
            snp_bf_bits=base.snp_bf_bits, ref_bf_bits=base.ref_bf_bits,
            ref_scan_max=base.ref_scan_max, snp_scan_max=base.snp_scan_max,
            n_ref_rows=stacked["ref_hi"].shape[1],
            n_snp_rows=stacked["snp_hi"].shape[1])
        # local DeviceIndex template: dict arrays = shard (leading D axis),
        # replicated fields shared, hash tables dummied out (unused).
        dummy_ht = np.zeros((1, 32), np.uint32)
        st = self._base_static

        def put_shard(name):
            # device_put COPIES; drop the host copy immediately (at 3G
            # rows the stacked dict arrays are ~50 GB)
            out = self._put_dstack(stacked.pop(name))
            return out

        shard_dix = DeviceIndex(
            ref_hi=put_shard("ref_hi"),
            ref_lo=put_shard("ref_lo"),
            ref_meta=put_shard("ref_meta"),
            aux_all=self._put_repl(base.aux_all),
            n_ref_aux=st["n_ref_aux"],
            snp_hi=put_shard("snp_hi"),
            snp_lo=put_shard("snp_lo"),
            snp_meta=put_shard("snp_meta"),
            snp_test=put_shard("snp_test"),
            ref_bf=self._put_repl(base.ref_bf),
            snp_bf=self._put_repl(base.snp_bf),
            site_pos=self._put_repl(base.site_pos),
            site_ref=self._put_repl(base.site_ref),
            site_alt=self._put_repl(base.site_alt),
            site_bitmap=self._put_repl(base.site_bitmap),
            site_rank=self._put_repl(base.site_rank),
            site_dir=self._put_repl(base.site_dir),
            site_ra=self._put_repl(base.site_ra),
            both_ht=self._put_repl(dummy_ht),
            ref_jg=self._put_repl(dummy_ht.reshape(-1)[:2]),
            snp_jg=self._put_repl(dummy_ht.reshape(-1)[:2]),
            both_pf=self._put_repl(dummy_ht.reshape(-1)),
            snp_bf_bits=st["snp_bf_bits"], ref_bf_bits=st["ref_bf_bits"],
            both_ht_nb=1, both_ht_chain=1,
            ref_win_rows=1,
            # shard blocks are whole global blocks (boundaries snap to
            # key changes), so the global maxima bound per-shard scans
            ref_scan_max=st["ref_scan_max"],
            snp_scan_max=st["snp_scan_max"],
            n_ref_rows=st["n_ref_rows"],
            n_snp_rows=st["n_snp_rows"],
            both_pf_bits=1024,
        )
        return ShardedIndexArg(
            dix=shard_dix,
            plan=jax.tree.map(self._put_repl, plan),
            my_ref_owned=self._put_dstack(owned["ref"][:, None]),
            my_snp_owned=self._put_dstack(owned["snp"][:, None]),
            my_ref_total=self._put_dstack(totals["ref"][:, None]),
            my_snp_total=self._put_dstack(totals["snp"][:, None]),
        )

    def _dix_specs(self):
        axis = self.axis
        none = P()
        st = self._base_static
        return ShardedIndexArg(
            dix=DeviceIndex(
                ref_hi=P(axis), ref_lo=P(axis), ref_meta=P(axis),
                aux_all=none, n_ref_aux=st["n_ref_aux"],
                snp_hi=P(axis), snp_lo=P(axis), snp_meta=P(axis),
                snp_test=P(axis),
                ref_bf=none, snp_bf=none,
                site_pos=none, site_ref=none, site_alt=none,
                site_bitmap=none, site_rank=none, site_dir=none,
                site_ra=none, both_ht=none,
                ref_jg=none, snp_jg=none, both_pf=none,
                snp_bf_bits=st["snp_bf_bits"],
                ref_bf_bits=st["ref_bf_bits"],
                both_ht_nb=1, both_ht_chain=1,
                ref_win_rows=1,
                ref_scan_max=st["ref_scan_max"],
                snp_scan_max=st["snp_scan_max"],
                n_ref_rows=st["n_ref_rows"],
                n_snp_rows=st["n_snp_rows"],
                both_pf_bits=1024),
            plan=ShardPlan(ref_bounds_hi=none, snp_bounds_hi24=none),
            my_ref_owned=P(axis), my_snp_owned=P(axis),
            my_ref_total=P(axis), my_snp_total=P(axis))

    def _local_view(self, arg_l):
        # strip the leading device axis of shard fields
        dx = arg_l.dix
        strip = dict(
            ref_hi=dx.ref_hi[0], ref_lo=dx.ref_lo[0],
            ref_meta=dx.ref_meta[0],
            snp_hi=dx.snp_hi[0], snp_lo=dx.snp_lo[0],
            snp_meta=dx.snp_meta[0], snp_test=dx.snp_test[0])
        dx2 = dataclasses.replace(dx, **strip)
        return dataclasses.replace(
            arg_l, dix=dx2,
            my_ref_owned=arg_l.my_ref_owned[0],
            my_snp_owned=arg_l.my_snp_owned[0],
            my_ref_total=arg_l.my_ref_total[0],
            my_snp_total=arg_l.my_snp_total[0])

    def _backend_factory(self, cfg: GenoConfig):
        axis, D = self.axis, self.D

        def factory(arg_t):
            return RoutedBackend(arg_t, axis, D,
                                 cfg.replicate_stride_bug,
                                 cfg.block_size_threshold,
                                 scan_slots=cfg.route_scan_slots,
                                 route_factor=cfg.route_factor)

        return factory

    def counts(self):
        return self.merge_counts()
