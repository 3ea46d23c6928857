"""The batched TPU genotyping engine.

Re-architects the reference's per-read sequential loop (src/qv.cc:760-1558)
as a fixed-shape data-parallel pipeline over B reads x K k-mers:

  encode -> exact lookups -> low-quality k-mer compaction -> neighbor probe
  grid -> probe-hit compaction -> aux/event expansion into an ordered
  (B, E) event buffer -> sequential vote scan (exact reference semantics)
  -> orientation select -> agreeing-context compaction -> pileup scatter.

Everything is masked dense ops; per-batch "overflow" counters report any
truncation against the reference's unbounded (or 2000-capped) buffers so
tests can assert zero divergence.

Event ORDER inside a read reproduces the reference exactly: per k-mer, the
exact ref hit(s), the exact snp hit(s), then (quality-gated) the lo-half
neighbor events (small-block Hamming scans of the ref then snp jumpgate
blocks, qv.cc:1110-1209, or the big-block 96-probe enumeration,
qv.cc:962-1108) and the hi-half probe events (qv.cc:1213-1365), because the
vote state machine (improved_index_table_add, qv.cc:132-178) is
order-sensitive.

Dictionary probes are answered through a pluggable backend (engine.backend):
LocalBackend for a replicated index, dist.sharded_dict.RoutedBackend for a
hi-bit-partitioned index with all_to_all k-mer routing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import GenoConfig, NO_MODIFICATION, POS_AMBIGUOUS
from ..core import hashes
from . import search
from .backend import LocalBackend
from .device_index import DeviceIndex

U32 = jnp.uint32
I32 = jnp.int32

_NO_MOD = jnp.int32(NO_MODIFICATION)
_POS_AMBIG = jnp.uint32(POS_AMBIGUOUS)


def encode_batch(codes, n_kmers, K: int):
    """codes (B, L) u8 -> kmer (hi, lo) (B, K) u32 + validity.

    A read whose first n_kmers*32 bases contain any non-ACGT code is dropped
    entirely (src/qv.cc:812-828: N aborts the orientation AND the read)."""
    B = codes.shape[0]
    win = codes[:, : K * 32].reshape(B, K, 32)
    shifts = jnp.arange(16, dtype=U32) * 2
    c = win.astype(U32)
    lo = jnp.sum(jnp.where(win[..., :16] <= 3, c[..., :16], 0) << shifts,
                 axis=-1, dtype=U32)
    hi = jnp.sum(jnp.where(win[..., 16:] <= 3, c[..., 16:], 0) << shifts,
                 axis=-1, dtype=U32)
    slot = jnp.arange(K, dtype=I32)[None, :]
    in_read = slot < n_kmers[:, None]
    win_bad = jnp.any(win > 3, axis=-1)
    read_ok = ~jnp.any(win_bad & in_read, axis=-1)
    kmer_valid = in_read & read_ok[:, None]
    return hi, lo, kmer_valid, read_ok


@dataclasses.dataclass
class _Shapes:
    B: int
    K: int
    E: int
    C: int
    NI: int   # neighbor work items
    H: int    # compacted probe hits per item
    A: int    # agreeing contexts per read


def _get_base(hi, lo, i):
    use_hi = i >= 16
    sh = jnp.where(use_hi, 2 * (i - 16), 2 * i).astype(U32)
    word = jnp.where(use_hi, hi, lo)
    return ((word >> sh) & U32(3)).astype(jnp.uint8)


def make_batch_processor(dix: DeviceIndex, config: GenoConfig,
                         return_debug: bool = False,
                         backend_factory: Optional[Callable] = None,
                         _ablate: str = ""):
    """Build the jitted per-batch step.

    step(codes(B,L)u8, n_kmers(B,)i32, qual(B,K)u8, ref_cnt(s,), alt_cnt(s,))
      -> (ref_cnt', alt_cnt', stats)  [+ debug dict when return_debug]

    The index arrays thread through jit as a pytree argument (NOT captured
    constants -- a 1.2 GB Bloom filter must not be baked into the HLO).
    """
    host_dix = dix
    cfg = config
    sh = _Shapes(
        B=cfg.batch_reads, K=cfg.max_kmers_per_read, E=cfg.events_per_read,
        C=cfg.candidates_per_read,
        NI=max(8, int(cfg.batch_reads * cfg.max_kmers_per_read
                      * cfg.neighbor_item_frac)),
        H=cfg.probe_hit_cap, A=cfg.agree_cap)

    if backend_factory is None:
        def backend_factory(dix_t):
            return LocalBackend(dix_t, cfg.replicate_stride_bug,
                                cfg.block_size_threshold)

    # probe slot geometry depends on the backend's scan capacity
    SCAN = backend_factory(dix).scan_slots
    P_SMALL = 2 * SCAN
    P_BIGLO = 16 * 4 * 2
    P_HI = 16 * 4 * 2
    P2 = P_SMALL + P_BIGLO + P_HI

    def take(arr, idx):
        return jnp.take(arr, idx, axis=0, mode="clip")

    # ------------------------------------------------------------------
    def neighbor_probes(be, dix, it_hi, it_lo, it_valid):
        """All neighbor probes for NI work items -> (NI, P2) materialized
        fields (hit, is_ref, pos, flag, info, nb_hi, nb_lo, diff)."""
        NI = it_hi.shape[0]
        bsize = be.ref_block_size(it_hi)
        big = bsize >= jnp.int32(cfg.block_size_threshold)

        # Bloom-filter pruning (qv.cc:946-956)
        ref_bit = hashes.hash32(it_lo)
        if dix.ref_bf_bits < (1 << 32):  # identity at reference geometry
            ref_bit = ref_bit % U32(dix.ref_bf_bits)
        ref_hit_bf = search.bitmap_test(dix.ref_bf, ref_bit)
        snp_bit = hashes.snp_bf_bit(it_hi & U32(0xFF), it_lo,
                                    dix.snp_bf_bits)
        snp_hit_bf = search.bitmap_test(dix.snp_bf, snp_bit)
        ref_bound = jnp.where(ref_hit_bf, 64, 32)
        snp_bound = jnp.where(snp_hit_bf, 64, 40)

        outs = []  # (hit, is_ref, pos, flag, info, nb_hi, nb_lo, diff)

        # --- small-block scans (ref then snp) ---
        rs = be.ref_scan(it_hi, it_lo, it_valid & ~big)
        outs.append((rs.hit, jnp.ones_like(rs.hit), rs.pos, rs.flag,
                     rs.info, rs.nb_hi, rs.nb_lo, rs.diff))
        ss = be.snp_scan(it_hi, it_lo, it_valid & ~big)
        outs.append((ss.hit, jnp.zeros_like(ss.hit), ss.pos, ss.flag,
                     ss.info, ss.nb_hi, ss.nb_lo, ss.diff))
        scan_overflow = rs.overflow + ss.overflow

        def interleave(a_ref, a_snp):
            return jnp.stack([a_ref, a_snp], axis=-1).reshape(
                a_ref.shape[0], -1)

        bases = jnp.arange(16, dtype=I32)
        jj = jnp.arange(4, dtype=I32)
        bgrid = jnp.repeat(bases, 4)[None, :]            # (1, 64)
        jgrid = jnp.tile(jj, 16)[None, :]

        # --- big-block lo-half enumeration (qv.cc:965-1108) ---
        cur = ((it_lo[:, None] >> (2 * bgrid).astype(U32)) & U32(3))
        act_bl = it_valid[:, None] & big[:, None] & (jgrid != cur.astype(I32))
        nb_lo_big = ((it_lo[:, None] & ~(U32(3) << (2 * bgrid).astype(U32)))
                     | (jgrid.astype(U32) << (2 * bgrid).astype(U32)))
        nb_hi_big = jnp.broadcast_to(it_hi[:, None], nb_lo_big.shape)
        r_hit, r_pos, r_flag = be.exact_ref(nb_hi_big, nb_lo_big)
        s_hit, s_pos, s_info, s_flag = be.exact_snp(nb_hi_big, nb_lo_big)
        z8 = jnp.zeros_like(s_info)
        outs.append((
            interleave(act_bl & r_hit, act_bl & s_hit),
            interleave(jnp.ones_like(act_bl), jnp.zeros_like(act_bl)),
            interleave(r_pos, s_pos),
            interleave(r_flag, s_flag),
            interleave(z8, s_info),
            interleave(nb_hi_big, nb_hi_big),
            interleave(nb_lo_big, nb_lo_big),
            interleave(bgrid + 0 * r_pos.astype(I32),
                       bgrid + 0 * s_pos.astype(I32))))

        # --- hi-half probes (qv.cc:1213-1365) ---
        bgrid_h = bgrid + 16
        bitpos = 2 * bgrid_h
        cur_h = ((it_hi[:, None] >> (2 * bgrid).astype(U32)) & U32(3))
        base_ok = jgrid != cur_h.astype(I32)
        nb_hi_h = ((it_hi[:, None] & ~(U32(3) << (2 * bgrid).astype(U32)))
                   | (jgrid.astype(U32) << (2 * bgrid).astype(U32)))
        nb_lo_h = jnp.broadcast_to(it_lo[:, None], nb_hi_h.shape)
        act_ref = (it_valid[:, None] & base_ok
                   & (bitpos < ref_bound[:, None]))
        act_snp = (it_valid[:, None] & base_ok
                   & (big[:, None] | (bitpos >= 40))
                   & (bitpos < snp_bound[:, None]))
        rh_hit, rh_pos, rh_flag = be.exact_ref(nb_hi_h, nb_lo_h)
        sh_hit, sh_pos, sh_info, sh_flag = be.exact_snp(nb_hi_h, nb_lo_h)
        outs.append((
            interleave(act_ref & rh_hit, act_snp & sh_hit),
            interleave(jnp.ones_like(act_ref), jnp.zeros_like(act_snp)),
            interleave(rh_pos, sh_pos),
            interleave(rh_flag, sh_flag),
            interleave(jnp.zeros_like(sh_info), sh_info),
            interleave(nb_hi_h, nb_hi_h),
            interleave(nb_lo_h, nb_lo_h),
            interleave(bgrid_h + 0 * rh_pos.astype(I32),
                       bgrid_h + 0 * sh_pos.astype(I32))))

        cat = lambda i: jnp.concatenate([o[i] for o in outs], axis=1)
        return tuple(cat(i) for i in range(8)) + (scan_overflow,)

    # ------------------------------------------------------------------
    def expand_probe_events(dix, p_is_ref, p_pos, p_flag, p_info, p_diff,
                            p_valid):
        """(NI, H) compacted probe hits -> (NI, H, 10) candidate events:
        (kmer_pos, validity)."""
        usable = p_valid & (p_pos != _POS_AMBIG)
        unamb = p_flag == 0

        aux_row = jnp.minimum(p_pos, U32(dix.ref_aux.shape[0] - 1))
        aux_row_s = jnp.minimum(p_pos, U32(dix.snp_aux_pos.shape[0] - 1))
        aux_pos = jnp.where(
            p_is_ref[..., None],
            take(dix.ref_aux, aux_row.astype(I32)),
            take(dix.snp_aux_pos, aux_row_s.astype(I32)))
        aux_snp = take(dix.snp_aux_snp, aux_row_s.astype(I32))

        col0 = (jnp.arange(10) == 0)
        kpos = jnp.where(unamb[..., None] & col0, p_pos[..., None], aux_pos)
        col_valid = jnp.where(unamb[..., None], col0, aux_pos != 0)

        diff_u = p_diff.astype(U32)
        site_pos_chk = kpos + diff_u[..., None]
        is_site = search.bitmap_test(dix.site_bitmap, site_pos_chk)
        snp_off = ((jnp.where(unamb[..., None] & col0,
                              p_info[..., None], aux_snp) >> 3)
                   & 0x1F).astype(I32)
        check = jnp.where(p_is_ref[..., None], ~is_site,
                          snp_off != p_diff[..., None])
        ev_valid = usable[..., None] & col_valid & check
        return kpos, ev_valid

    # ------------------------------------------------------------------
    def expand_exact_events(dix, is_ref: bool, hit, pos, flag):
        """(B, K) exact hits -> (B, K, 10) events (no checks)."""
        aux_arr = dix.ref_aux if is_ref else dix.snp_aux_pos
        aux = take(aux_arr,
                   jnp.minimum(pos, U32(aux_arr.shape[0] - 1)).astype(I32))
        usable = hit & (pos != _POS_AMBIG)
        unamb = flag == 0
        col0 = (jnp.arange(10) == 0)
        kpos = jnp.where(unamb[..., None] & col0, pos[..., None], aux)
        ev_valid = usable[..., None] & jnp.where(unamb[..., None], col0,
                                                 aux != 0)
        return kpos, ev_valid

    # ------------------------------------------------------------------
    def orientation_pass(dix, be, codes, n_kmers, qual):
        B, K, E, C, NI, H = sh.B, sh.K, sh.E, sh.C, sh.NI, sh.H
        hi, lo, kmer_valid, read_ok = encode_batch(codes, n_kmers, K)

        r_hit, r_pos, r_flag = be.exact_ref(hi, lo)
        s_hit, s_pos, s_info, s_flag = be.exact_snp(hi, lo)
        r_hit = r_hit & kmer_valid
        s_hit = s_hit & kmer_valid

        exr_kpos, exr_valid = expand_exact_events(dix, True, r_hit, r_pos,
                                                  r_flag)
        exs_kpos, exs_valid = expand_exact_events(dix, False, s_hit, s_pos,
                                                  s_flag)

        # ---- neighbor work-item compaction ----
        lowq = kmer_valid & (qual < jnp.uint8(cfg.quality_score))
        flat_mask = lowq.reshape(-1)
        tgt = jnp.cumsum(flat_mask.astype(I32)) - 1
        keep = flat_mask & (tgt < NI)
        ni_overflow = jnp.sum(flat_mask) - jnp.sum(keep)
        src = jnp.arange(B * K, dtype=I32)
        item_src = jnp.full(NI, -1, I32)
        item_src = item_src.at[jnp.where(keep, tgt, NI)].set(
            src, mode="drop")
        it_ok = item_src >= 0
        it_b = jnp.where(it_ok, item_src // K, 0)
        it_k = jnp.where(it_ok, item_src % K, 0)
        it_hi = hi[it_b, it_k]
        it_lo = lo[it_b, it_k]

        (p_hit, p_is_ref, p_pos, p_flag, p_info, p_nb_hi, p_nb_lo, p_diff,
         scan_ovf) = neighbor_probes(be, dix, it_hi, it_lo, it_ok)

        # ---- probe-hit compaction (NI, P2) -> (NI, H) ----
        ptgt = jnp.cumsum(p_hit.astype(I32), axis=1) - 1
        pkeep = p_hit & (ptgt < H)
        ph_overflow = jnp.sum(p_hit) - jnp.sum(pkeep)
        flat_rows = jnp.arange(NI)[:, None]
        scat = jnp.where(pkeep, ptgt, H)

        def compact(a, fill):
            out = jnp.full((NI, H + 1), fill, a.dtype)
            out = out.at[flat_rows, scat].set(a, mode="drop")
            return out[:, :H]

        c_valid = compact(pkeep, False)
        c_is_ref = compact(p_is_ref, False)
        c_pos = compact(p_pos, U32(0))
        c_flag = compact(p_flag, jnp.uint8(0))
        c_info = compact(p_info, jnp.uint8(0))
        c_nb_hi = compact(p_nb_hi, U32(0))
        c_nb_lo = compact(p_nb_lo, U32(0))
        c_diff = compact(p_diff, 0)

        nb_kpos, nb_valid = expand_probe_events(
            dix, c_is_ref, c_pos, c_flag, c_info, c_diff, c_valid)

        # ---- event assembly into ordered (B, E) buffer ----
        exr_n = jnp.sum(exr_valid, axis=-1)
        exs_n = jnp.sum(exs_valid, axis=-1)
        nb_n_item = jnp.sum(nb_valid, axis=(1, 2))
        nb_n_flat = jnp.zeros(B * K, I32).at[
            jnp.where(it_ok, item_src, B * K)].set(
                nb_n_item.astype(I32), mode="drop")
        nb_n = nb_n_flat.reshape(B, K)
        groups = jnp.stack([exr_n, exs_n, nb_n], axis=-1).reshape(B, 3 * K)
        goff = jnp.cumsum(groups, axis=-1) - groups
        ev_total = jnp.sum(groups, axis=-1)
        ev_overflow = jnp.sum(jnp.maximum(ev_total - E, 0))

        buf = dict(
            idx=jnp.zeros((B, E + 1), U32),
            kpos=jnp.zeros((B, E + 1), U32),
            nbhi=jnp.zeros((B, E + 1), U32),
            nblo=jnp.zeros((B, E + 1), U32),
            modif=jnp.full((B, E + 1), _NO_MOD, I32),
            k=jnp.zeros((B, E + 1), I32),
            isnb=jnp.zeros((B, E + 1), bool),
            valid=jnp.zeros((B, E + 1), bool),
        )
        rows_b = jnp.arange(B)[:, None, None]

        def scatter_group(buf, kpos, valid, group_idx, nbhi, nblo, modif,
                          isnb, kslot):
            rank = jnp.cumsum(valid, axis=-1) - 1
            base = jnp.take_along_axis(goff, group_idx, axis=-1)
            e = base[..., None] + rank
            e = jnp.where(valid & (e < E), e, E)
            buf["idx"] = buf["idx"].at[rows_b, e].set(
                kpos - (kslot * 32).astype(U32)[..., None], mode="drop")
            buf["kpos"] = buf["kpos"].at[rows_b, e].set(kpos, mode="drop")
            buf["nbhi"] = buf["nbhi"].at[rows_b, e].set(
                jnp.broadcast_to(nbhi[..., None], kpos.shape), mode="drop")
            buf["nblo"] = buf["nblo"].at[rows_b, e].set(
                jnp.broadcast_to(nblo[..., None], kpos.shape), mode="drop")
            buf["modif"] = buf["modif"].at[rows_b, e].set(
                jnp.broadcast_to(modif[..., None], kpos.shape), mode="drop")
            buf["k"] = buf["k"].at[rows_b, e].set(
                jnp.broadcast_to(kslot[..., None], kpos.shape), mode="drop")
            buf["isnb"] = buf["isnb"].at[rows_b, e].set(
                jnp.broadcast_to(jnp.asarray(isnb), kpos.shape), mode="drop")
            buf["valid"] = buf["valid"].at[rows_b, e].set(valid, mode="drop")
            return buf

        kslot_arr = jnp.broadcast_to(jnp.arange(K, dtype=I32)[None, :],
                                     (B, K))
        g_exr = jnp.broadcast_to((3 * jnp.arange(K))[None, :], (B, K))
        buf = scatter_group(buf, exr_kpos, exr_valid, g_exr, hi, lo,
                            jnp.full((B, K), _NO_MOD), False, kslot_arr)
        buf = scatter_group(buf, exs_kpos, exs_valid, g_exr + 1, hi, lo,
                            jnp.full((B, K), _NO_MOD), False, kslot_arr)

        # neighbor events: (NI, H, 10); within-item order = (probe, col)
        nb_rank = (jnp.cumsum(nb_valid.reshape(NI, -1), axis=-1) - 1)
        nb_base = goff[it_b, 3 * it_k + 2]
        e_nb = nb_base[:, None] + nb_rank
        v_nb = nb_valid.reshape(NI, -1)
        e_nb = jnp.where(v_nb & (e_nb < E), e_nb, E)
        b_nb = jnp.broadcast_to(it_b[:, None], e_nb.shape)

        def nb_field(a):
            return jnp.broadcast_to(a[..., None],
                                    a.shape + (10,)).reshape(NI, -1)

        kpos_nb = nb_kpos.reshape(NI, -1)
        off_nb = nb_field(
            jnp.broadcast_to((it_k * 32)[:, None], (NI, H))).astype(U32)
        buf["idx"] = buf["idx"].at[b_nb, e_nb].set(
            kpos_nb - off_nb, mode="drop")
        buf["kpos"] = buf["kpos"].at[b_nb, e_nb].set(kpos_nb, mode="drop")
        buf["nbhi"] = buf["nbhi"].at[b_nb, e_nb].set(
            nb_field(c_nb_hi), mode="drop")
        buf["nblo"] = buf["nblo"].at[b_nb, e_nb].set(
            nb_field(c_nb_lo), mode="drop")
        buf["modif"] = buf["modif"].at[b_nb, e_nb].set(
            nb_field(c_diff), mode="drop")
        buf["k"] = buf["k"].at[b_nb, e_nb].set(
            nb_field(jnp.broadcast_to(it_k[:, None], (NI, H))), mode="drop")
        buf["isnb"] = buf["isnb"].at[b_nb, e_nb].set(True, mode="drop")
        buf["valid"] = buf["valid"].at[b_nb, e_nb].set(v_nb, mode="drop")

        buf = {k: v[:, :E] for k, v in buf.items()}

        if _ablate == "no_vote":
            stats = dict(ni_overflow=ni_overflow, probe_overflow=ph_overflow,
                         event_overflow=ev_overflow,
                         cand_overflow=jnp.zeros((), I32),
                         snp_scan_overflow=scan_ovf)
            return dict(buf=buf, process=jnp.zeros(B, bool),
                        target=jnp.zeros(B, U32), read_ok=read_ok,
                        stats=stats)

        # ---- vote scan (improved_index_table_add, qv.cc:132-178) ----
        # carry: candidate table + live best state. All per-step lookups are
        # one-hot reductions over the C axis (no gathers: TPU gathers are
        # HBM-latency bound, masked reductions ride the VPU).
        cand_idx = jnp.zeros((B, C), U32)
        cand_freq = jnp.zeros((B, C), I32)
        cand_kmask = jnp.zeros((B, C), U32)
        n_cand = jnp.zeros(B, I32)
        best = jnp.full(B, -1, I32)
        best_freq = jnp.zeros(B, I32)   # live freq of `best` (carried)
        best_idx = jnp.zeros(B, U32)    # index value of `best`
        amb = jnp.zeros(B, bool)
        cand_ovf = jnp.zeros((), I32)

        carry = (cand_idx, cand_freq, cand_kmask, n_cand, best, best_freq,
                 best_idx, amb, cand_ovf)
        ev_seq = tuple(jnp.moveaxis(buf[f], 1, 0)
                       for f in ("idx", "k", "isnb", "valid"))
        c_iota = jnp.arange(C, dtype=I32)[None, :]

        def vote_step(carry, ev):
            (cidx, cfreq, ckm, ncand, best, bfreq, bidx, amb, covf) = carry
            e_idx, e_k, e_isnb, e_val = ev
            used = c_iota < ncand[:, None]
            match = used & (cidx == e_idx[:, None])
            found = jnp.any(match, axis=1)
            accept = e_val & (found | ~e_isnb)
            can_ins = ncand < C
            insert = accept & ~found
            eff = accept & (found | can_ins)
            ins_hot = (c_iota == ncand[:, None]) & (insert & can_ins)[:, None]
            onehot = (match & accept[:, None]) | ins_hot
            cidx = jnp.where(onehot, e_idx[:, None], cidx)
            cfreq = cfreq + onehot.astype(I32)
            ckm_new = ckm | jnp.where(
                onehot, U32(1) << e_k[:, None].astype(U32), U32(0))
            ncand = ncand + (insert & can_ins).astype(I32)
            covf = covf + jnp.sum(insert & ~can_ins)

            # f, eligibility via one-hot reductions
            f = jnp.sum(jnp.where(onehot, cfreq, 0), axis=1)
            km_sel = jnp.sum(jnp.where(onehot, ckm_new, U32(0)), axis=1)
            elig = jax.lax.population_count(km_sel).astype(I32) >= 2
            upd = eff & elig
            has_best = best >= 0
            is_best = eff & (e_idx == bidx) & has_best
            # keep bfreq live: +1 whenever the best candidate's freq grew
            bfreq = bfreq + is_best.astype(I32)
            ckm = ckm_new

            slot = jnp.sum(jnp.where(onehot, c_iota, 0), axis=1)
            take_new = upd & (~has_best | (~is_best & (f > bfreq)))
            set_amb = upd & has_best & ~is_best & (f == bfreq)
            clr_amb = upd & (is_best | ~has_best | (f > bfreq))
            best = jnp.where(take_new, slot, best)
            bidx = jnp.where(take_new, e_idx, bidx)
            bfreq = jnp.where(take_new, f, bfreq)
            amb = jnp.where(set_amb, True, jnp.where(clr_amb, False, amb))
            return (cidx, cfreq, ckm, ncand, best, bfreq, bidx, amb,
                    covf), None

        carry, _ = jax.lax.scan(vote_step, carry, ev_seq)
        (cand_idx, cand_freq, cand_kmask, n_cand, best, best_freq, best_idx,
         amb, cand_ovf) = carry

        has_best = best >= 0
        target = jnp.where(has_best, best_idx, U32(0))
        process = has_best & (best_freq > 1) & ~amb

        stats = dict(ni_overflow=ni_overflow, probe_overflow=ph_overflow,
                     event_overflow=ev_overflow, cand_overflow=cand_ovf,
                     snp_scan_overflow=scan_ovf)
        return dict(buf=buf, process=process, target=target,
                    read_ok=read_ok, stats=stats)

    # ------------------------------------------------------------------
    def pileup_accumulate(dix, buf, use_mask, target, ref_cnt, alt_cnt):
        """Scatter agreeing contexts into per-site counts
        (qv.cc:1382-1502)."""
        B, E, A = sh.B, sh.E, sh.A
        agree = buf["valid"] & use_mask[:, None] & (buf["idx"]
                                                    == target[:, None])
        atgt = jnp.cumsum(agree.astype(I32), axis=1) - 1
        akeep = agree & (atgt < A)
        agree_ovf = jnp.sum(agree) - jnp.sum(akeep)
        rows = jnp.arange(B)[:, None]
        scat = jnp.where(akeep, atgt, A)

        def compact(a, fill):
            out = jnp.full((B, A + 1), fill, a.dtype)
            out = out.at[rows, scat].set(a, mode="drop")
            return out[:, :A]

        a_valid = compact(akeep, False)
        a_kpos = compact(buf["kpos"], U32(0))
        a_nbhi = compact(buf["nbhi"], U32(0))
        a_nblo = compact(buf["nblo"], U32(0))
        a_modif = compact(buf["modif"], _NO_MOD)

        i = jnp.arange(32, dtype=I32)[None, None, :]
        pos = a_kpos[..., None] + i.astype(U32)
        active = a_valid[..., None] & (i != a_modif[..., None])
        # O(1) site lookup: one gather of [bitmap_word, rank] + popcount
        # (replaces a 23-round binary search per base lane)
        n_sites = dix.site_pos.shape[0]
        nwords = dix.site_dir.shape[0]
        word_i = jnp.minimum((pos >> 5).astype(I32), nwords - 1)
        dirw = take(dix.site_dir, word_i)          # (..., 2)
        w = dirw[..., 0]
        bit = (pos & U32(31))
        in_map = (pos >> 5).astype(I32) < nwords
        hit_bit = ((w >> bit) & U32(1)) != 0
        low_mask = (U32(1) << bit) - U32(1)
        src = (dirw[..., 1].astype(I32)
               + jax.lax.population_count(w & low_mask).astype(I32))
        src = jnp.minimum(src, max(n_sites - 1, 0))
        is_site = active & in_map & hit_bit
        base = _get_base(a_nbhi[..., None], a_nblo[..., None], i)
        ra = take(dix.site_ra, src)
        sref = (ra & U32(0xFF)).astype(jnp.uint8)
        salt = ((ra >> 8) & U32(0xFF)).astype(jnp.uint8)
        add_ref = is_site & (base == sref)
        add_alt = is_site & ~add_ref & (base == salt)
        dump = jnp.int32(n_sites)
        tgt_row = jnp.where(is_site, src, dump).reshape(-1)
        ref_cnt = ref_cnt.at[tgt_row].add(
            add_ref.reshape(-1).astype(I32), mode="drop")
        alt_cnt = alt_cnt.at[tgt_row].add(
            add_alt.reshape(-1).astype(I32), mode="drop")
        return ref_cnt, alt_cnt, agree_ovf

    # ------------------------------------------------------------------
    def step(dix_t, codes, n_kmers, qual, ref_cnt, alt_cnt):
        B, K = sh.B, sh.K
        be = backend_factory(dix_t)
        fwd = orientation_pass(dix_t, be, codes, n_kmers, qual)

        # reverse-complement retry for unprocessed reads (qv.cc:1504-1510)
        length = (n_kmers * 32).astype(jnp.int32)
        L = codes.shape[1]
        ridx = length[:, None] - 1 - jnp.arange(L, dtype=I32)[None, :]
        rvalid = ridx >= 0
        g = jnp.take_along_axis(codes, jnp.clip(ridx, 0, L - 1).astype(I32),
                                axis=1)
        rc = jnp.where(g < 4, 3 - g, g)
        rc_codes = jnp.where(rvalid, rc, jnp.uint8(4)).astype(jnp.uint8)
        rev = orientation_pass(dix_t, be, rc_codes, n_kmers, qual)

        use_fwd = fwd["process"]
        use_rev = ~fwd["process"] & fwd["read_ok"] & rev["process"]

        if _ablate == "no_pileup":
            aovf1 = aovf2 = jnp.zeros((), I32)
        else:
            ref_cnt, alt_cnt, aovf1 = pileup_accumulate(
                dix_t, fwd["buf"], use_fwd, fwd["target"], ref_cnt, alt_cnt)
            ref_cnt, alt_cnt, aovf2 = pileup_accumulate(
                dix_t, rev["buf"], use_rev, rev["target"], ref_cnt, alt_cnt)

        stats = {("fwd_" + k): v for k, v in fwd["stats"].items()}
        stats.update({("rev_" + k): v for k, v in rev["stats"].items()})
        stats["agree_overflow"] = aovf1 + aovf2
        stats["n_processed"] = jnp.sum(use_fwd | use_rev)
        if return_debug:
            debug = dict(
                fwd_process=fwd["process"], fwd_target=fwd["target"],
                rev_process=rev["process"], rev_target=rev["target"],
                use_fwd=use_fwd, use_rev=use_rev)
            return ref_cnt, alt_cnt, stats, debug
        return ref_cnt, alt_cnt, stats

    jitted = jax.jit(step, donate_argnums=(4, 5))

    def run(codes, n_kmers, qual, ref_cnt, alt_cnt):
        return jitted(host_dix, codes, n_kmers, qual, ref_cnt, alt_cnt)

    run.raw = step          # unjitted (dix, codes, ...) for shard_map use
    run.shapes = sh
    return run
