"""Pallas TPU kernel for the vote scan (improved_index_table_add semantics).

The XLA lax.scan version round-trips ~4 MB of candidate-table carry through
HBM on every one of the E sequential steps. This kernel keeps the whole
candidate table in VMEM scratch for a tile of reads and loops the E events
on-chip, so the sequential chain costs VPU cycles instead of HBM bandwidth.

State layout is (C, Bt): candidates on the sublane axis, reads on the lane
axis. Semantics are identical to the scan in engine.batch (and therefore to
src/qv.cc:132-178); tests compare both paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
I32 = jnp.int32


def _vote_kernel(idx_ref, k_ref, isnb_ref, val_ref, evn_ref,
                 process_ref, target_ref, ovf_ref,
                 cidx, cfreq, ckm, ncand, best_u, ovf_acc,
                 E: int, C: int):
    Bt = idx_ref.shape[1]
    cidx[:, :] = jnp.zeros((C, Bt), U32)
    cfreq[:, :] = jnp.zeros((C, Bt), I32)
    ckm[:, :] = jnp.zeros((C, Bt), U32)
    ncand[:, :] = jnp.zeros((1, Bt), I32)
    # best_u rows: 0 has_best(i32), 1 best_freq, 2 best_idx(u32 bits), 3 amb
    best_u[:, :] = jnp.zeros((4, Bt), I32)
    ovf_acc[:, :] = jnp.zeros((1, Bt), I32)

    c_iota = jax.lax.broadcasted_iota(I32, (C, Bt), 0)

    def body(e, _):
        e_idx = idx_ref[e, :][None, :]              # (1, Bt) u32
        e_k = k_ref[e, :][None, :]
        e_isnb = isnb_ref[e, :][None, :] != 0
        e_val = val_ref[e, :][None, :] != 0

        nc = ncand[0, :][None, :]
        used = c_iota < nc
        match = used & (cidx[:, :] == e_idx)
        found = jnp.any(match, axis=0, keepdims=True)
        accept = e_val & (found | ~e_isnb)
        can_ins = nc < C
        insert = accept & ~found
        eff = accept & (found | can_ins)
        ins_hot = (c_iota == nc) & (insert & can_ins)
        onehot = (match & accept) | ins_hot

        new_cidx = jnp.where(onehot, e_idx, cidx[:, :])
        new_cfreq = cfreq[:, :] + onehot.astype(I32)
        new_ckm = ckm[:, :] | jnp.where(
            onehot, U32(1) << e_k.astype(U32), U32(0))
        cidx[:, :] = new_cidx
        cfreq[:, :] = new_cfreq
        ckm[:, :] = new_ckm
        ncand[:, :] = nc + (insert & can_ins).astype(I32)
        ovf_acc[:, :] = ovf_acc[:, :] + (insert & ~can_ins).astype(I32)

        f = jnp.sum(jnp.where(onehot, new_cfreq, 0), axis=0, keepdims=True)
        km_sel = jnp.sum(jnp.where(onehot, pltpu.bitcast(new_ckm, I32), 0),
                         axis=0, keepdims=True)
        elig = jax.lax.population_count(
            pltpu.bitcast(km_sel, U32)).astype(I32) >= 2
        upd = eff & elig

        has_best = best_u[0, :][None, :] != 0
        bfreq = best_u[1, :][None, :]
        bidx = pltpu.bitcast(best_u[2, :][None, :], U32)
        amb_i = best_u[3, :][None, :]

        is_best = eff & (e_idx == bidx) & has_best
        bfreq = bfreq + is_best.astype(I32)

        take_new = upd & (~has_best | (~is_best & (f > bfreq)))
        set_amb = upd & has_best & ~is_best & (f == bfreq)
        clr_amb = upd & (is_best | ~has_best | (f > bfreq))

        new_has = has_best | (upd & ~has_best) | take_new
        new_bidx = jnp.where(take_new, e_idx, bidx)
        new_bfreq = jnp.where(take_new, f, bfreq)
        new_amb_i = jnp.where(set_amb, 1, jnp.where(clr_amb, 0, amb_i))
        best_u[0, :] = new_has.astype(I32)[0, :]
        best_u[1, :] = new_bfreq[0, :]
        best_u[2, :] = pltpu.bitcast(new_bidx, I32)[0, :]
        best_u[3, :] = new_amb_i[0, :]
        return 0

    # events beyond a read's count are invalid (no-op body steps), so the
    # sequential loop only needs the tile's maximum event count -- typical
    # reads carry ~8 events against a 96-slot buffer
    e_hi = jnp.minimum(jnp.max(evn_ref[0, :]), E)
    jax.lax.fori_loop(0, e_hi, body, 0)

    has_best = best_u[0, :] != 0
    bfreq = best_u[1, :]
    amb = best_u[3, :] != 0
    process_ref[0, :] = (has_best & (bfreq > 1) & ~amb).astype(I32)
    ovf_ref[0, :] = ovf_acc[0, :]
    target_ref[0, :] = jnp.where(has_best,
                                 pltpu.bitcast(best_u[2, :][None, :],
                                               U32)[0, :], U32(0))


def vote_scan_pallas(ev_idx, ev_k, ev_isnb, ev_valid, C: int,
                     ev_n=None, tile: int = 512, interpret: bool = False):
    """ev_* are (E, B); ev_n (B,) is each read's true event count (loop
    bound; defaults to E everywhere). Returns (process(B,) bool,
    target(B,) u32, cand_overflow scalar i32)."""
    E, B = ev_idx.shape
    tile = min(tile, B)
    assert B % tile == 0
    grid = B // tile
    if ev_n is None:
        ev_n = jnp.full((B,), E, I32)
    ev_n = jnp.minimum(ev_n.astype(I32), E).reshape(1, B)
    kern = functools.partial(_vote_kernel, E=E, C=C)
    process, target, ovf = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((E, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), I32),
            jax.ShapeDtypeStruct((1, B), U32),
            jax.ShapeDtypeStruct((1, B), I32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, tile), U32),
            pltpu.VMEM((C, tile), I32),
            pltpu.VMEM((C, tile), U32),
            pltpu.VMEM((1, tile), I32),
            pltpu.VMEM((4, tile), I32),
            pltpu.VMEM((1, tile), I32),
        ],
        interpret=interpret,
    )(ev_idx, ev_k.astype(I32), ev_isnb.astype(I32), ev_valid.astype(I32),
      ev_n)
    return (process[0] != 0), target[0], jnp.sum(ovf)
