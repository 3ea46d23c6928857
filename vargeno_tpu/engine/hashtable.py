"""Bucketized open-addressing hash table for exact k-mer lookups.

The reference resolves an exact lookup with a 16 GiB jumpgate load plus a
binary search (src/qv.cc:206-240). A TPU gather costs full HBM latency and
a branchless binary search needs ~2*ceil(log2 n) dependent gathers, so the
lookup structure is redesigned around the TPU's memory system: keys live in
8-slot buckets laid out as one contiguous 128-byte row, probing fetches ONE
row per visited bucket (a single gather descriptor) and compares all 8 slots
in vector registers. Linear probing across buckets; the number of unrolled
bucket visits is the build-time maximum chain length (typically 2 at the
0.5 load factor used here).

Entry layout per slot: [key_hi, key_lo, pos, meta] uint32, with
meta = occupied<<31 | snp_info<<16 | flag.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hashes import np_hash32, hash32

U32 = jnp.uint32
_MIX = 0x9E3779B9


def _bucket_hash_np(hi, lo, nb):
    with np.errstate(over="ignore"):
        h = np_hash32(lo) ^ (np_hash32(hi) * np.uint32(_MIX))
    return (h & np.uint32(nb - 1)).astype(np.int64)


@dataclasses.dataclass
class HostHashTable:
    table: np.ndarray   # (nb, 32) uint32
    nb: int
    chain: int


def build_hash_table(hi: np.ndarray, lo: np.ndarray, pos: np.ndarray,
                     flag: np.ndarray, info: np.ndarray | None,
                     slots_per_bucket: int = 8,
                     target_load: float = 0.3,
                     use_native: bool = True) -> HostHashTable:
    n = hi.shape[0]
    nb = 1 << max(2, int(np.ceil(np.log2(
        max(n / (slots_per_bucket * target_load), 1.0)))))

    if use_native and n >= (1 << 16):
        from .. import native

        if native.available():
            # single-pass sequential insertion at memory speed; placement
            # differs from the numpy rounds but any consistent placement
            # with a valid chain bound yields identical lookups
            table, chain = native.ht_build(hi, lo, pos, flag, info, nb,
                                           slots_per_bucket)
            return HostHashTable(table=table, nb=nb, chain=chain)

    home = _bucket_hash_np(hi, lo, nb)

    bucket = home.copy()
    placed = np.full(n, -1, np.int64)
    cap = np.zeros(nb, np.int64)
    remaining = np.arange(n)
    rounds = 0
    while remaining.size:
        b = bucket[remaining]
        order = np.argsort(b, kind="stable")
        rb = b[order]
        start = np.searchsorted(rb, rb)
        within = np.arange(rb.size) - start
        free = slots_per_bucket - cap[rb]
        fits = within < free
        sel = remaining[order[fits]]
        placed[sel] = b[order[fits]]
        np.add.at(cap, b[order[fits]], 1)
        rem = remaining[order[~fits]]
        bucket[rem] = (bucket[rem] + 1) & (nb - 1)
        remaining = rem
        rounds += 1
        if rounds > 64:
            raise RuntimeError("hash table build did not converge")

    # lookup chain bound: longest run of completely-full buckets + 1
    full = cap >= slots_per_bucket
    if full.any():
        f2 = np.concatenate([full, full])  # cover wraparound runs
        zeros = np.flatnonzero(~f2)
        if zeros.size == 0:
            best = len(f2)
        else:
            edges = np.concatenate([[-1], zeros, [len(f2)]])
            best = int((np.diff(edges) - 1).max())
        chain = min(best + 1, nb)
    else:
        chain = 1
    if n:
        chain = max(chain, int(((placed - home) % nb).max()) + 1)

    # slot assignment within buckets
    order2 = np.argsort(placed, kind="stable")
    pb = placed[order2]
    slot = np.arange(n) - np.searchsorted(pb, pb)
    table = np.zeros((nb, slots_per_bucket * 4), np.uint32)
    col = slot * 4
    rows = pb
    table[rows, col + 0] = hi[order2]
    table[rows, col + 1] = lo[order2]
    table[rows, col + 2] = pos[order2]
    meta = (np.uint32(1) << np.uint32(31)) | flag[order2].astype(np.uint32)
    if info is not None:
        meta = meta | (info[order2].astype(np.uint32) << np.uint32(16))
    table[rows, col + 3] = meta
    return HostHashTable(table=table, nb=nb, chain=int(chain))


def prefilter_bits(hi: np.ndarray, lo: np.ndarray, pf_bits: int
                   ) -> np.ndarray:
    """Host build of the full-key membership prefilter bitmap (LSB-first
    u32 words). One bit per key via the same bucket hash family; at a few
    percent fill this prunes ~97% of miss probes to a single gather."""
    with np.errstate(over="ignore"):
        h = np_hash32(lo) ^ (np_hash32(hi) * np.uint32(_MIX))
    bit = (h & np.uint32(pf_bits - 1)).astype(np.int64)
    words = np.zeros(pf_bits // 32, np.uint32)
    from .. import native

    if bit.size >= (1 << 16) and native.available():
        native.bf_set_bits(words, bit)
    else:
        np.bitwise_or.at(words, bit >> 5,
                         np.uint32(1) << (bit & 31).astype(np.uint32))
    return words


def prefilter_test(words, pf_bits: int, q_hi, q_lo, valid=None):
    h = hash32(q_lo) ^ (hash32(q_hi) * U32(_MIX))
    bit = h & U32(pf_bits - 1)
    if valid is not None:  # coalesce masked lanes' gathers onto word 0
        bit = jnp.where(valid, bit, U32(0))
    w = jnp.take(words, (bit >> 5).astype(jnp.int32), axis=0, mode="clip")
    hitbit = ((w >> (bit & U32(31))) & U32(1)) != 0
    return hitbit if valid is None else (hitbit & valid)


def ht_lookup(table2d, nb: int, chain: int, q_hi, q_lo, valid=None):
    """Returns (hit, pos, flag, info) for any query shape.

    ``valid`` (optional bool mask) routes masked-off lanes to bucket 0 so
    their gathers coalesce onto one cache line instead of scattering HBM
    traffic (results for those lanes are masked to miss)."""
    h = hash32(q_lo) ^ (hash32(q_hi) * U32(_MIX))
    b = (h & U32(nb - 1)).astype(jnp.int32)
    if valid is not None:
        b = jnp.where(valid, b, 0)
    S = table2d.shape[1] // 4
    found = jnp.zeros(q_hi.shape, bool)
    pos = jnp.zeros(q_hi.shape, U32)
    meta = jnp.zeros(q_hi.shape, U32)
    for c in range(chain):
        row = jnp.take(table2d, (b + c) % nb, axis=0)  # (..., S*4)
        row = row.reshape(q_hi.shape + (S, 4))
        occ = (row[..., 3] >> 31) != 0
        m = occ & (row[..., 0] == q_hi[..., None]) & (
            row[..., 1] == q_lo[..., None])
        anym = jnp.any(m, axis=-1)
        sel_pos = jnp.sum(jnp.where(m, row[..., 2], 0), axis=-1)
        sel_meta = jnp.sum(jnp.where(m, row[..., 3], 0), axis=-1)
        new = anym & ~found
        pos = jnp.where(new, sel_pos, pos)
        meta = jnp.where(new, sel_meta, meta)
        found = found | anym
    if valid is not None:  # rerouted lanes must read as misses
        found = found & valid
        pos = jnp.where(valid, pos, U32(0))
        meta = jnp.where(valid, meta, U32(0))
    flag = (meta & U32(0xFF)).astype(jnp.uint8)
    info = ((meta >> 16) & U32(0xFF)).astype(jnp.uint8)
    return found, pos, flag, info
