"""Vectorized binary search over (hi, lo) uint32-pair sorted key arrays.

Replaces the reference's jumpgate + bsearch (src/qv.cc:194-264) with a
branchless lower-bound over the full sorted dictionary: ~ceil(log2 n) rounds
of gather + compare, batched over every query lane at once. Works identically
in jitted XLA code and (later) inside Pallas kernels.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_I32 = jnp.int32
_U32 = jnp.uint32


def lower_bound(keys_hi, keys_lo, q_hi, q_lo):
    """Leftmost index i with keys[i] >= (q_hi, q_lo); n if none.

    keys_*: (n,) uint32 sorted by (hi, lo) lexicographic.
    q_*: any shape of uint32 queries. Returns int32 of the query shape.
    """
    n = keys_hi.shape[0]
    lo = jnp.zeros(q_hi.shape, _I32)
    if n == 0:
        return lo
    hi = jnp.full(q_hi.shape, n, _I32)
    for _ in range(max(1, math.ceil(math.log2(max(n, 2))) + 1)):
        mid = (lo + hi) >> 1
        khi = keys_hi[mid]
        klo = keys_lo[mid]
        less = (khi < q_hi) | ((khi == q_hi) & (klo < q_lo))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


def exact_query(keys_hi, keys_lo, q_hi, q_lo):
    """(row, hit): row = match index (int32, clamped), hit = bool."""
    n = keys_hi.shape[0]
    i = lower_bound(keys_hi, keys_lo, q_hi, q_lo)
    if n == 0:
        return i, jnp.zeros(q_hi.shape, bool)
    ic = jnp.minimum(i, n - 1)
    hit = (i < n) & (keys_hi[ic] == q_hi) & (keys_lo[ic] == q_lo)
    return ic, hit


def block_bounds_hi32(keys_hi, keys_lo, q_hi):
    """[start, end) of rows whose hi32 equals q_hi (the ref jumpgate block,
    src/qv.cc:242-264)."""
    n = keys_hi.shape[0]
    zeros = jnp.zeros(q_hi.shape, _U32)
    start = lower_bound(keys_hi, keys_lo, q_hi, zeros)
    nxt = q_hi + _U32(1)
    end = lower_bound(keys_hi, keys_lo, nxt, zeros)
    end = jnp.where(q_hi == _U32(0xFFFFFFFF), n, end)
    return start, end


def block_bounds_hi24(keys_hi, keys_lo, q_hi24):
    """[start, end) of rows whose hi24 (top 24 bits of hi32) equals q_hi24
    (the snp jumpgate block, src/qv.cc:385-411)."""
    n = keys_hi.shape[0]
    zeros = jnp.zeros(q_hi24.shape, _U32)
    start = lower_bound(keys_hi, keys_lo, q_hi24 << 8, zeros)
    end = lower_bound(keys_hi, keys_lo, (q_hi24 + _U32(1)) << 8, zeros)
    end = jnp.where(q_hi24 == _U32(0xFFFFFF), n, end)
    return start, end


def bitmap_test(bitmap_u32, pos):
    """Test bit ``pos`` (uint32 positions) of an LSB-first u32 bitmap; out of
    range reads clamp to the last word (callers must bound pos)."""
    word = (pos >> 5).astype(_I32)
    nb = bitmap_u32.shape[0]
    inb = word < nb
    w = bitmap_u32[jnp.minimum(word, nb - 1)]
    return inb & (((w >> (pos & _U32(31))) & _U32(1)) != 0)
