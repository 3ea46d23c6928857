"""64-bit integer arithmetic as (hi, lo) uint32 pairs for TPU.

TPU vector units have no native 64-bit integer path (and Pallas/Mosaic kernels
cannot use them at all), so every 64-bit quantity in the device compute path is
carried as a pair of uint32 arrays ``(hi, lo)`` with value ``hi * 2**32 + lo``.

These helpers are pure jnp ops (add/mul/xor/shift on uint32), so they work both
in regular jitted code and inside Pallas kernels, and they vectorize over any
leading batch shape.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)


def u64(hi, lo):
    """Bundle a (hi, lo) pair; purely a documentation aid."""
    return (jnp.asarray(hi, _U32), jnp.asarray(lo, _U32))


def from_py(x: int):
    return (jnp.uint32((x >> 32) & 0xFFFFFFFF), jnp.uint32(x & 0xFFFFFFFF))


def xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def shr(a, n: int):
    """Logical right shift by a static amount 0 <= n < 64."""
    hi, lo = a
    if n == 0:
        return (hi, lo)
    if n < 32:
        new_lo = (lo >> n) | (hi << (32 - n))
        new_hi = hi >> n
        return (new_hi, new_lo)
    if n == 32:
        return (jnp.zeros_like(hi), hi)
    return (jnp.zeros_like(hi), hi >> (n - 32))


def shl(a, n: int):
    """Left shift (mod 2**64) by a static amount 0 <= n < 64."""
    hi, lo = a
    if n == 0:
        return (hi, lo)
    if n < 32:
        new_hi = (hi << n) | (lo >> (32 - n))
        new_lo = lo << n
        return (new_hi, new_lo)
    if n == 32:
        return (lo, jnp.zeros_like(lo))
    return (lo << (n - 32), jnp.zeros_like(lo))


def add(a, b):
    """(a + b) mod 2**64."""
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(_U32)
    hi = a[0] + b[0] + carry
    return (hi, lo)


def _mul32_wide(a, b):
    """Full 32x32 -> 64 multiply of uint32 arrays, via 16-bit limbs."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    # partial products, each < 2**32
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # mid = p01 + p10 + (p00 >> 16); may carry into bit 33
    mid = p01 + (p00 >> 16)
    carry1 = (mid < p01).astype(_U32)
    mid2 = mid + p10
    carry2 = (mid2 < mid).astype(_U32)
    lo = (p00 & _MASK16) | (mid2 << 16)
    hi = p11 + (mid2 >> 16) + ((carry1 + carry2) << 16)
    return (hi, lo)


def mul(a, b):
    """(a * b) mod 2**64 for two u64 pairs."""
    hi, lo = _mul32_wide(a[1], b[1])
    hi = hi + a[1] * b[0] + a[0] * b[1]
    return (hi, lo)


def mod_u31(a, m: int, nbits: int = 64):
    """a mod m where m is a static Python int < 2**31.

    Restoring binary long division over the top ``nbits`` bits of ``a``.
    Vector-friendly: ``nbits`` unrolled steps of shift/compare/subtract on
    uint32 lanes. Use a smaller ``nbits`` when the value is known to fit.
    """
    assert 0 < m < (1 << 31)
    hi, lo = a
    mm = jnp.uint32(m)
    r = jnp.zeros_like(lo)
    for i in range(nbits - 1, -1, -1):
        bit = ((hi >> (i - 32)) if i >= 32 else (lo >> i)) & jnp.uint32(1)
        r = (r << 1) | bit
        r = jnp.where(r >= mm, r - mm, r)
    return r


def to_u64_np(pair):
    """Host-side: reassemble a numpy uint64 from a (hi, lo) pair."""
    import numpy as np

    hi = np.asarray(pair[0], dtype=np.uint64)
    lo = np.asarray(pair[1], dtype=np.uint64)
    return (hi << np.uint64(32)) | lo
