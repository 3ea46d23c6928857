"""Bloom-filter hash functions, device (uint32-pair) and host (numpy) forms.

The reference uses two hashes (src/generate_bf.h:125-142):

- ``hash32``: the well-known 32-bit avalanche (x>>16 ^ x) * 0x45d9f3b, twice,
  applied to the LOW 32 bits of a ref k-mer. The ref Bloom filter has
  9.6e9 bits (src/generate_bf.h:201), which exceeds 2**32, so
  ``hash32(x) % bits == hash32(x)`` -- the modulo is the identity.

- ``hash40``: the splitmix64 finalizer applied to the LOW 40 bits of a SNP
  k-mer, reduced modulo the SNP filter's 1.12e9 bits (src/generate_bf.h:203).

Both filters use a single hash probe (HASH_NUM=1, src/generate_bf.h:214).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import u64 as u64m

_U32 = jnp.uint32

_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB


def hash32(x):
    """Device hash32 over uint32 arrays (mod 2**32 wraparound)."""
    x = jnp.asarray(x, _U32)
    m = _U32(0x45D9F3B)
    x = ((x >> 16) ^ x) * m
    x = ((x >> 16) ^ x) * m
    return (x >> 16) ^ x


def hash40(hi, lo):
    """Device splitmix64 finalizer over (hi, lo) uint32-pair values.

    Returns the full 64-bit result as a (hi, lo) pair.
    """
    x = (jnp.asarray(hi, _U32), jnp.asarray(lo, _U32))
    x = u64m.xor(x, u64m.shr(x, 30))
    x = u64m.mul(x, u64m.from_py(_C1))
    x = u64m.xor(x, u64m.shr(x, 27))
    x = u64m.mul(x, u64m.from_py(_C2))
    x = u64m.xor(x, u64m.shr(x, 31))
    return x


def snp_bf_bit(hi, lo, snp_bf_bits: int):
    """Bit index into the SNP Bloom filter for a lo40 value given as a pair.

    ``hi`` must already be masked to the low 8 bits (lo40 = kmer & 0xFF_FFFFFFFF,
    src/util.h:25).
    """
    h = hash40(hi, lo)
    return u64m.mod_const(h, snp_bf_bits)


# --- host numpy mirrors ---

def np_hash32(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint32)
    with np.errstate(over="ignore"):
        m = np.uint32(0x45D9F3B)
        x = ((x >> np.uint32(16)) ^ x) * m
        x = ((x >> np.uint32(16)) ^ x) * m
        return (x >> np.uint32(16)) ^ x


def np_hash40(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(_C1)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(_C2)
        x = x ^ (x >> np.uint64(31))
    return x
