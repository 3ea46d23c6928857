"""Bloom filter construction as bit-packed numpy/uint arrays.

Replicates the reference's single-hash Bloom filters (src/generate_bf.h:38-190,
src/generate_bf.cc:90-277) including their quirks:

- The ref filter keys on LO32 of every reference 32-mer through ``hash32``;
  its 9.6e9 bits exceed 2**32 so the modulo is the identity
  (src/generate_bf.cc:146-147, src/generate_bf.h:125-130, 201).
- A "lite" filter keyed on LO40 is also written but never loaded by `geno`
  (src/generate_bf.cc:102-105, 148-149).
- The SNP filter insertion loop DISCARDS the result of shift_kmer
  (src/generate_bf.cc:257), so what is actually inserted is hash40 of the
  LO40 of the 32-mer immediately LEFT of each SNP — once per SNP row that
  survives the filters and has a non-N ALT. This shipped bug is replicated
  because the expected outputs depend on it (SURVEY.md §6.1 item 1).
- The BF path parses FASTA with raw (un-normalized) sequences and full-header
  names, and compares REF bases case-sensitively (src/generate_bf.cc:230).

Bitmaps are stored LSB-first in uint64 words (bit i -> word i>>6, bit i&63),
matching sdsl::bit_vector's memory layout so the reference's .bf files can be
imported/exported losslessly; the same buffer reinterpreted as little-endian
uint32 words is what the TPU engine consumes.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..core.hashes import np_hash32, np_hash40
from ..core.kmer import np_rolling_kmers_u64, np_window_has_n
from ..io.fasta import Seq
from ..io.vcf import iter_vcf_rows

_LO40_MASK = np.uint64(0xFF_FFFF_FFFF)


@dataclasses.dataclass
class BitVector:
    bits: int
    words: np.ndarray  # (ceil(bits/64),) uint64, LSB-first

    @classmethod
    def zeros(cls, bits: int) -> "BitVector":
        return cls(bits=bits, words=np.zeros((bits + 63) // 64, np.uint64))

    def set_bits(self, idx: np.ndarray) -> None:
        idx = np.asarray(idx, dtype=np.uint64)
        from .. import native

        if idx.size > 4096 and native.available():
            native.bf_set_bits(self.words, idx)
            return
        w = (idx >> np.uint64(6)).astype(np.int64)
        m = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(self.words, w, m)

    def test_bits(self, idx: np.ndarray) -> np.ndarray:
        idx = np.asarray(idx, dtype=np.uint64)
        w = (idx >> np.uint64(6)).astype(np.int64)
        b = (idx & np.uint64(63)).astype(np.uint64)
        return ((self.words[w] >> b) & np.uint64(1)).astype(bool)

    def count_ones(self) -> int:
        # numpy>=2 has bitwise_count
        return int(np.bitwise_count(self.words).sum())

    def as_u32(self) -> np.ndarray:
        """Little-endian uint32 view preserving LSB-first bit order
        (bit i -> u32 word i>>5, bit i&31)."""
        return self.words.view("<u8").view("<u4")


def ref_bf_bits_from_kmers(kmers: np.ndarray, bits: int) -> np.ndarray:
    """Bit indices for ref-kmer insertion: hash32(LO32) % bits. At the
    reference geometry (9.6e9 bits > 2**32) the modulo is the identity."""
    lo = (kmers & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return np_hash32(lo).astype(np.uint64) % np.uint64(bits)


def lite_bf_bits_from_kmers(kmers: np.ndarray, bits: int) -> np.ndarray:
    lo40 = kmers & _LO40_MASK
    return np_hash40(lo40) % np.uint64(bits)


def snp_bf_bit_from_left_kmer(kmers: np.ndarray, bits: int) -> np.ndarray:
    lo40 = kmers & _LO40_MASK
    return np_hash40(lo40) % np.uint64(bits)


def build_ref_bfs(seqs: List[Seq], ref_bits: int, lite_bits: int):
    """constructBfFromGenomeseq (src/generate_bf.cc:90-168): every N-free
    32-mer of every raw sequence goes into the ref (LO32/hash32) and lite
    (LO40/hash40) filters. Non-ACGTN characters abort (encode_kmer's
    assert, src/util.c:104)."""
    ref_bf = BitVector.zeros(ref_bits)
    lite_bf = BitVector.zeros(lite_bits)
    for s in seqs:
        codes = s.codes_raw()
        if (codes > 4).any():
            bad = np.flatnonzero(codes > 4)[0]
            raise ValueError(
                f"invalid character {s.raw[bad:bad+1]!r} in sequence "
                f"{s.full_name!r} (reference would abort)")
        if s.size < 32:
            raise ValueError("sequence shorter than k (reference asserts)")
        roll = np_rolling_kmers_u64(codes)
        ok = ~np_window_has_n(codes)
        kmers = roll[ok]
        ref_bf.set_bits(ref_bf_bits_from_kmers(kmers, ref_bits))
        lite_bf.set_bits(lite_bf_bits_from_kmers(kmers, lite_bits))
    return ref_bf, lite_bf


def build_snp_bf(seqs: List[Seq], vcf_path: str, snp_bits: int) -> BitVector:
    """constructBfFromVcf (src/generate_bf.cc:179-277), with the shift_kmer
    discard quirk: per surviving row, a single insertion of the k-mer left
    of the SNP. Matching is by FULL fasta header names against
    'chr'-prefixed VCF chromosome names, with stale-sequence semantics when
    a chromosome is not found (the previous sequence stays active,
    src/generate_bf.cc:214-222)."""
    bf = BitVector.zeros(snp_bits)
    pre_chr_name = "XO"
    cur: Seq | None = None
    raw_cache = {}

    def raw_codes(s: Seq) -> np.ndarray:
        r = raw_cache.get(id(s))
        if r is None:
            r = s.codes_raw()
            raw_cache[id(s)] = r
        return r

    for row in iter_vcf_rows(vcf_path):
        chr_name = row.chrom
        if not chr_name.startswith("c"):
            chr_name = "chr" + chr_name
        if len(row.ref) > 1 or len(row.alt) > 1:
            continue
        if chr_name != pre_chr_name:
            for s in seqs:
                if s.full_name == chr_name:
                    cur = s
                    break
            pre_chr_name = chr_name
        seq_len = cur.size if cur is not None else 0
        pos = row.pos1 - 1
        if pos < 32 or (pos + 32) > seq_len:
            continue
        ref_nt = row.ref  # raw, case-sensitive compare (cc:230)
        alt_nt = row.alt
        if cur is None or chr(cur.raw[pos]) != ref_nt or ref_nt == alt_nt:
            continue
        codes = raw_codes(cur)
        left = codes[pos - 32 : pos]
        if (left > 4).any():
            raise ValueError("invalid character in k-mer (reference aborts)")
        if (left > 3).any():
            continue  # left k-mer contains N (cc:238-239)
        if alt_nt in ("N", "n"):
            continue  # i=0 next_base is N: break before any insertion
        if alt_nt not in "ACGTacgt":
            raise ValueError(
                f"ALT {alt_nt!r} would abort shift_kmer in the reference")
        kmer = np.uint64(0)
        c = left.astype(np.uint64)
        for j in range(32):
            kmer |= (c[j] & np.uint64(3)) << np.uint64(2 * j)
        bf.set_bits(snp_bf_bit_from_left_kmer(
            np.asarray([kmer], np.uint64), snp_bits))
    return bf
