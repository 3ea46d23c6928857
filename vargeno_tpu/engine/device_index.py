"""Device-resident index: every dictionary/Bloom/site array as jnp tensors.

K-mers are (hi, lo) uint32 pairs (no 64-bit integers on the TPU vector path;
see core.kmer). Dictionaries stay sorted by the u64 key, i.e. by (hi, lo)
lexicographically; jumpgates are unnecessary on TPU -- block bounds come from
binary search over the same sorted arrays (replacing the reference's 16 GiB
2^32-entry jumpgate, src/qv.cc:528-584, with O(log n) searches).

The Bloom filters are bit-packed uint32 words (LSB-first), identical bit
positions to the reference's sdsl bit_vectors.

``site_bitmap`` is a genome-positions bitmap used for the O(1) neighbor
suppression check (pileup_table[pos].ref/alt != 0, src/qv.cc:990-992);
``site_pos`` + per-site arrays drive the final scatter/call stage.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..index.store import VarGenoIndex


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceIndex:
    # ref dictionary
    ref_hi: jax.Array      # (n,) u32
    ref_lo: jax.Array      # (n,) u32
    ref_pos: jax.Array     # (n,) u32
    ref_flag: jax.Array    # (n,) u8
    ref_aux: jax.Array     # (m, 10) u32
    # snp dictionary
    snp_hi: jax.Array
    snp_lo: jax.Array
    snp_pos: jax.Array
    snp_info: jax.Array    # (n,) u8
    snp_flag: jax.Array
    snp_aux_pos: jax.Array  # (ms, 10) u32
    snp_aux_snp: jax.Array  # (ms, 10) u8
    # Bloom filters (u32 words, LSB-first)
    ref_bf: jax.Array
    snp_bf: jax.Array
    # SNP sites (sorted by position)
    site_pos: jax.Array    # (s,) u32
    site_ref: jax.Array    # (s,) u8
    site_alt: jax.Array    # (s,) u8
    site_bitmap: jax.Array  # (ceil((max_pos+33)/32),) u32
    site_rank: jax.Array   # (nwords,) i32: # of site bits before each word
    # (succinct rank directory: site_id(pos) = site_rank[pos>>5] +
    #  popcount(bitmap[pos>>5] & low_mask), replacing binary search in the
    #  pileup scatter -- the TPU analog of sdsl's rank_support_v)
    site_dir: jax.Array    # (nwords, 2) u32 [bitmap_word, rank]: one-gather
    site_ra: jax.Array     # (s,) u32 ref | alt<<8: one-gather allele pair
    # bucketized hash tables for exact lookups (engine.hashtable)
    ref_ht: jax.Array      # (nb_r, 32) u32
    snp_ht: jax.Array      # (nb_s, 32) u32
    # full-key membership prefilters (engine.hashtable.prefilter_*):
    # sparse probe sets test one bit before paying the bucket-chain gathers
    ref_pf: jax.Array      # (pf_bits/32,) u32
    snp_pf: jax.Array
    # block directories: hi32 -> (block start, size) for the ref jumpgate
    # blocks and hi24 -> (start, size) for snp blocks; replaces two
    # log2(n)-deep binary searches per block query with one bucket gather
    ref_bd: jax.Array      # (nb, 32) u32 hash table keyed (hi32, 0)
    snp_bd: jax.Array      # keyed (hi24, 0)
    # static metadata
    snp_bf_bits: int = dataclasses.field(metadata=dict(static=True))
    ref_bf_bits: int = dataclasses.field(metadata=dict(static=True))
    ref_ht_nb: int = dataclasses.field(metadata=dict(static=True))
    ref_ht_chain: int = dataclasses.field(metadata=dict(static=True))
    snp_ht_nb: int = dataclasses.field(metadata=dict(static=True))
    snp_ht_chain: int = dataclasses.field(metadata=dict(static=True))
    ref_pf_bits: int = dataclasses.field(metadata=dict(static=True))
    snp_pf_bits: int = dataclasses.field(metadata=dict(static=True))
    ref_bd_nb: int = dataclasses.field(metadata=dict(static=True))
    ref_bd_chain: int = dataclasses.field(metadata=dict(static=True))
    snp_bd_nb: int = dataclasses.field(metadata=dict(static=True))
    snp_bd_chain: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_ref(self) -> int:
        return self.ref_hi.shape[0]

    @property
    def n_snp(self) -> int:
        return self.snp_hi.shape[0]

    @property
    def n_sites(self) -> int:
        return self.site_pos.shape[0]


def build_device_index(index: VarGenoIndex) -> DeviceIndex:
    ref_k = index.ref.kmers
    snp_k = index.snp.kmers
    sites = index.sites

    max_pos = int(index.ref.pos[index.ref.flag == 0].max(initial=0))
    if sites.pos.size:
        max_pos = max(max_pos, int(sites.pos.max()))
    nbits = max_pos + 33
    bitmap = np.zeros((nbits + 31) // 32, np.uint32)
    # only sites with ref != alt suppress (ref==0 && alt==0 is "no snp");
    # seeded sites always have ref != alt, so every site sets its bit
    sp = sites.pos.astype(np.int64)
    np.bitwise_or.at(bitmap, sp >> 5,
                     (np.uint32(1) << (sp & 31).astype(np.uint32)))
    pc = np.bitwise_count(bitmap).astype(np.int64)
    site_rank = np.concatenate([[0], np.cumsum(pc)[:-1]]).astype(np.int32)
    site_dir = np.stack([bitmap, site_rank.view(np.uint32)], axis=1)

    def u32pair(k):
        return ((k >> np.uint64(32)).astype(np.uint32),
                (k & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    ref_hi, ref_lo = u32pair(ref_k)
    snp_hi, snp_lo = u32pair(snp_k)

    # The engine gathers from these arrays unconditionally; give empty
    # dictionaries one sentinel row (kmer 0xFF..FF, pos=POS_AMBIGUOUS) that
    # can never produce an event, and empty aux tables a zero row.
    def pad1(a, fill):
        if a.shape[0] == 0:
            return np.full((1,) + a.shape[1:], fill, a.dtype)
        return a

    ref_pos_a, ref_flag_a, ref_aux_a = index.ref.pos, index.ref.flag, \
        index.ref.aux
    snp_pos_a, snp_info_a, snp_flag_a = (index.snp.pos, index.snp.snp,
                                         index.snp.flag)
    snp_aux_pos_a, snp_aux_snp_a = index.snp.aux_pos, index.snp.aux_snp
    if ref_hi.shape[0] == 0:
        ref_hi = pad1(ref_hi, 0xFFFFFFFF)
        ref_lo = pad1(ref_lo, 0xFFFFFFFF)
        ref_pos_a = pad1(ref_pos_a, 0xFFFFFFFF)
        ref_flag_a = pad1(ref_flag_a, 1)
    if snp_hi.shape[0] == 0:
        snp_hi = pad1(snp_hi, 0xFFFFFFFF)
        snp_lo = pad1(snp_lo, 0xFFFFFFFF)
        snp_pos_a = pad1(snp_pos_a, 0xFFFFFFFF)
        snp_info_a = pad1(snp_info_a, 0)
        snp_flag_a = pad1(snp_flag_a, 1)
    ref_aux_a = pad1(ref_aux_a, 0)
    snp_aux_pos_a = pad1(snp_aux_pos_a, 0)
    snp_aux_snp_a = pad1(snp_aux_snp_a, 0)
    site_pos_a = pad1(sites.pos, 0xFFFFFFFF)
    site_ref_a = pad1(sites.ref, 0)
    site_alt_a = pad1(sites.alt, 0)
    site_ra = (site_ref_a.astype(np.uint32)
               | (site_alt_a.astype(np.uint32) << np.uint32(8)))

    from .hashtable import build_hash_table

    ref_tab = build_hash_table(ref_hi, ref_lo, ref_pos_a, ref_flag_a, None)
    snp_tab = build_hash_table(snp_hi, snp_lo, snp_pos_a, snp_flag_a,
                               snp_info_a)

    def block_directory(keys_hi):
        """hi -> (start_row u32 in pos, size u16 packed in flag|info<<8)."""
        uniq, start, count = np.unique(keys_hi, return_index=True,
                                       return_counts=True)
        size = np.minimum(count, 0xFFFF).astype(np.uint32)
        return build_hash_table(
            uniq.astype(np.uint32), np.zeros_like(uniq, np.uint32),
            start.astype(np.uint32), (size & 0xFF).astype(np.uint8),
            ((size >> 8) & 0xFF).astype(np.uint8))

    ref_bd = block_directory(ref_hi)
    snp_bd = block_directory(snp_hi >> 8)

    from .hashtable import prefilter_bits

    def pf_size(n):
        # ~32 bits per key, power of two, min 1 Mbit
        b = 1 << max(20, int(np.ceil(np.log2(max(n, 1) * 32))))
        return min(b, 1 << 33)

    ref_pf_bits = pf_size(ref_hi.shape[0])
    snp_pf_bits = pf_size(snp_hi.shape[0])
    ref_pf = prefilter_bits(ref_hi, ref_lo, ref_pf_bits)
    snp_pf = prefilter_bits(snp_hi, snp_lo, snp_pf_bits)

    dev = jax.device_put
    return DeviceIndex(
        ref_ht=dev(ref_tab.table), snp_ht=dev(snp_tab.table),
        ref_ht_nb=ref_tab.nb, ref_ht_chain=ref_tab.chain,
        snp_ht_nb=snp_tab.nb, snp_ht_chain=snp_tab.chain,
        ref_pf=dev(ref_pf), snp_pf=dev(snp_pf),
        ref_pf_bits=ref_pf_bits, snp_pf_bits=snp_pf_bits,
        ref_bd=dev(ref_bd.table), snp_bd=dev(snp_bd.table),
        ref_bd_nb=ref_bd.nb, ref_bd_chain=ref_bd.chain,
        snp_bd_nb=snp_bd.nb, snp_bd_chain=snp_bd.chain,
        ref_hi=dev(ref_hi), ref_lo=dev(ref_lo),
        ref_pos=dev(ref_pos_a), ref_flag=dev(ref_flag_a),
        ref_aux=dev(ref_aux_a),
        snp_hi=dev(snp_hi), snp_lo=dev(snp_lo),
        snp_pos=dev(snp_pos_a), snp_info=dev(snp_info_a),
        snp_flag=dev(snp_flag_a),
        snp_aux_pos=dev(snp_aux_pos_a),
        snp_aux_snp=dev(snp_aux_snp_a),
        ref_bf=dev(index.ref_bf.as_u32()),
        snp_bf=dev(index.snp_bf.as_u32()),
        site_pos=dev(site_pos_a), site_ref=dev(site_ref_a),
        site_alt=dev(site_alt_a),
        site_bitmap=dev(bitmap),
        site_rank=dev(site_rank),
        site_dir=dev(site_dir),
        site_ra=dev(site_ra),
        snp_bf_bits=index.snp_bf.bits,
        ref_bf_bits=index.ref_bf.bits,
    )
