"""Synthetic dataset + index generation for tests, dryruns and benchmarks."""

from __future__ import annotations

import os
import tempfile

import numpy as np

from .config import GenoConfig
from .index import bloom, dictgen, store
from .io import fasta as fasta_io

_BASES = np.array(list("ACGT"))


def synth_genome(rng, sizes=(20_000,), names=("chrS1",)):
    out = []
    for n, name in zip(sizes, names):
        out.append((name, _BASES[rng.integers(0, 4, n)]))
    return out


def write_inputs(tmpdir: str, rng, genome, n_snps=40, n_reads=2000,
                 read_len=101, err_frac=0.15):
    fa = os.path.join(tmpdir, "genome.fa")
    with open(fa, "w") as f:
        for name, arr in genome:
            f.write(f">{name}\n")
            s = "".join(arr)
            for i in range(0, len(s), 70):
                f.write(s[i:i + 70] + "\n")

    rows = []
    gts = {}
    for j in range(n_snps):
        ci = int(rng.integers(0, len(genome)))
        name, arr = genome[ci]
        p = int(rng.integers(64, len(arr) - 64))
        ref = str(arr[p])
        alt = str(rng.choice([b for b in "ACGT" if b != ref]))
        caf = float(rng.choice([0.99, 0.9, 0.7]))
        rows.append((name, p + 1, f"rs{j}", ref, alt,
                     f"RS={j};CAF={caf:.4g},{1-caf:.4g}"))
        gts[(name, p)] = int(rng.choice([0, 1, 2], p=[0.5, 0.3, 0.2]))
    rows.sort(key=lambda r: (r[0], r[1]))
    vcf = os.path.join(tmpdir, "snps.vcf")
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.0\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r[:5]) + f"\t.\t.\t{r[5]}\n")

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    fq = os.path.join(tmpdir, "reads.fq")
    with open(fq, "w") as f:
        for i in range(n_reads):
            ci = int(rng.integers(0, len(genome)))
            name, arr = genome[ci]
            start = int(rng.integers(0, len(arr) - read_len))
            hap = int(rng.integers(0, 2))
            seq = arr[start:start + read_len].copy()
            for (cn, p), gt in gts.items():
                if cn == name and start <= p < start + read_len:
                    if gt == 2 or (gt == 1 and hap == 1):
                        for r in rows:
                            if r[0] == cn and r[1] == p + 1:
                                seq[p - start] = r[4]
            qual = ["I"] * read_len
            if rng.random() < err_frac:
                kidx = int(rng.integers(0, read_len // 32))
                ep = int(rng.integers(kidx * 32, (kidx + 1) * 32))
                seq[ep] = rng.choice([b for b in "ACGT" if b != seq[ep]])
                qual[kidx] = "0"
            s = "".join(seq)
            if rng.random() < 0.5:
                s = "".join(comp[c] for c in reversed(s))
            f.write(f"@r{i}\n{s}\n+\n" + "".join(qual) + "\n")
    return fa, vcf, fq


def build_synth_index(fa, vcf, ref_bf_bits=1 << 20, snp_bf_bits=1 << 18,
                      lite_bits=64):
    """Small Bloom geometry for tests (full 9.6Gb filters are benchmark-only).

    Note: non-reference BF sizes change pruning decisions, so outputs are
    only comparable against an oracle using the SAME geometry -- which the
    oracle supports, since sizes live in the index."""
    seqs = fasta_io.parse_fasta(fa)
    ref_bf, _ = bloom.build_ref_bfs(seqs, ref_bf_bits, lite_bits)
    snp_bf = bloom.build_snp_bf(seqs, vcf, snp_bf_bits)
    snp_dict, locs = dictgen.build_snp_dict_from_vcf(seqs, vcf)
    ref_dict, _ = dictgen.build_ref_dict(seqs)
    return store.VarGenoIndex(
        ref=ref_dict, snp=snp_dict, ref_bf=ref_bf, snp_bf=snp_bf,
        chrlens=[(s.name, s.size) for s in seqs],
        sites=store.derive_sites(snp_dict), snp_locations=locs)


def make_synthetic(seed=0, tmpdir=None, **kw):
    rng = np.random.default_rng(seed)
    tmpdir = tmpdir or tempfile.mkdtemp(prefix="vgt_synth_")
    genome = synth_genome(rng, kw.pop("sizes", (20_000,)),
                          kw.pop("names", ("chrS1",)))
    fa, vcf, fq = write_inputs(tmpdir, rng, genome, **kw)
    index = build_synth_index(fa, vcf)
    return index, fa, vcf, fq
