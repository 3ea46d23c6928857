#!/usr/bin/env python3
"""Generate the `mini` test fixture and (optionally) golden outputs by
running the reference vargeno binary on it.

The reference's own test blobs (test/chr22.fa, test/reads.fq) are missing
from its checkout (.MISSING_LARGE_BLOBS), so we synthesize a deterministic
miniature dataset that exercises every code path:
  - two chromosomes, N runs, soft-masked (lowercase) region, tandem repeats
    producing ambiguous k-mers with 2..10 and >10 copies;
  - VCF rows: normal SNPs with CAF, rows without CAF (stale freq_index
    quirk), indels / multi-allelic rows (filtered), ALT==REF rows, rows in
    repeats, adjacent SNP pairs, SNPs in the lowercase region (BF-path
    case-sensitivity divergence);
  - reads: 101bp, forward and reverse-complement, sequencing errors paired
    with low quality chars at kmer indices (neighbor-search trigger), reads
    with N, short reads, ultra-deep coverage at two sites (GQ saturation).

Usage: python tools/make_fixture.py [--out tests/fixtures/mini]
                                    [--ref-binary /tmp/refbuild/vargeno]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

BASES = np.array(list("ACGT"))


def make_genome(rng):
    n1, n2 = 60_000, 80_000
    c1 = rng.integers(0, 4, n1)
    c2 = rng.integers(0, 4, n2)

    # tandem repeat: 100bp x 15 copies in chr2 -> >10-copy ambiguous kmers
    unit15 = rng.integers(0, 4, 100)
    for i in range(15):
        c2[20_000 + i * 100 : 20_000 + (i + 1) * 100] = unit15
    # 80bp x 3 copies in chr1 -> 2..10-copy ambiguous kmers (aux rows)
    unit3 = rng.integers(0, 4, 80)
    for i in range(3):
        c1[30_000 + i * 80 : 30_000 + (i + 1) * 80] = unit3
    # another 60bp x 2 copies spanning both chromosomes
    unit2 = rng.integers(0, 4, 60)
    c1[45_000:45_060] = unit2
    c2[60_000:60_060] = unit2

    s1 = BASES[c1]
    s2 = BASES[c2]
    # N runs
    s1[10_000:10_050] = "N"
    s2[40_000:40_030] = "N"
    # soft-masked lowercase region in chr2
    s2[50_000:52_000] = np.char.lower(s2[50_000:52_000])
    return [("chr21m", s1), ("chr22m", s2)]


def write_fasta(path, seqs):
    with open(path, "w") as f:
        for name, arr in seqs:
            f.write(f">{name}\n")
            s = "".join(arr)
            for i in range(0, len(s), 70):
                f.write(s[i : i + 70] + "\n")


def pick_snp_sites(rng, seqs):
    """Returns list of dicts describing VCF rows (1-based pos)."""
    rows = []
    rs = 1000

    def add(chrom, pos0, ref, alt, info=None, caf=(0.9, 0.1)):
        nonlocal rs
        rs += 1
        if info is None:
            info = f"RS={rs};SAO=0;VC=SNV;CAF={caf[0]:.4g},{caf[1]:.4g};COMMON=1"
        rows.append(dict(chrom=chrom, pos=pos0 + 1, id=f"rs{rs}", ref=ref,
                         alt=alt, info=info))

    for ci, (name, arr) in enumerate(seqs):
        up = np.char.upper(arr)
        n = len(arr)
        # ~60 clean SNPs per chromosome at positions with no N nearby
        count = 0
        tries = 0
        while count < 60 and tries < 10_000:
            tries += 1
            p = int(rng.integers(64, n - 64))
            window = up[p - 32 : p + 32]
            if (window == "N").any():
                continue
            ref = str(up[p])
            alt = str(rng.choice([b for b in "ACGT" if b != ref]))
            caf1 = float(rng.choice([0.999, 0.99, 0.95, 0.9, 0.8, 0.6]))
            add(name, p, str(arr[p]) if False else ref, alt,
                caf=(caf1, 1 - caf1))
            count += 1

    name2, arr2 = seqs[1]
    up2 = np.char.upper(arr2)

    def refat(arr, p):
        return str(np.char.upper(arr[p]))

    # adjacent SNP pair (within one kmer window)
    p = 35_000
    add(name2, p, refat(arr2, p), "T" if refat(arr2, p) != "T" else "G")
    add(name2, p + 7, refat(arr2, p + 7),
        "A" if refat(arr2, p + 7) != "A" else "C")
    # SNPs inside the 15-copy repeat (>10 ambiguous kmers)
    p = 20_550
    add(name2, p, refat(arr2, p), "A" if refat(arr2, p) != "A" else "C")
    # SNP inside the 3-copy repeat
    name1, arr1 = seqs[0]
    p = 30_120
    add(name1, p, refat(arr1, p), "G" if refat(arr1, p) != "G" else "T")
    # SNPs in the soft-masked region (BF path diverges on case)
    for p in (50_500, 51_200):
        add(name2, p, refat(arr2, p), "A" if refat(arr2, p) != "A" else "C")
    # rows without CAF (stale freq_index quirk) - put after CAF rows
    p = 62_000
    add(name2, p, refat(arr2, p), "T" if refat(arr2, p) != "T" else "A",
        info="RS=9990;SAO=0;VC=SNV;COMMON=1")
    # indel rows (filtered out everywhere)
    p = 63_000
    add(name2, p, refat(arr2, p) + refat(arr2, p + 1), "A",
        info="RS=9991;VC=DIV")
    p = 63_100
    add(name2, p, refat(arr2, p), "AT", info="RS=9992;VC=DIV")
    # multi-allelic (ALT "A,T": len>1 -> filtered)
    p = 64_000
    r = refat(arr2, p)
    alts = ",".join([b for b in "ACGT" if b != r][:2])
    add(name2, p, r, alts, info="RS=9993;VC=SNV;CAF=0.8,0.1,0.1")
    # ALT == REF row (marked in snp_locations, no kmers)
    p = 65_000
    add(name2, p, refat(arr2, p), refat(arr2, p), info="RS=9994;VC=SNV")
    # SNP too close to the start (pos < 32: filtered)
    add(name1, 10, refat(arr1, 10), "A" if refat(arr1, 10) != "A" else "C",
        info="RS=9995;VC=SNV")
    # SNP whose covering window touches an N run (kmer gen aborts)
    p = 10_060  # chr1 N run is 10_000..10_049; left flank overlaps it
    add(name1, p, refat(arr1, p), "A" if refat(arr1, p) != "A" else "C",
        info="RS=9996;VC=SNV;CAF=0.9,0.1")
    # deep-coverage saturation sites
    for p in (55_000, 55_400):
        add(name2, p, refat(arr2, p), "C" if refat(arr2, p) != "C" else "G",
            caf=(0.99, 0.01))
    rows.sort(key=lambda r: (r["chrom"], r["pos"]))
    return rows


VCF_HEADER = """##fileformat=VCFv4.0
##fileDate=20260817
##source=mini-fixture
##INFO=<ID=RS,Number=1,Type=Integer,Description="dbSNP ID">
##INFO=<ID=SAO,Number=1,Type=Integer,Description="Variant Allele Origin">
##INFO=<ID=VC,Number=1,Type=String,Description="Variation Class">
##INFO=<ID=CAF,Number=.,Type=String,Description="Allele frequencies">
##INFO=<ID=COMMON,Number=1,Type=Integer,Description="Common SNP">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
"""
# NOTE: no ##FORMAT lines and no FORMAT/DONOR columns: the reference's VCF
# rewrite only supports this shape (its has_gt branch dereferences
# gq_index=-1, src/qv.cc:1699-1716, and segfaults); its own test/snp.vcf is
# 8-column without FORMAT headers.


def write_vcf(path, rows):
    with open(path, "w") as f:
        f.write(VCF_HEADER)
        for r in rows:
            f.write(f"{r['chrom']}\t{r['pos']}\t{r['id']}\t{r['ref']}\t"
                    f"{r['alt']}\t.\t.\t{r['info']}\n")


COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def simulate_reads(rng, seqs, rows, n_reads=20_000, read_len=101):
    """Sample reads with genotypes, errors, revcomp, N's, low-qual chars."""
    genomes = {name: np.char.upper(arr).copy() for name, arr in seqs}
    # assign a true genotype to each usable SNP row
    gts = {}
    for r in rows:
        if len(r["ref"]) != 1 or len(r["alt"]) != 1 or r["ref"] == r["alt"]:
            continue
        gts[(r["chrom"], r["pos"])] = int(rng.choice([0, 1, 2],
                                                     p=[0.55, 0.25, 0.20]))
    reads = []
    names = [n for n, _ in seqs]
    lens = {n: len(a) for n, a in seqs}
    deep_sites = [("chr22m", 55_001), ("chr22m", 55_401)]

    def sample_one(chrom=None, center=None, deep=False):
        if chrom is None:
            chrom = names[int(rng.integers(0, 2))]
        n = lens[chrom]
        if center is None:
            start = int(rng.integers(0, n - read_len))
        else:
            lo = max(0, center - read_len + 5)
            hi = min(n - read_len, center - 5)
            if hi <= lo:
                start = lo
            else:
                start = int(rng.integers(lo, hi))
        hap = int(rng.integers(0, 2))
        seq = genomes[chrom][start : start + read_len].copy()
        # apply SNP alleles by genotype
        for r in rows:
            if r["chrom"] != chrom:
                continue
            p0 = r["pos"] - 1
            if not (start <= p0 < start + read_len):
                continue
            gt = gts.get((r["chrom"], r["pos"]))
            if gt is None:
                continue
            use_alt = (gt == 2) or (gt == 1 and hap == 1)
            if use_alt and len(r["alt"]) == 1:
                seq[p0 - start] = r["alt"]
        qual = np.full(read_len, "I")
        # sequencing errors: ~1.5% of reads get one error in a random kmer,
        # with a low quality char at that kmer index
        if rng.random() < 0.15:
            kidx = int(rng.integers(0, 3))
            epos = int(rng.integers(kidx * 32, (kidx + 1) * 32))
            old = seq[epos]
            if old in "ACGT":
                seq[epos] = rng.choice([b for b in "ACGT" if b != old])
                qual[kidx] = "0"  # < '8': triggers neighbor search
        # a few reads get low qual without error
        elif rng.random() < 0.05:
            qual[int(rng.integers(0, 3))] = "."
        s = "".join(seq)
        if rng.random() < 0.5:
            s = "".join(COMP[c] for c in reversed(s))
        return s, "".join(qual)

    for i in range(n_reads):
        s, q = sample_one()
        reads.append((f"@r{i}", s, q))
    # deep coverage at saturation sites (need >63 agreeing reads)
    j = n_reads
    for chrom, pos in deep_sites:
        for _ in range(220):
            s, q = sample_one(chrom, pos - 1, deep=True)
            reads.append((f"@r{j}", s, q))
            j += 1
    # special reads
    reads.append((f"@r{j}", "ACGT" * 7, "I" * 28)); j += 1  # <32bp
    noisy = list("ACGTN" * 21)[:101]
    reads.append((f"@r{j}", "".join(noisy), "I" * 101)); j += 1  # has N
    s, q = sample_one()
    reads.append((f"@r{j}", s[:80], q[:80])); j += 1  # len not multiple of 32
    return reads


def write_fastq(path, reads):
    with open(path, "w") as f:
        for name, seq, qual in reads:
            f.write(f"{name}\n{seq}\n+\n{qual}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/mini")
    ap.add_argument("--ref-binary", default="/tmp/refbuild/vargeno")
    ap.add_argument("--n-reads", type=int, default=20_000)
    ap.add_argument("--skip-golden", action="store_true")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(20260817)
    seqs = make_genome(rng)
    write_fasta(os.path.join(args.out, "genome.fa"), seqs)
    rows = pick_snp_sites(rng, seqs)
    write_vcf(os.path.join(args.out, "snps.vcf"), rows)
    reads = simulate_reads(rng, seqs, rows, n_reads=args.n_reads)
    write_fastq(os.path.join(args.out, "reads.fq"), reads)
    print(f"fixture inputs written to {args.out}: "
          f"{len(rows)} VCF rows, {len(reads)} reads")

    if args.skip_golden:
        return
    if not os.path.exists(args.ref_binary):
        print("reference binary not found; skipping goldens", file=sys.stderr)
        return

    # run the reference in a scratch dir (BF files are large)
    scratch = "/tmp/fixture_golden"
    os.makedirs(scratch, exist_ok=True)
    prefix = os.path.join(scratch, "mini")
    subprocess.run(
        [args.ref_binary, "index",
         os.path.join(args.out, "genome.fa"),
         os.path.join(args.out, "snps.vcf"), prefix],
        check=True)
    subprocess.run(
        [args.ref_binary, "geno", prefix,
         os.path.join(args.out, "reads.fq"),
         os.path.join(args.out, "snps.vcf"),
         os.path.join(args.out, "golden_output.vcf")],
        check=True)

    # persist compact goldens: dicts are small, BFs stored as set-bit indices
    import shutil
    for ext in (".ref.dict", ".snp.dict", ".chrlens"):
        shutil.copy(prefix + ext, os.path.join(args.out, "golden" + ext))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from vargeno_tpu.index.store import read_sdsl_bf

    def set_bits(bv):
        nz = np.flatnonzero(bv.words)
        w = bv.words[nz]
        bits = np.unpackbits(w.view(np.uint8),
                             bitorder="little").reshape(len(nz), 64)
        rows_, cols = np.nonzero(bits)
        return np.sort(nz[rows_].astype(np.uint64) * np.uint64(64)
                       + cols.astype(np.uint64))

    for name in ("ref.bf", "snp.bf", "ref.bf.lite.bf"):
        bv = read_sdsl_bf(prefix + "." + name)
        idx = set_bits(bv)
        np.savez_compressed(
            os.path.join(args.out, f"golden_{name.replace('.', '_')}.npz"),
            bits=np.uint64(bv.bits), set_bits=idx)
        print(f"{name}: {bv.bits} bits, {idx.size} set")
    print("goldens written")


if __name__ == "__main__":
    main()
