"""vargeno_tpu: a TPU-native, alignment-free SNP genotyping framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of
medvedevgroup/vargeno: `index` builds 32-mer reference/SNP dictionaries and
Bloom filters from FASTA+VCF; `geno` streams FASTQ reads in fixed-shape
batches through a batched TPU lookup/vote/pileup engine and writes GT/GQ
calls into the input VCF.
"""

__version__ = "0.1.0"

from .config import DEFAULT_CONFIG, GenoConfig  # noqa: F401
