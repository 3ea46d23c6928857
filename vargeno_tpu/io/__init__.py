from . import fasta, fastq, vcf  # noqa: F401
