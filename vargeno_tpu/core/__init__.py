from . import hashes, kmer, u64  # noqa: F401
