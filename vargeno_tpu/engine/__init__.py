from . import batch, checkpoint, cohort, device_index, geno, search  # noqa: F401
