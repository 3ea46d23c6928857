from . import bloom, build, dictgen, filt, store  # noqa: F401
