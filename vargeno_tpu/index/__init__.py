from . import bloom, build, dictgen, store  # noqa: F401
