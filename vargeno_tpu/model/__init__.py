from . import calling  # noqa: F401
