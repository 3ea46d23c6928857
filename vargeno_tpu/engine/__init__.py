from . import batch, device_index, search  # noqa: F401
