"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4). These env vars
must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient axon/tpu setting
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force it via the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
