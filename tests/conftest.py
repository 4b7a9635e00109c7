"""Test configuration: virtual 8-device CPU mesh (SURVEY.md §4 implication).

Multi-chip sharding is validated on a virtual CPU mesh via
--xla_force_host_platform_device_count, the JAX analog of a fake
multi-node backend. Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session image pins an experimental TPU platform via config defaults
# that ignore JAX_PLATFORMS; override post-import (backends are lazy).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
