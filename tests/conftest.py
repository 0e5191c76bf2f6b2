"""Test configuration: 8 virtual CPU devices, float64.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``); physics validation runs in
float64.  Must run before the JAX backend initializes.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
