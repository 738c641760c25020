"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: harness presets JAX_PLATFORMS=axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers the 'axon' TPU backend and
# overrides JAX_PLATFORMS; jax.config wins over both.
import jax

jax.config.update("jax_platforms", "cpu")
