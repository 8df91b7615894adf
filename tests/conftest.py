"""Test config: run JAX on a virtual 8-device CPU mesh so CI needs no TPU."""

import os

# Must be set before jax is imported anywhere. Force-override: the session
# environment pins JAX_PLATFORMS to the TPU tunnel, but unit tests must run
# on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
