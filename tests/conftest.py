"""Test harness: force JAX onto a virtual 8-device CPU platform.

The image's sitecustomize registers the axon TPU plugin and pins
``jax_platforms="axon,cpu"`` at interpreter start, so the env-var route is
overridden; instead we flip the config back to cpu right here, before any
backend client is created. The XLA flag must also land before the CPU
backend initializes so multi-chip sharding paths compile + execute without
TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
