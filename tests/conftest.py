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


# --- smoke / integration tiers (pytest.ini declares the markers) ---------
#
# `pytest -m smoke` is the per-commit gate: fast parity/format/unit modules,
# measured ~4 min total on the 8-device CPU mesh. Everything else (engine
# epochs, determinism, golden model parity, multichip trajectories) is
# `integration`; the FULL suite remains the round gate. Assignment is
# per-module here — one list to maintain — plus the AuditParser units from
# the otherwise-slow collectives module.

_SMOKE_MODULES = {
    "test_losses",
    "test_utils",
    "test_ops_parity",
    "test_gru_kernel",
    "test_conv_frontend_kernel",
    "test_native_audio",
    "test_profiling",
    "test_fusion_parity",
    "test_data_lengths",
    "test_flash_attention",
    "test_smoke_imports",
    "test_spm",
    "test_benchsuite",
}
_SMOKE_CLASSES = {"TestAuditParser"}  # fast canned-HLO units in test_collectives


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        cls = item.cls.__name__ if item.cls is not None else ""
        if mod in _SMOKE_MODULES or cls in _SMOKE_CLASSES:
            item.add_marker(pytest.mark.smoke)
        else:
            item.add_marker(pytest.mark.integration)
