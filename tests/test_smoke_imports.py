"""Smoke tier: import every module of the package.

The smoke gate must touch every package module so a syntax error, missing
import, or accidental top-level side effect anywhere in the tree fails the
<5-min tier, not just the 50-min full suite. Pure import — no model is
built here; the deep smoke coverage lives in the per-module parity units.
"""

import importlib
import pkgutil

import interspeech_ser_tpu


def _walk(pkg):
    mods = []
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        mods.append(info.name)
    return mods


def test_import_every_package_module():
    failures = []
    mods = _walk(interspeech_ser_tpu)
    assert len(mods) > 30, f"package walk found only {len(mods)} modules"
    for name in mods:
        try:
            importlib.import_module(name)
        except Exception as e:  # collect all, report together
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "unimportable package modules:\n" + "\n".join(failures)
