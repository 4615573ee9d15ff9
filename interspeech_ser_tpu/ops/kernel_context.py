"""Trace-time mesh context shared by Pallas kernel call sites.

A Pallas custom call does not auto-partition under GSPMD jit
(jit + NamedSharding). Engines that jit a *global* train step activate
this context around tracing; per-sample kernel call sites (the GRU
recurrence in ops/gru.py, the differentiable attention pair in
ops/attention_core.py) then wrap JUST the kernel call in a nested
``jax.shard_map`` over the mesh's 'data' axis. The surrounding loss and
optimizer math stays GSPMD-global, the batch-sharded operands are exact
per shard (the ops are per-sample along batch), and the replicated
weight/bias cotangents come back through shard_map's transpose psum —
gradient parity is pinned in tests/test_e2e_fusion.py and
tests/test_attention_bwd.py.
"""

from __future__ import annotations

import contextlib

_STACK: list = []


@contextlib.contextmanager
def kernel_mesh(mesh):
    """Activate ``mesh`` for kernel call sites during tracing.

    Pass ``None`` to explicitly deactivate (e.g. when the kernel opt-in
    itself is off) — call sites treat a ``None`` top-of-stack the same
    as an empty stack.
    """
    _STACK.append(mesh)
    try:
        yield
    finally:
        _STACK.pop()


def active_kernel_mesh():
    """The innermost active mesh, or None."""
    return _STACK[-1] if _STACK else None
