"""Post-compile collective audit over optimized HLO.

The multichip value-equality tests (1-dev == N-dev trajectories) cannot
distinguish a genuinely communicating mesh program from a silently
fully-replicated one — both produce identical numbers. This module closes
that gap: compile the production step, scan the optimized HLO for the
collective instructions the sharding story promises, and assert on their
operand volumes.

Used by ``tests/test_collectives.py`` and by
``__graft_entry__.dryrun_multichip``'s one-line collective audit.

Reference context: SURVEY.md §2.9 — the reference is single-GPU; the
data-parallel grad all-reduce over ICI is THE distributed story here, so
its presence (with ~param-count volume) is the thing worth proving.
"""

from __future__ import annotations

import re
from typing import Dict

# sync + async-start forms; -done carries no new volume and is skipped.
# all-to-all included: XLA:TPU can pick an all-to-all decomposition for
# sharded contractions, and a program communicating ONLY that way must
# not audit as 'NONE' (ADVICE r04).
COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

_INSTR_RE = re.compile(
    r"=\s*(?P<restype>\([^)]*\)|\S+)\s+"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?P<async>-start)?\("
)
_TYPED_SHAPE_RE = re.compile(
    r"(pred|bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|s64|u64)\[([0-9,]*)\]"
)


def _elements(dims_csv: str) -> int:
    if not dims_csv:
        return 1  # scalar
    n = 1
    for d in dims_csv.split(","):
        n *= int(d)
    return n


def collective_audit(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Count collective instructions + total result elements per op kind.

    Parses optimized-HLO lines of the form
    ``%all-reduce.3 = f32[8,16]{1,0} all-reduce(%dot.1), ...`` (the result
    type may be a tuple for combined/variadic collectives). ``*-done`` ops
    are ignored so async pairs are not double counted. Async ``*-start``
    result shapes differ BY OPCODE in XLA's AsyncCollectiveCreator:

    - ``all-reduce-start``: the shape IS the all-reduce result (a tuple of
      N results when combined) — no operand aliases, so ALL data shapes
      are counted. Halving here under-reported combined all-reduce volume
      by ~2× (review-found).
    - ``all-gather-start`` / ``collective-permute-start`` /
      ``reduce-scatter-start`` / ``all-to-all-start``: the tuple is
      ``(operand half, result half, u32 contexts)`` — control shapes are
      dropped and the trailing HALF of the remaining data shapes counted,
      matching the sync form. An odd data-shape count rounds toward
      counting MORE shapes, keeping ``elements >= n`` receipts sound.

    Known limitation: collectives wrapped in a generic ``async-start``
    computation (no opcode on the start line) are not counted; the CPU
    backend the tests run on emits the sync forms.
    """
    out = {k: {"count": 0, "elements": 0} for k in COLLECTIVE_OPS}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.search(line)
        if m is None:
            continue
        typed = _TYPED_SHAPE_RE.findall(m.group("restype"))  # [(dtype, dims)]
        if m.group("async"):
            data = [dims for dt, dims in typed
                    if dt not in ("u32", "s32", "u8", "pred")]
            if m.group("op") == "all-reduce":
                typed_dims = data  # result-only shape: count everything
            else:
                typed_dims = data[len(data) // 2:] if data \
                    else [dims for _, dims in typed][-1:]
        else:
            typed_dims = [dims for _, dims in typed]
        elems = sum(_elements(s) for s in typed_dims)
        rec = out[m.group("op")]
        rec["count"] += 1
        rec["elements"] += elems
    return out


def audit_line(hlo_text: str) -> str:
    """One-line human-readable audit summary for dryrun logs."""
    audit = collective_audit(hlo_text)
    parts = [
        f"{op}×{rec['count']} ({rec['elements']} elems)"
        for op, rec in audit.items()
        if rec["count"]
    ]
    return "collectives: " + (", ".join(parts) if parts else "NONE")


def param_elements(params) -> int:
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))


def lower_fusion_train_step(engine, t1: int = 12, t2: int = 8) -> str:
    """Lower the engine's PRODUCTION train step on a dummy batch → optimized HLO.

    Builds the same jitted step ``fit()`` uses (``_get_train_step``), with
    params/opt-state replicated and the batch sharded over 'data' exactly as
    ``_device_batch`` does, and returns ``compile().as_text()`` for
    :func:`collective_audit`. Shared by ``tests/test_collectives.py`` and
    the dryrun's collective-audit line.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .mesh import replicate, shard_batch

    cfg = engine.cfg
    if engine.params is None:
        engine.init_params()
    if getattr(engine, "tx", None) is None:
        engine.tx = engine.make_tx()  # the production recipe, not a copy
    opt_state = replicate(engine.mesh, engine.tx.init(engine.params))
    rng = np.random.default_rng(0)
    B = cfg.batch_size
    feats = [
        jnp.asarray(rng.normal(size=(B, t, d)).astype(np.float32))
        for t, d in zip((t1, t2), (cfg.feat1_dim, cfg.feat2_dim))
    ]
    masks = [jnp.ones((B, t), jnp.float32) for t in (t1, t2)]
    labels = jnp.zeros((B, cfg.num_emotions), jnp.float32).at[:, 0].set(1.0)
    smask = jnp.ones((B,), jnp.float32)
    feats, masks, labels, smask = shard_batch(
        engine.mesh, (feats, masks, labels, smask)
    )
    class_w = replicate(engine.mesh, jnp.ones((cfg.num_emotions,), jnp.float32))
    step = engine._get_train_step(tuple(f.shape for f in feats), True)
    return (
        step.lower(
            engine.params, opt_state, feats, masks, labels, smask, None,
            class_w, cfg.lr, jax.random.PRNGKey(0),
        )
        .compile()
        .as_text()
    )
