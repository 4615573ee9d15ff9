"""Lightweight timing/observability utilities (SURVEY.md §5 'Tracing').

The reference's only profiling is bespoke ``perf_counter`` inference
timing with processed-audio-seconds accounting (reference:
benchmark/train_eval_files/eval_cat_ser.py:158-180, eval_dim_ser.py:159-162).
These helpers generalize that: a ``StepTimer`` accumulating named spans
(TPU-aware — forces a readback so tunnel-async dispatch can't fake the
numbers), an ``RTFMeter`` for inference-time-per-audio-second, and
``trace``/``annotate`` wrappers over ``jax.profiler`` for full XLA traces
viewable in XProf/TensorBoard or Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ser_tpu_trace", enabled: bool = True):
    """Capture a ``jax.profiler`` device trace around the wrapped block.

    Writes an XPlane/trace-event dump under ``log_dir`` (open with
    TensorBoard's profile plugin or Perfetto). Set
    ``SER_TPU_TRACE=/path`` in the environment to redirect, or
    ``SER_TPU_TRACE=0`` / ``enabled=False`` to turn capture into a no-op
    (so call sites can leave the context manager in place).
    """
    env = os.environ.get("SER_TPU_TRACE")
    if env == "0" or not enabled:
        yield
        return
    if env:
        log_dir = env
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named ``TraceAnnotation`` context — spans show up on the trace
    timeline inside a ``trace()`` capture (host side; device ops launched
    within inherit the annotation via XLA metadata)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulate wall-time per named span; TPU-safe when given an output.

    >>> timer = StepTimer()
    >>> with timer.span("forward", result_getter=lambda: logits):
    ...     logits = step(params, batch)
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, result_getter=None):
        t0 = time.perf_counter()
        with annotate(name):
            yield
        if result_getter is not None:
            # force a device readback: block_until_ready can return early
            # under tunneled runtimes (see utils docs / bench.py)
            import numpy as np

            out = result_getter()
            if out is not None:
                import jax

                leaf = jax.tree.leaves(out)[0]
                np.asarray(leaf).ravel()[:1]
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def report(self) -> str:
        parts = [
            f"{k}: total {self.totals[k]:.3f}s mean {self.mean(k) * 1000:.1f}ms "
            f"(n={self.counts[k]})"
            for k in sorted(self.totals)
        ]
        return "\n".join(parts)


class RTFMeter:
    """Inference-seconds per audio-second (the reference's eval printout)."""

    def __init__(self, sample_rate: int = 16000) -> None:
        self.sample_rate = sample_rate
        self.inference_s = 0.0
        self.audio_s = 0.0

    def add(self, inference_seconds: float, n_samples: Optional[int] = None,
            audio_seconds: Optional[float] = None) -> None:
        self.inference_s += inference_seconds
        if audio_seconds is not None:
            self.audio_s += audio_seconds
        elif n_samples is not None:
            self.audio_s += n_samples / self.sample_rate

    @property
    def rtf(self) -> float:
        return self.inference_s / self.audio_s if self.audio_s else 0.0

    def report(self) -> str:
        # matches the reference's wording (eval_dim_ser.py:159-162)
        return (
            f"Duration of whole dev+test set {self.audio_s} sec\n"
            f"Inference time {self.inference_s} sec\n"
            f"Inference time per sec {self.rtf} sec"
        )
