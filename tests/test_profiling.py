"""StepTimer / RTFMeter utilities."""

import os
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.utils.profiling import RTFMeter, StepTimer


class TestStepTimer:
    def test_spans_accumulate(self):
        t = StepTimer()
        for _ in range(3):
            with t.span("work"):
                time.sleep(0.01)
        assert t.counts["work"] == 3
        # lower bound is exact (3 x 10 ms sleeps); no upper bound — wall
        # time under a loaded host is unbounded and upper-bound asserts
        # flake when the suite shares the machine with other work
        assert t.totals["work"] > 0.02
        assert "work" in t.report()

    def test_result_getter_forces_readback(self):
        t = StepTimer()
        out = {}
        with t.span("device", result_getter=lambda: out.get("y")):
            out["y"] = jnp.ones((8, 8)) * 3
        assert t.counts["device"] == 1


class TestRTFMeter:
    def test_rtf(self):
        m = RTFMeter()
        m.add(0.5, n_samples=160000)  # 10 s audio
        m.add(0.5, audio_seconds=10.0)
        assert abs(m.audio_s - 20.0) < 1e-9
        assert abs(m.rtf - 0.05) < 1e-9
        assert "Inference time per sec" in m.report()
