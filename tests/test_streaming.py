"""Streaming extraction machinery: header planning, bounded queue,
failure handling, writer backpressure (extract/streaming.py)."""

import concurrent.futures as cf
import os
import threading
import time
import wave as wave_mod

import numpy as np
import pytest

from interspeech_ser_tpu.extract import streaming
from interspeech_ser_tpu.utils.audio import load_wav

RNG = np.random.default_rng(11)


def write_wav(path, n, sr=16000, width=2, channels=1):
    x = np.clip(RNG.normal(size=(n, channels)) * 0.1, -1, 1)
    pcm = (x * 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


class TestPlannedWavLen:
    @pytest.mark.parametrize("sr,n", [(16000, 12345), (8000, 9999), (44100, 30001), (22050, 7)])
    def test_header_len_matches_decode(self, tmp_path, sr, n):
        p = str(tmp_path / f"u_{sr}.wav")
        write_wav(p, n, sr=sr)
        y, _ = load_wav(p, target_sr=16000)
        assert streaming.planned_wav_len(p, 16000) == len(y)

    def test_stereo_header_len(self, tmp_path):
        p = str(tmp_path / "st.wav")
        write_wav(p, 4001, sr=16000, channels=2)
        y, _ = load_wav(p, target_sr=16000)
        assert streaming.planned_wav_len(p) == len(y) == 4001


class TestPlanBatches:
    def test_matches_inmemory_policy(self):
        # same greedy fill as the round-2 path: sort by len, cut when
        # (rows+1) * bucketed_len exceeds the budget
        items = [(f"u{i}", n) for i, n in enumerate([4000, 17000, 9500, 32001, 3000])]
        plan = streaming.plan_batches(items, token_budget=3 * 16000, bucket_quantum=16000)
        got = [(b.names, b.lengths) for b in plan]
        # sorted lens: 3000,4000,9500 (bucket 16k; 3 rows fills 48k budget),
        # then 17000 (bucket 32k → 1 row only: 2*32k > 48k), then 32001 (48k)
        assert got[0][0] == ["u4", "u0", "u2"]
        assert got[1][0] == ["u1"]
        assert got[2][0] == ["u3"]

    def test_stable_order_for_ties(self):
        items = [(f"u{i}", 5000) for i in range(6)]
        plan = streaming.plan_batches(items, token_budget=100 * 16000, bucket_quantum=16000)
        assert plan[0].names == [f"u{i}" for i in range(6)]


class TestBatchStream:
    def _loader(self, fail=()):
        def load(name):
            if name in fail:
                return None
            n = int(name.split("_")[1])
            return np.full(n, 0.5, np.float32)
        return load

    def test_rows_padded_and_masked(self):
        plan = [streaming.PlannedBatch(["a_300", "b_500"], [300, 500])]
        stream = streaming.BatchStream(self._loader(), plan, bucket_quantum=256,
                                       row_multiple=4, num_workers=2)
        (rb,) = list(stream)
        assert rb.wav.shape == (4, 512) and rb.names == ["a_300", "b_500"]
        np.testing.assert_array_equal(rb.mask.sum(axis=1), [300, 500, 0, 0])
        assert rb.lengths == [300, 500]

    def test_second_iteration_raises_not_hangs(self):
        plan = [streaming.PlannedBatch(["a_300"], [300])]
        stream = streaming.BatchStream(self._loader(), plan, bucket_quantum=256,
                                       num_workers=1)
        assert len(list(stream)) == 1
        with pytest.raises(RuntimeError, match="single-use"):
            next(iter(stream))

    def test_late_decode_failure_drops_row(self):
        plan = [streaming.PlannedBatch(["a_300", "bad_400", "c_200"], [300, 400, 200])]
        stream = streaming.BatchStream(self._loader(fail={"bad_400"}), plan,
                                       bucket_quantum=256, num_workers=2)
        (rb,) = list(stream)
        assert rb.names == ["a_300", "c_200"] and rb.n_failed == 1

    def test_fixed_len_truncates_but_reports_true_length(self):
        plan = [streaming.PlannedBatch(["a_900"], [900])]
        stream = streaming.BatchStream(self._loader(), plan, bucket_quantum=512,
                                       fixed_len=512, num_workers=1)
        (rb,) = list(stream)
        assert rb.wav.shape == (1, 512) and rb.lengths == [900]
        assert rb.mask[0].sum() == 512

    def test_consumer_abort_releases_producer(self):
        """Abandoning iteration mid-stream (device error in the consume
        loop) must not deadlock the producer on the full bounded queue —
        the thread and its decode pool must wind down."""
        plan = [
            streaming.PlannedBatch([f"u{i}_300"], [300]) for i in range(12)
        ]
        stream = streaming.BatchStream(
            self._loader(), plan, bucket_quantum=256, num_workers=2,
            queue_depth=1,
        )
        it = iter(stream)
        next(it)  # producer now races ahead and blocks on the full queue
        time.sleep(0.3)
        it.close()  # GeneratorExit at the yield — consumer gone
        stream._thread.join(timeout=5)
        assert not stream._thread.is_alive(), "producer leaked after abort"

    def test_bounded_queue_blocks_producer(self):
        """Producer can run at most queue_depth + 1 batches ahead."""
        n_batches = 8
        decoded = []

        def load(name):
            decoded.append(name)
            return np.zeros(100, np.float32)

        plan = [streaming.PlannedBatch([f"b{i}"], [100]) for i in range(n_batches)]
        stream = streaming.BatchStream(load, plan, bucket_quantum=128,
                                       num_workers=1, queue_depth=2)
        it = iter(stream)
        next(it)
        time.sleep(0.3)  # give the producer time to run ahead if unbounded
        # 1 consumed + 2 queued + 1 assembling + decode window(2) of lookahead
        assert len(decoded) <= 6, f"producer ran unbounded: {len(decoded)} decoded"
        rest = list(it)
        assert len(rest) == n_batches - 1

    def test_producer_exception_propagates(self):
        def load(name):
            raise MemoryError("boom")  # BaseException path, not skip-and-log

        plan = [streaming.PlannedBatch(["a"], [100])]
        stream = streaming.BatchStream(load, plan, bucket_quantum=128)
        with pytest.raises(MemoryError):
            list(stream)


class TestBoundedWriter:
    def test_backpressure_and_error_propagation(self, tmp_path):
        w = streaming.BoundedWriter(num_workers=2, window=2)
        inflight = []
        lock = threading.Lock()
        peak = [0]

        def slow_write(i):
            with lock:
                inflight.append(i)
                peak[0] = max(peak[0], len(inflight))
            time.sleep(0.05)
            with lock:
                inflight.remove(i)

        for i in range(10):
            w.submit(slow_write, i)
        w.drain()
        assert peak[0] <= 2

        w2 = streaming.BoundedWriter(num_workers=1, window=4)
        w2.submit(lambda: (_ for _ in ()).throw(IOError("disk full")))
        with pytest.raises(IOError):
            w2.drain()


class TestProfilingTrace:
    def test_trace_writes_artifacts_and_annotate_nests(self, tmp_path, monkeypatch):
        import jax.numpy as jnp

        from interspeech_ser_tpu.utils import profiling

        log_dir = str(tmp_path / "trace")
        with profiling.trace(log_dir):
            with profiling.annotate("unit_test_span"):
                x = jnp.ones((8, 8))
                float((x @ x).sum())
        found = []
        for root, _dirs, files in os.walk(log_dir):
            found += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
        assert found, f"no profiler artifacts under {log_dir}"

        # SER_TPU_TRACE=0 disables capture (no artifacts, no error)
        off_dir = str(tmp_path / "off")
        monkeypatch.setenv("SER_TPU_TRACE", "0")
        with profiling.trace(off_dir):
            pass
        assert not os.path.exists(off_dir)


class TestBoundedWriterFailFast:
    def test_error_surfaces_at_next_submit(self):
        """A persistent write failure must stop extraction at the next
        submit, not hours later at final drain (streaming.py review fix)."""
        w = streaming.BoundedWriter(num_workers=1, window=2)

        def boom():
            raise IOError("disk full")

        w.submit(boom)
        with pytest.raises(IOError):
            # the failing future settles asynchronously; submitting keeps
            # re-checking and must raise within a bounded number of tries
            for _ in range(200):
                w.submit(time.sleep, 0.005)
                time.sleep(0.005)
            pytest.fail("writer error never surfaced at submit()")

    def test_pending_list_stays_bounded(self):
        w = streaming.BoundedWriter(num_workers=4, window=4)
        for _ in range(200):
            w.submit(lambda: None)
        assert len(w._futs) <= 3 * w.window  # pruned, not O(corpus)
        w.drain()
