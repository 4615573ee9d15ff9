"""Perf-ledger suite comparator (utils/benchsuite.py) — pure-function units.

The regression guard must fail loudly on out-of-band moves in either
direction convention (throughput up-is-good, ms/step down-is-good), stay
quiet inside the noise band, and treat coverage changes as notes."""

from interspeech_ser_tpu.utils.benchsuite import (
    compare_suites,
    format_table,
    metric_entry,
)


def _suite(**metrics):
    return {"metrics": metrics}


class TestMetricEntry:
    def test_band_from_samples(self):
        m = metric_entry(297.4, "utt/s", [290.1, 297.4, 294.0])
        assert m["value"] == 297.4
        assert m["lo"] == 290.1 and m["hi"] == 297.4
        assert m["higher_is_better"]

    def test_lower_is_better(self):
        m = metric_entry(25.99, "ms/step", [25.99, 26.4], higher_is_better=False)
        assert not m["higher_is_better"]


class TestCompare:
    def test_within_band_is_quiet(self):
        old = _suite(x=metric_entry(100.0, "u/s", [98.0, 100.0]))
        new = _suite(x=metric_entry(98.5, "u/s", [97.0, 98.5]))
        reg, notes = compare_suites(old, new)
        assert reg == [] and len(notes) == 1

    def test_throughput_drop_fails(self):
        old = _suite(x=metric_entry(100.0, "u/s", [99.5, 100.0]))
        new = _suite(x=metric_entry(85.0, "u/s", [84.0, 85.0]))
        reg, _ = compare_suites(old, new)
        assert len(reg) == 1 and "x:" in reg[0]

    def test_latency_rise_fails_lower_is_better(self):
        old = _suite(t=metric_entry(26.0, "ms/step", [26.0, 26.2],
                                    higher_is_better=False))
        new = _suite(t=metric_entry(30.0, "ms/step", [30.0, 30.1],
                                    higher_is_better=False))
        reg, _ = compare_suites(old, new)
        assert len(reg) == 1

    def test_latency_drop_is_improvement(self):
        old = _suite(t=metric_entry(30.0, "ms/step", higher_is_better=False))
        new = _suite(t=metric_entry(26.0, "ms/step", higher_is_better=False))
        reg, _ = compare_suites(old, new)
        assert reg == []

    def test_wide_band_raises_tolerance(self):
        # old run was noisy (±10%) — an 8% drop must NOT fail
        old = _suite(x=metric_entry(100.0, "u/s", [90.0, 100.0]))
        new = _suite(x=metric_entry(92.0, "u/s", [91.5, 92.0]))
        reg, _ = compare_suites(old, new)
        assert reg == []

    def test_added_and_dropped_metrics_are_notes(self):
        old = _suite(a=metric_entry(1.0, "x"), b=metric_entry(2.0, "x"))
        new = _suite(b=metric_entry(2.0, "x"), c=metric_entry(3.0, "x"))
        reg, notes = compare_suites(old, new)
        assert reg == []
        assert any("DROPPED" in n for n in notes)
        assert any("NEW metric c" in n for n in notes)

    def test_improvement_is_note_not_regression(self):
        old = _suite(x=metric_entry(100.0, "u/s"))
        new = _suite(x=metric_entry(120.0, "u/s"))
        reg, notes = compare_suites(old, new)
        assert reg == [] and "+20.0%" in notes[0]


def test_format_table_contains_all_metrics():
    s = _suite(a=metric_entry(1.5, "u/s", [1.4, 1.5], config="B=8"),
               b=metric_entry(2.0, "ms", higher_is_better=False))
    t = format_table(s)
    assert "| a |" in t and "| b |" in t and "1.4-1.5" in t and "B=8" in t
