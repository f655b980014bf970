"""The bench annex rotation (VERDICT r9 missing #3, widened r13):
history must stay reproducible — the width-5 windows rounds 10-12 ran
are frozen, and the r13 widening to 10/round must continue exactly
where they stopped, covering the whole rotation with no gap and no
re-run before the wrap."""

from __future__ import annotations

import bench


def test_historical_windows_frozen():
    # What r10/r11/r12 actually timed (BENCH_r10-12.json annex keys);
    # changing these retroactively would desync the judged history.
    assert bench.annex_window_for_round(10) == list(bench.ANNEX_ROTATION[0:5])
    assert bench.annex_window_for_round(11) == list(bench.ANNEX_ROTATION[5:10])
    assert bench.annex_window_for_round(12) == list(bench.ANNEX_ROTATION[10:15])


def test_widened_windows_skip_nothing_until_wrap():
    covered = [
        name
        for r in (10, 11, 12, 13, 14)
        for name in bench.annex_window_for_round(r)
    ]
    # 15 legacy + 2x10 widened = 35 contiguous entries, each once;
    # entries appended after index 34 (r13+) enter on the wrap
    assert len(covered) == 35
    assert covered == list(bench.ANNEX_ROTATION[:35])
    # r13 starts exactly at the first never-timed entry
    assert bench.annex_window_for_round(13)[0] == bench.ANNEX_ROTATION[15]


def test_rotation_entries_are_registered():
    from hadoop_log_analysis_spark.queries import load_registry

    reg = load_registry()
    missing = [q for q in bench.ANNEX_ROTATION if q not in reg]
    assert not missing, f"annex names not in registry: {missing}"
