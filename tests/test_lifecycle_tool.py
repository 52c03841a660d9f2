"""Unit coverage for tools/run_lifecycle.py's summary helpers.

The lifecycle tool itself runs on the real chip (see benchmarks/lifecycle/
for an executed full-budget record); what is unit-testable on CPU is the
loss-curve summarizer, including the preemption-append property it must
survive: a preempted re-run appends LOW-step rows after a completed run's
curve in the same JSONL file (observed for real on 2026-08-20 — run B's
SIGTERM at stage-3 step 25 appended after run A's completed 1000-step
curve), so "last" must be the highest-step row, not the last line.
"""

import json

from tools.run_lifecycle import loss_curve


def _write(tmp_path, rows):
    p = tmp_path / "stage.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


def test_loss_curve_plain(tmp_path):
    rows = [
        {"step": 50, "total": 2.0, "steps_per_s": 10.0},
        {"step": 100, "total": 1.5, "steps_per_s": 12.0},
        {"step": 100, "val_total": 1.8},
    ]
    out = loss_curve(_write(tmp_path, rows))
    assert out == {
        "first_total": 2.0,
        "last_total": 1.5,
        "steps_per_s_last": 12.0,
        "val_first": 1.8,
        "val_last": 1.8,
    }


def test_loss_curve_preempted_rerun_appends_low_steps(tmp_path):
    rows = [
        {"step": 50, "total": 2.0, "steps_per_s": 10.0},
        {"step": 1000, "total": 1.1, "steps_per_s": 14.0},
        {"step": 1000, "val_total": 1.3},
        # a later preempted run appends low-step rows to the same file
        {"step": 25, "total": 2.2, "steps_per_s": 0.7},
        {"step": 25, "preempted_by_signal": 15.0},
    ]
    out = loss_curve(_write(tmp_path, rows))
    assert out["last_total"] == 1.1
    assert out["steps_per_s_last"] == 14.0
    assert out["val_last"] == 1.3
    # first_total comes from the budget run, not the preempted tail
    assert out["first_total"] == 2.0


def test_loss_curve_smoke_rows_before_budget_run(tmp_path):
    """A smoke-scale run's rows precede the budget run in the same file
    (observed: the committed stage3.jsonl's smoke rows start at a
    different loss because the smoke's stage chain differs). first/last
    must both come from the run that reached the highest step."""
    rows = [
        {"step": 25, "total": 3.135, "steps_per_s": 1.0},   # smoke chain
        {"step": 50, "total": 2.92, "steps_per_s": 1.2},
        {"step": 50, "val_total": 2.8},
        {"step": 25, "total": 2.4718, "steps_per_s": 0.7},  # budget run
        {"step": 1000, "total": 2.3684, "steps_per_s": 4.0},
        {"step": 1000, "val_total": 2.4612},
    ]
    out = loss_curve(_write(tmp_path, rows))
    assert out["first_total"] == 2.4718
    assert out["last_total"] == 2.3684
    assert out["val_first"] == 2.4612
    assert out["val_last"] == 2.4612


def test_loss_curve_no_val_rows(tmp_path):
    rows = [{"step": 10, "total": 3.0, "steps_per_s": 1.0}]
    out = loss_curve(_write(tmp_path, rows))
    assert "val_first" not in out and out["last_total"] == 3.0
