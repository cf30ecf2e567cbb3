"""r14 bench-protocol machinery (VERDICT r13 items 1-5):

* the absolute breach floor that stops sub-second jitter churn,
* the machine-readable ``cross_host`` adjudication block,
* the round-open evidence-chain guard (tools/open_round.py),
* the io-window commit gate (tools/commit_bench.py),
* and the guard run against THIS repo's own working tree.

All synthetic — no Spark session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from tools import commit_bench, open_round

CAL = {"cpu": 0.2, "shuffle": 0.8}
RECALL = {"s_ann_lsh": 0.5}


def _mk(tmp, name, payload):
    with open(os.path.join(str(tmp), name), "w") as fh:
        json.dump(payload, fh)


def _stats(timings):
    return {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}


def test_sub_floor_ratio_breach_is_not_retimed(tmp_path):
    """r14 verdict item 1: a sub-second entry whose ratio breaches 1.5x
    but whose calibrated absolute excess stays under the 1 s floor is
    recorded under sub_floor_breaches and NOT re-timed — the r11-r13
    churn shape (d_paragraph_dedup_hot 0.6 -> 0.9 s, ratio 1.5x,
    excess 0.3 s) adjudicates itself as jitter."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 10.6,
            "queries": {"q_tiny": 0.6, "q_real": 10.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    timings = {"q_tiny": 1.1, "q_real": 16.0}  # both ratio-breach 1.5x
    calls = []

    def fake_retime(name):
        calls.append(name)
        return {"median": 15.5, "n": 3, "cooldown_s": 20.0,
                "probe": 0.2, "probe_kind": "cpu"}

    out, detail, line = bench.build_report(
        timings, _stats(timings), RECALL, CAL, 0.1,
        here=str(tmp_path), write_detail=False, retime=fake_retime,
    )
    # only the entry with seconds-scale excess is a breach
    assert calls == ["q_real"]
    assert "q_real" in detail["breach_retimes"]
    assert detail["sub_floor_breaches"]["q_tiny"]["ratio"] == 1.83
    assert detail["sub_floor_breaches"]["q_tiny"]["excess_s"] == 0.5
    # the floor never hides a breach from worst_calibrated_ratio
    assert set(out["worst_calibrated_ratio"]) == {"q_tiny"} or set(
        out["worst_calibrated_ratio"]
    ) == {"q_real"}


def test_cross_host_block_joins_watches_and_retimes(tmp_path):
    """r14 verdict item 3: WATCHES.json rows (builder quiet medians)
    and this run's breach re-times join into one cross_host block with
    a mechanical verdict per entry."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 20.0,
            "queries": {"q_watched": 10.0, "q_breach": 10.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    _mk(
        tmp_path,
        "WATCHES.json",
        {
            "entries": {
                "q_watched": {
                    "builder_quiet_median": 10.2,
                    "n": 5,
                    "band": [8.0, 12.0],
                },
                "q_missing_median": {"n": 5},
            }
        },
    )
    timings = {"q_watched": 10.5, "q_breach": 16.0}

    def fake_retime(name):
        return {"median": 10.4, "n": 3, "cooldown_s": 20.0,
                "probe": 0.2, "probe_kind": "cpu"}

    out, detail, line = bench.build_report(
        timings, _stats(timings), RECALL, CAL, 0.1,
        here=str(tmp_path), write_detail=False, retime=fake_retime,
    )
    ch = detail["cross_host"]
    # watched entry: builder median inside its band -> closed
    assert ch["q_watched"]["verdict"] == "closed"
    assert ch["q_watched"]["builder_quiet_median"] == 10.2
    assert ch["q_watched"]["n"] == 5
    assert ch["q_watched"]["host_factor_used"] == 1.0
    # breaching entry with a clean re-time (10.4/10 = 1.04) -> closed
    assert ch["q_breach"]["verdict"] == "closed"
    # a watch row with no median and no retime stays a watch
    assert ch["q_missing_median"]["verdict"] == "watch"
    # detail-only: never on the driver line
    assert "cross_host" not in json.loads(line)


def test_cross_host_regression_verdict():
    """A builder quiet median OUTSIDE the recorded band is a
    regression — quiet window, no host excuse left."""
    v = bench._cross_host_verdict(
        {"builder_quiet_median": 2.0, "band": [0.5, 1.2]}, None
    )
    assert v == "regression"
    assert bench._cross_host_verdict(None, {"retime_raw_ratio": 1.9}) == "watch"


def _git(repo, *args):
    subprocess.run(
        ["git", "-C", str(repo), *args], check=True, capture_output=True
    )


def _init_repo(tmp_path):
    repo = tmp_path / "repo"
    repo.mkdir()
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    return repo


def test_open_round_guard_flags_untracked_sidecar(tmp_path):
    """r14 verdict item 2 done criterion: the guard fails on a
    synthetic untracked sidecar, passes once it is committed or named
    in BENCHLOG.md."""
    repo = _init_repo(tmp_path)
    (repo / "BENCH_r07.json").write_text("{}")
    _git(repo, "add", "BENCH_r07.json")
    _git(repo, "commit", "-qm", "sidecar")
    assert open_round.check(str(repo)) == []
    # an untracked new-round sidecar with no BENCHLOG entry: flagged
    (repo / "CORRECTNESS_r08.json").write_text("{}")
    problems = open_round.check(str(repo))
    assert len(problems) == 1 and "CORRECTNESS_r08.json" in problems[0]
    # naming it in BENCHLOG.md (authoritative-artifact note) excuses it
    (repo / "BENCHLOG.md").write_text(
        "r8: CORRECTNESS_r08.json is the driver's round-end artifact; "
        "adopted at the r9 opening commit.\n"
    )
    assert open_round.check(str(repo)) == []
    # a tracked sidecar that silently diverges from HEAD: flagged
    (repo / "BENCH_r07.json").write_text('{"v": 2}')
    problems = open_round.check(str(repo))
    assert len(problems) == 1 and "BENCH_r07.json" in problems[0]


def test_commit_gate_refuses_degraded_io_window(tmp_path):
    """r14 verdict item 5 done criterion: the commit gate refuses a
    synthetic degraded-io window (the r13 io-3.765 shape) and accepts
    the same run on a quiet disk."""
    # committed priors establish the steady io band (~1.5)
    for i, io in enumerate((1.45, 1.6, 1.67, 3.4), start=1):
        _mk(tmp_path, f"BENCH_DETAIL_r{i:02d}.json",
            {"calibration": {"io": io}})
    steady = commit_bench.steady_io(str(tmp_path), exclude="x")
    assert steady == 1.6  # median of the three smallest
    degraded = {
        "calibration": {"io": 3.765, "gate": {"degraded": False}},
        "host_factor": 1.0,
        "host_factor_cpu": 1.0,
    }
    reasons = commit_bench.gate(degraded, steady)
    assert len(reasons) == 1 and "io window degraded" in reasons[0]
    quiet = {
        "calibration": {"io": 1.62, "gate": {"degraded": False}},
        "host_factor": 1.05,
        "host_factor_cpu": 0.98,
    }
    assert commit_bench.gate(quiet, steady) == []
    # the r11 dirty-window probe-divergence signature still refuses
    divergent = {
        "calibration": {"io": 1.6},
        "host_factor": 0.83,
        "host_factor_cpu": 1.62,
    }
    assert any(
        "probe divergence" in r for r in commit_bench.gate(divergent, steady)
    )
    # pre-run gate degradation still refuses
    gated = {"calibration": {"io": 1.6, "gate": {"degraded": True}}}
    assert any(
        "host-quiet gate" in r for r in commit_bench.gate(gated, steady)
    )


def test_this_repos_evidence_chain_is_clean():
    """The live guard (r14 verdict item 2): every sidecar in THIS
    repo's working tree is tracked at HEAD or named in BENCHLOG.md.
    In-round artifacts (the builder's fresh BENCH_DETAIL, the driver's
    round-end sidecars) must be pre-named in the BENCHLOG round section
    stating which artifact is authoritative."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert open_round.check(here) == []
