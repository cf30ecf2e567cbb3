"""Unit tests for ``bench.build_report`` — the calibration-normalized
round report (r5 verdict item 1).

The driver captures only the last ~2000 chars of bench stdout, so the
one-line JSON must stay under that budget, and the host-calibration
baseline must be recoverable even from a prior round whose artifact has
``parsed: null`` (only a truncated stdout tail). These tests exercise
the artifact walk against synthetic BENCH_r*/BENCH_DETAIL_r* files in a
tmp dir — no Spark session needed.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _mk(tmp, name, payload):
    with open(os.path.join(str(tmp), name), "w") as fh:
        json.dump(payload, fh)


TIMINGS = {"q1": 1.0, "q2": 2.0, "q_new": 0.5}
STATS = {k: {"median": v, "p95": v, "n": 3} for k, v in TIMINGS.items()}
RECALL = {"s_ann_lsh": 0.5}
CAL = {"cpu": 0.2, "shuffle": 0.8}


def test_no_prior_artifacts(tmp_path):
    out, detail, line = bench.build_report(
        TIMINGS, STATS, RECALL, CAL, 0.1, here=str(tmp_path), write_detail=False
    )
    assert out["value"] == 3.5
    assert "host_factor" not in out and "deltas" not in out
    parsed = json.loads(line)
    assert parsed["queries"]["q1"] == 1.0
    assert parsed["calibration"] == CAL


def test_calibration_recovered_from_unparsed_tail(tmp_path):
    # r5 shape: parsed=null, calibration only inside the stdout tail
    tail = (
        '...truncated..., "calibration": {"cpu": 0.1, "shuffle": 0.4}, '
        '"sf": 0.1, "comparable_total": 30.0, "comparable_prev_total": 29.0}\n'
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": tail})
    out, _, _ = bench.build_report(
        TIMINGS, STATS, RECALL, CAL, 0.1, here=str(tmp_path), write_detail=False
    )
    # this host's shuffle cal 0.8 vs prior 0.4 → 2× slower host
    assert out["host_factor"] == 2.0
    assert out["host_factor_cpu"] == 2.0
    assert out["calibrated_prev"]["round"] == "BENCH_r01.json"
    assert out["calibrated_prev"]["comparable_total"] == 30.0
    # no parsed per-query prior → no deltas, but host_factor still lands
    assert "normalized_deltas" not in out


def test_detail_sidecar_preferred_and_normalized_deltas(tmp_path):
    # a parsed driver artifact AND a newer committed detail sidecar;
    # the sidecar must win as per-query baseline
    _mk(
        tmp_path,
        "BENCH_r01.json",
        {
            "rc": 0,
            "parsed": {"value": 9.9, "queries": {"q1": 9.0, "q2": 9.0}},
            "tail": "",
        },
    )
    _mk(
        tmp_path,
        "BENCH_r02.json",
        {"rc": 0, "parsed": None, "tail": ""},
    )
    _mk(
        tmp_path,
        "BENCH_DETAIL_r02.json",
        {
            "value": 3.0,
            "queries": {"q1": 1.0, "q2": 2.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.4},
            "comparable_total": 3.0,
        },
    )
    timings = {"q1": 2.2, "q2": 4.0, "q_new": 0.5}
    out, detail, line = bench.build_report(
        timings, STATS, RECALL, CAL, 0.1, here=str(tmp_path), write_detail=False
    )
    assert out["prev_round"] == "BENCH_DETAIL_r02.json"
    assert out["host_factor"] == 2.0  # 0.8 / 0.4
    # q1: 2.2/2.0 - 1.0 = 0.1 ; q2: 4.0/2.0 - 2.0 = 0.0 (elided in line)
    assert detail["normalized_deltas"] == {"q1": 0.1, "q2": 0.0}
    parsed = json.loads(line)
    assert parsed["normalized_deltas"] == {"q1": 0.1}
    assert parsed["nd_elided_below"] == 0.05
    assert detail["comparable_total"] == 6.2
    assert detail["comparable_total_normalized"] == 3.1
    # q1 calibrated ratio (2.2/2)/1.0 = 1.1 is the worst; the raw
    # (unnormalized) ratio rides along so calibration artifacts
    # self-adjudicate in the artifact
    assert out["worst_calibrated_ratio"] == {"q1": 1.1}
    assert out["worst_raw_ratio"] == {"q1": 2.2}
    # the true worst raw over ALL unchanged entries (here the same):
    # q1 2.2/1.0=2.2 beats q2 4.0/2.0=2.0
    assert out["worst_raw_ratio_any"] == {"q1": 2.2}
    # raw deltas live in the detail sidecar only
    assert "deltas" in detail and "deltas" not in parsed
    assert detail["stats"] is STATS


def test_line_stays_under_driver_tail_budget(tmp_path):
    # 60 long-named queries with a full prior → worst-case line; the
    # shedding loop must keep it parseable within the driver's capture
    timings = {f"q_very_long_operator_name_{i:03d}": 1.234 for i in range(60)}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 60.0,
            "queries": {k: 1.0 for k in timings},
            "calibration": {"cpu": 0.2, "shuffle": 0.4},
            "comparable_total": 60.0,
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    out, detail, line = bench.build_report(
        timings, stats, RECALL, CAL, 0.1, here=str(tmp_path), write_detail=False
    )
    assert len(line) <= 1920
    parsed = json.loads(line)
    # queries degrade to the heaviest entries with an explicit elision
    # count ONLY as the last resort (these 60 pathological 29-char
    # names cannot fit even alone at 1dp); every advisory block must
    # already be gone by then (r14 verdict item 2)
    assert len(parsed["queries"]) + parsed.get("q_elided", 0) == 60
    assert parsed["host_factor"] == 2.0
    assert "rebaselined" not in parsed
    assert "comparable_total_normalized" not in parsed
    # the detail sidecar keeps everything regardless
    assert len(detail["normalized_deltas"]) == 60
    assert "comparable_total_normalized" in detail


def test_recall_outlives_advisory_blocks_when_shedding(tmp_path):
    # a realistically-sized registry (40 queries) with a full prior
    # overflows the budget only through the advisory delta blocks; the
    # shed order must sacrifice those and keep `recall` — it is an
    # adjudication result with no other home in the driver line
    timings = {f"q_operator_name_padded_{i:03d}": 1.234 for i in range(40)}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    recall = {f"s_ann_strategy_{i}": 0.5 for i in range(5)}
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 40.0,
            "queries": {k: 1.0 for k in timings},
            "calibration": {"cpu": 0.2, "shuffle": 0.4},
            "comparable_total": 40.0,
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    out, detail, line = bench.build_report(
        timings, stats, recall, CAL, 0.1, here=str(tmp_path), write_detail=False
    )
    assert len(line) <= 1920
    parsed = json.loads(line)
    assert parsed["recall"] == recall
    # the advisory blocks went first (and remain in the detail sidecar)
    assert "normalized_deltas" not in parsed
    assert len(detail["normalized_deltas"]) == 40


def test_changed_entries_rebaselined_not_in_worst_ratio(tmp_path, monkeypatch):
    """An entry listed in CHANGED_ENTRIES compares against a prior that
    measured different code, so it must be reported under `rebaselined`
    (ratio + reason in the detail) and NEVER drive
    worst_calibrated_ratio — the r7 s_ann_pq_indexed false breach."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 3.0,
            "queries": {"q1": 1.0, "q_changed": 1.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
            "comparable_total": 2.0,
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    monkeypatch.setattr(
        bench, "CHANGED_ENTRIES", {"q_changed": "new code path this round"}
    )
    timings = {"q1": 1.2, "q_changed": 5.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    out, detail, line = bench.build_report(
        timings, stats, RECALL, CAL, 0.1, here=str(tmp_path), write_detail=False
    )
    # host_factor 1.0: q_changed's raw ratio is 5.0 — but it is
    # rebaselined, so the worst same-code entry (q1, 1.2) wins
    assert out["worst_calibrated_ratio"] == {"q1": 1.2}
    assert out["rebaselined"] == {"q_changed": 5.0}
    assert detail["rebaselined_reasons"] == {
        "q_changed": "new code path this round"
    }
    parsed = json.loads(line)
    assert parsed["rebaselined"] == {"q_changed": 5.0}
    # reasons are detail-only (line budget)
    assert "rebaselined_reasons" not in parsed and "_rebaselined_reasons" not in parsed


def test_per_query_factors_io_and_group(tmp_path):
    # graph_load is io-labelled → normalized by the io probe ratio;
    # q_emb sits in a group whose interleaved micro cpu probe ran 3×
    # slow (a contended stretch mid-run) → its ratio must use that
    # nearest-in-time factor, not the global shuffle one; q_plain has
    # no usable label → global host_factor
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 9.0,
            "queries": {"graph_load": 5.0, "q_emb": 1.0, "q_plain": 1.0},
            "calibration": {"cpu": 0.1, "shuffle": 0.4, "io": 1.0},
            "comparable_total": 7.0,
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    timings = {"graph_load": 15.0, "q_emb": 3.0, "q_plain": 1.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    cal = {
        "cpu": 0.1,
        "shuffle": 0.4,
        "io": 3.0,  # disk ran 3× slower than the prior round
        "groups": {"embed": 0.3},  # cpu probe after the embed group: 3× slow
    }
    out, detail, line = bench.build_report(
        timings,
        stats,
        RECALL,
        cal,
        0.1,
        here=str(tmp_path),
        write_detail=False,
        groups={"graph_load": "io", "q_emb": "embed", "q_plain": "other"},
    )
    assert out["host_factor"] == 1.0  # shuffle unchanged
    # io: 15.0 / (3.0/1.0) / 5.0 = 1.0 ; embed: 3.0 / (0.3/0.1) / 1.0 = 1.0
    # plain: 1.0 / 1.0 / 1.0 = 1.0 → nothing spikes, all factors honest
    assert detail["calibrated_ratios"] == {
        "graph_load": 1.0,
        "q_emb": 1.0,
        "q_plain": 1.0,
    }
    assert detail["per_query_factor"] == {
        "graph_load": 3.0,
        "q_emb": 3.0,
        "q_plain": 1.0,
    }
    # detail-only: the driver line carries just worst_calibrated_ratio
    parsed = json.loads(line)
    assert "calibrated_ratios" not in parsed and "per_query_factor" not in parsed
    assert "_per_query_factor" not in out


def test_io_label_falls_back_without_prior_io_probe(tmp_path):
    # r7-over-r6 shape: the prior round has no io probe yet, so the
    # io-labelled entry falls back to the global shuffle factor
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 5.0,
            "queries": {"graph_load": 5.0},
            "calibration": {"cpu": 0.1, "shuffle": 0.4},
            "comparable_total": 5.0,
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    timings = {"graph_load": 10.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    cal = {"cpu": 0.1, "shuffle": 0.8, "io": 3.0}
    out, detail, _ = bench.build_report(
        timings,
        stats,
        RECALL,
        cal,
        0.1,
        here=str(tmp_path),
        write_detail=False,
        groups={"graph_load": "io"},
    )
    # hf = 0.8/0.4 = 2 → 10/2/5 = 1.0
    assert out["worst_calibrated_ratio"] == {"graph_load": 1.0}


def test_breach_retime_adjudicates_unchanged_entries(tmp_path, monkeypatch):
    """r8 verdict item 1: an UNCHANGED entry whose calibrated ratio
    breaches 1.5× triggers an automatic solo re-time; both readings and
    the probe divergence land in the artifact (full in the detail,
    condensed on the driver line). CHANGED_ENTRIES never trigger it;
    sub-bound entries never trigger it."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 4.0,
            "queries": {"q_breach": 1.0, "q_ok": 1.0, "q_changed": 1.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
            "comparable_total": 3.0,
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    monkeypatch.setattr(bench, "CHANGED_ENTRIES", {"q_changed": "new"})
    timings = {"q_breach": 3.0, "q_ok": 1.2, "q_changed": 9.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    calls = []

    def fake_retime(name):
        calls.append(name)
        # the solo re-run reads 1.1 s with the cpu probe back at the
        # prior round's level — pure host-window inflation, adjudicated
        return {
            "median": 1.1, "n": 3, "cooldown_s": 20.0,
            "probe": 0.2, "probe_kind": "cpu",
        }

    out, detail, line = bench.build_report(
        timings, stats, RECALL, CAL, 0.1,
        here=str(tmp_path), write_detail=False, retime=fake_retime,
    )
    # only the unchanged breaching entry is re-timed
    assert calls == ["q_breach"]
    full = detail["breach_retimes"]["q_breach"]
    assert full["calibrated_ratio"] == 3.0 and full["raw_ratio"] == 3.0
    assert full["median"] == 1.1
    # retime factor = 0.2/0.2 = 1 → retime_calibrated_ratio 1.1
    assert full["retime_calibrated_ratio"] == 1.1
    assert full["retime_raw_ratio"] == 1.1
    # in-run factor (hf=1.0) vs re-time probe factor (1.0) → 1.0
    assert full["probe_factor_divergence"] == 1.0
    # both bounds breached here (hf=1.0) → trigger records "both"
    assert full["trigger"] == "both"
    # condensed verdict rides the driver line
    parsed = json.loads(line)
    assert parsed["breach_retimes"] == {
        "q_breach": {"cal": 3.0, "raw": 3.0, "trig": "both", "rt": 1.1}
    }
    # the full block is detail-only
    assert "_breach_retimes" not in out
    assert parsed["breach_retimes"] != full


def test_breach_retime_fixture_out_of_scope_recorded(tmp_path):
    """A breaching entry whose fixture an inner finally already removed
    records the failed re-run honestly instead of silently vanishing."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 2.0,
            "queries": {"q_gone": 2.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    # 4.0 vs prior 2.0: ratio 2.0 AND calibrated excess 2.0 s — past
    # the r14 absolute breach floor, so the retime fires
    timings = {"q_gone": 4.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}

    def fake_retime(name):
        return {
            "error": "AnalysisException (fixture out of scope)",
            "cooldown_s": 20.0,
            "probe": 0.2,
            "probe_kind": "cpu",
        }

    out, detail, line = bench.build_report(
        timings, stats, RECALL, CAL, 0.1,
        here=str(tmp_path), write_detail=False, retime=fake_retime,
    )
    assert "error" in detail["breach_retimes"]["q_gone"]
    parsed = json.loads(line)
    assert parsed["breach_retimes"]["q_gone"] == {
        "cal": 2.0, "raw": 2.0, "trig": "both", "err": True
    }


def test_breach_retime_io_entry_normalizes_by_io_probe(tmp_path):
    """An io-labelled breach re-times against the IO probe, not cpu: a
    slow-disk window that persists through the re-run yields a retime
    factor that EXPLAINS the raw time instead of confirming a fake
    regression (the r8 d_contamination failure mode, resource-matched)."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 5.0,
            "queries": {"graph_load": 5.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8, "io": 1.0},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    timings = {"graph_load": 10.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    # in-run: cpu/shuffle flat but the io probe only read 1.2x while the
    # disk actually ran ~2x slow -> calibrated 10/1.2/5 = 1.67 breach
    cal = {"cpu": 0.2, "shuffle": 0.8, "io": 1.2}

    def fake_retime(name):
        # at re-time the disk window is measurable: io probe reads 2x
        return {
            "median": 10.0, "n": 3, "cooldown_s": 20.0,
            "probe": 2.0, "probe_kind": "io",
        }

    out, detail, _ = bench.build_report(
        timings, stats, RECALL, cal, 0.1,
        here=str(tmp_path), write_detail=False,
        groups={"graph_load": "io"}, retime=fake_retime,
    )
    full = detail["breach_retimes"]["graph_load"]
    assert full["probe_kind"] == "io"
    # retime factor 2.0/1.0 -> calibrated 10/2/5 = 1.0: adjudicated
    assert full["retime_calibrated_ratio"] == 1.0
    # in-run io factor 1.2 vs re-time io factor 2.0 -> 0.6 divergence
    assert full["probe_factor_divergence"] == 0.6


def test_breach_retime_raw_only_breach_triggers(tmp_path):
    """r9 verdict item 1: on a SLOW-host window calibration shrinks
    ratios, so an entry can breach the raw bound while its calibrated
    ratio reads fine (t_stratified_sample: raw 1.58×, calibrated 1.12×
    on the 1.4×-slow r9 driver host). The trigger keys on
    max(raw, calibrated), so the raw-only breach gets its re-time and
    the artifact records which bound fired."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 11.0,
            "queries": {"q_rawbreach": 10.0, "q_ok": 1.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    # host runs 1.4x slow (shuffle 0.8 -> 1.12): raw 1.58 breaches,
    # calibrated 1.58/1.4 = 1.13 does not — r9's exact escape (prior
    # sized 10 s so the calibrated excess 1.8 s clears the r14 floor)
    cal = {"cpu": 0.28, "shuffle": 1.12}
    timings = {"q_rawbreach": 15.8, "q_ok": 1.3}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    calls = []

    def fake_retime(name):
        calls.append(name)
        return {
            "median": 10.5, "n": 3, "cooldown_s": 20.0,
            "probe": 0.2, "probe_kind": "cpu",
        }

    out, detail, line = bench.build_report(
        timings, stats, RECALL, cal, 0.1,
        here=str(tmp_path), write_detail=False, retime=fake_retime,
    )
    assert calls == ["q_rawbreach"]
    full = detail["breach_retimes"]["q_rawbreach"]
    assert full["raw_ratio"] == 1.58
    assert full["calibrated_ratio"] < 1.5  # calibrated alone would skip
    assert full["trigger"] == "raw"
    parsed = json.loads(line)
    assert parsed["breach_retimes"]["q_rawbreach"]["trig"] == "raw"
    # q_ok breaches NEITHER bound (raw 1.3, calibrated ~0.93): untouched
    assert "q_ok" not in detail["breach_retimes"]


def test_breach_retime_mutating_entry_flagged(tmp_path, monkeypatch):
    """r9 advice: a re-time of an entry whose thunk mutates its fixture
    carries the MUTATING_ENTRIES annotation end-to-end, so a skewed
    re-read adjudicates itself in the artifact."""
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 2.0,
            "queries": {"w_compact": 2.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    # w_compact sits in the r14 BENCH_SCALE rebaseline set; this test
    # pins the mutating-entry annotation, so compare same-code
    monkeypatch.setattr(bench, "CHANGED_ENTRIES", {})
    timings = {"w_compact": 4.0}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}

    def fake_retime(name):
        # what bench.main's retime() returns for a MUTATING_ENTRIES name
        return {
            "median": 1.9, "n": 3, "cooldown_s": 20.0,
            "probe": 0.2, "probe_kind": "cpu",
            "mutates_fixture": bench.MUTATING_ENTRIES[name],
        }

    out, detail, _ = bench.build_report(
        timings, stats, RECALL, CAL, 0.1,
        here=str(tmp_path), write_detail=False, retime=fake_retime,
    )
    assert "compacts" in detail["breach_retimes"]["w_compact"]["mutates_fixture"]


def test_no_retime_without_breach(tmp_path):
    _mk(
        tmp_path,
        "BENCH_DETAIL_r01.json",
        {
            "value": 1.0,
            "queries": {"q1": 1.0},
            "calibration": {"cpu": 0.2, "shuffle": 0.8},
        },
    )
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    timings = {"q1": 1.2}
    stats = {k: {"median": v, "p95": v, "n": 3} for k, v in timings.items()}
    calls = []
    out, detail, _ = bench.build_report(
        timings, stats, RECALL, CAL, 0.1,
        here=str(tmp_path), write_detail=False,
        retime=lambda n: calls.append(n),
    )
    assert calls == [] and "breach_retimes" not in out


def test_degraded_gate_labels_artifact(tmp_path):
    cal = dict(CAL)
    cal["gate"] = {
        "bounds": {"load_1m": 6.0, "scratch_io_s": 1.5},
        "pre": {"load_1m": 9.4, "scratch_io_s": 0.3},
        "retry": {"load_1m": 8.1, "scratch_io_s": 0.3},
        "degraded": True,
    }
    out, detail, line = bench.build_report(
        TIMINGS, STATS, RECALL, cal, 0.1,
        here=str(tmp_path), write_detail=False,
    )
    assert out["degraded"] is True and detail["degraded"] is True
    assert json.loads(line)["degraded"] is True
    # a clean gate adds no flag
    cal2 = dict(CAL)
    cal2["gate"] = {"pre": {"load_1m": 0.5, "scratch_io_s": 0.2},
                    "degraded": False}
    out2, _, _ = bench.build_report(
        TIMINGS, STATS, RECALL, cal2, 0.1,
        here=str(tmp_path), write_detail=False,
    )
    assert "degraded" not in out2


def test_host_quiet_gate_samples_and_bounds(monkeypatch):
    """The gate samples load + scratch I/O + memory bandwidth; an
    out-of-bounds first sample triggers exactly one re-sample (no sleep
    in tests), and the verdict follows the LAST sample. Hermetic (r14
    verdict item 1): the WHOLE probe sample is injected — the r14
    driver verify died because this test mocked only getloadavg and
    let the real scratch/mem probes run on a loaded host."""
    quiet = {"load_1m": 0.5, "scratch_io_s": 0.2, "mem_s": 0.9}
    loaded = {"load_1m": 9.9, "scratch_io_s": 0.2, "mem_s": 0.9}
    readings = iter([dict(loaded), dict(quiet)])
    monkeypatch.setattr(bench, "_gate_sample", lambda: next(readings))
    gate = bench.host_quiet_gate(retry_sleep=0)
    assert gate["pre"]["load_1m"] == 9.9
    # retry_sleep=0 disables the re-sample: verdict follows the pre read
    assert "retry" not in gate and gate["degraded"] is True
    assert gate["bounds"]["load_1m"] == bench.GATE_LOAD_BOUND
    assert gate["bounds"]["mem_s"] == bench.GATE_MEM_BOUND_S
    assert gate["pre"]["scratch_io_s"] == 0.2
    assert gate["pre"]["mem_s"] == 0.9  # the memory-bandwidth sample rides

    readings2 = iter([dict(loaded), dict(quiet)])
    monkeypatch.setattr(bench, "_gate_sample", lambda: next(readings2))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    gate2 = bench.host_quiet_gate(retry_sleep=1.0)
    assert gate2["pre"]["load_1m"] == 9.9
    assert gate2["retry"]["load_1m"] == 0.5
    assert gate2["degraded"] is False  # the machine quieted down

    # each of the three probes trips the gate on its own
    for key, val in (
        ("load_1m", 99.0),
        ("scratch_io_s", 9.0),
        ("mem_s", 9.0),
    ):
        bad = dict(quiet)
        bad[key] = val
        monkeypatch.setattr(bench, "_gate_sample", lambda b=bad: dict(b))
        assert bench.host_quiet_gate(retry_sleep=0)["degraded"] is True


def test_detail_written_and_round_numbered(tmp_path):
    _mk(tmp_path, "BENCH_r01.json", {"rc": 0, "parsed": None, "tail": ""})
    _mk(tmp_path, "BENCH_r02.json", {"rc": 0, "parsed": None, "tail": ""})
    bench.build_report(
        TIMINGS, STATS, RECALL, CAL, 0.1, here=str(tmp_path), write_detail=True
    )
    path = os.path.join(str(tmp_path), "BENCH_DETAIL_r03.json")
    assert os.path.exists(path)
    with open(path) as fh:
        assert json.load(fh)["queries"] == TIMINGS


def test_recall_roles_cover_every_sidecar_row():
    """r10 verdict item 7: every recall sidecar row has a role — the
    role table covers exactly the rows the bench emits, every
    building_block names a serving-role twin, serving rows carry no
    twin."""
    names = set(bench.ANN_RECALL) | {"s_ann_pq_indexed", "s_ann_ivfpq_res"}
    assert names == set(bench.ANN_RECALL_ROLES)
    tagged = bench.tag_recall_roles({n: 0.5 for n in names})
    for n, row in tagged.items():
        assert row["recall"] == 0.5
        if row["role"] == "building_block":
            assert bench.ANN_RECALL_ROLES[row["serving"]][0] == "serving"
        else:
            assert row["role"] == "serving" and "serving" not in row


def test_recall_roles_detail_full_line_flat(tmp_path):
    """The role rows live whole in the detail sidecar; the driver line
    (1920-char budget) keeps the flat floats."""
    recall = bench.tag_recall_roles({"s_ann_lsh": 0.14, "s_ann_sq8": 1.0})
    out, detail, line = bench.build_report(
        TIMINGS, STATS, recall, CAL, 0.1,
        here=str(tmp_path), write_detail=False,
    )
    assert detail["recall"]["s_ann_lsh"] == {
        "recall": 0.14,
        "role": "building_block",
        "serving": "s_ann_hybrid_wide",
    }
    assert detail["recall"]["s_ann_sq8"] == {"recall": 1.0, "role": "serving"}
    parsed = json.loads(line)
    assert parsed["recall"] == {"s_ann_lsh": 0.14, "s_ann_sq8": 1.0}


def test_wh_retime_setup_produces_median_not_error(spark, tmp_path):
    """r10 verdict item 5, the exact done criterion: a forced breach
    re-time of w_compact rebuilds its fixture (the bench's inner
    finally removed the warehouse dir) and carries `median`, not
    `err` — and without the setup the same re-run still records the
    honest fixture-out-of-scope error."""
    import shutil

    from pyspark.sql import functions as F

    from webpagesgraphdatabase_spark.catalog import Warehouse

    wh_dir = str(tmp_path / "wh")
    wh = Warehouse(spark, wh_dir)
    ev = spark.range(200).select(
        F.concat(F.lit("e"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        F.col("id").cast("timestamp").alias("ts"),
    )
    setups = bench._wh_retime_setups(wh, ev)
    # simulate the bench's inner finally: the warehouse dir is GONE
    shutil.rmtree(wh_dir, ignore_errors=True)
    res = bench.solo_retime(
        lambda: wh.compact("events_c"),
        probe=0.1,
        probe_kind="cpu",
        cooldown=0.0,
        note=bench.MUTATING_ENTRIES["w_compact"],
        setup=setups["w_compact"],
    )
    assert "median" in res and "error" not in res
    assert "mutates_fixture" in res
    # every mutating warehouse entry has a registered rebuilder
    assert {"w_compact", "w_cluster_zorder", "w_zonemap_write"} <= set(
        setups
    )
    # without the setup the same re-run records the error honestly
    shutil.rmtree(wh_dir, ignore_errors=True)
    res2 = bench.solo_retime(
        lambda: wh.compact("events_c"), 0.1, "cpu", 0.0
    )
    assert "error" in res2 and "median" not in res2
