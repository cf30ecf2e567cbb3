"""Registry-wide plan lint: every driver-gate query's physical plan is
free of the two scale anti-patterns —

- ``CartesianProduct`` (an unconstrained pair blowup; the deliberate
  tiny-broadcast argmax crosses plan as ``BroadcastNestedLoopJoin …
  Cross`` and are allowed),
- ``BatchEvalPython`` (row-at-a-time pickled Python; Arrow-batched
  ``ArrowEvalPython`` is the sanctioned Python boundary).

This is the `.explain`-review loop mechanized: a regression that slips
one of these into any of the ~50 registry plans fails here at sf0.001,
not at 100 TB.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()


def test_registry_stays_inside_the_driver_gate_window():
    """The driver's correctness gate records at most ~50 registry rows
    (r12 grew the registry to 51 and the 51st row went
    driver-unchecked — the first unchecked row since round 1). Every
    row must stay under the gate: merge related operators into tagged-
    union rows (the ``a_region_revenue`` / ``g_integrity_checks``
    pattern) before adding a 51st key, and keep oracle coverage 1:1."""
    qs = entrymod.queries()
    assert len(qs) <= 50, (
        f"{len(qs)} registry rows — the driver gate records ~50; "
        "merge rows (see registry_ops.py's window note)"
    )
    assert set(entrymod.oracle_sql()) == set(qs)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registry_plan_free_of_scale_antipatterns(spark, name, tmp_path):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python\n{plan}"


def test_merge_map_covers_every_gate_row():
    """r14 verdict item 7: the documented merge map (registry_map.py,
    printed by ``tools/check_oracle.py --list``) and the registry can
    never drift — every gate row has a leg inventory, every mapped row
    exists, and no row claims zero legs."""
    from webpagesgraphdatabase_spark.registry_map import (
        MERGE_MAP,
        operator_index,
    )

    qs = entrymod.queries()
    assert set(MERGE_MAP) == set(qs)
    assert all(legs for legs in MERGE_MAP.values())
    # the inverted index round-trips: every (row, leg) site resolves
    for op, sites in operator_index().items():
        for row, leg in sites:
            assert row in qs
            assert (leg, op) in MERGE_MAP[row]
