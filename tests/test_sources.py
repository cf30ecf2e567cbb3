"""JSONL ingestion: declared schema, one-scan reject side-output,
landing into Parquet."""

from __future__ import annotations

from webpagesgraphdatabase_spark import sources


def _write_fixture(tmp_path):
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
        '{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "web", "n_chars": 12}',
        "{not json at all",
        '{"doc_id": null, "text": "orphan row", "lang": "en", "source": "web", "n_chars": 10}',
        '{"doc_id": 5, "lang": "en", "source": "web", "n_chars": 0}',
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_documents_jsonl_splits_good_and_rejects(spark, tmp_path):
    path = _write_fixture(tmp_path)
    docs, rejects = sources.read_documents_jsonl(spark, path)
    got = {r.doc_id: r.text for r in docs.collect()}
    assert got == {1: "hello world", 2: "zweite zeile"}
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    rej = sorted((r.reason, r.raw) for r in rejects.collect())
    assert len(rej) == 3
    reasons = [r[0] for r in rej]
    assert reasons.count("malformed") == 1
    assert "missing:doc_id" in reasons  # null doc_id
    assert "missing:text" in reasons  # absent text field
    malformed_raw = next(r[1] for r in rej if r[0] == "malformed")
    assert malformed_raw.startswith("{not json")


def test_type_mismatch_is_quarantined_not_crashed(spark, tmp_path):
    p = tmp_path / "bad_types.jsonl"
    p.write_text('{"doc_id": "not-a-number", "text": "x"}\n{"doc_id": 9, "text": "ok"}\n')
    docs, rejects = sources.read_documents_jsonl(spark, str(p))
    assert [r.doc_id for r in docs.collect()] == [9]
    assert rejects.count() == 1


def test_to_parquet_lands_and_reads_back(spark, tmp_path):
    path = _write_fixture(tmp_path)
    out = sources.to_parquet(
        spark, path, str(tmp_path / "pq"), str(tmp_path / "rej")
    )
    assert out.count() == 2
    # rejects written beside the landing
    rej = spark.read.json(str(tmp_path / "rej"))
    assert rej.count() == 3
    # the returned frame scans Parquet (pushdown-capable), not JSON
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan or "Scan parquet" in plan


def test_jsonl_stream_matches_batch_good_side(spark, tmp_path):
    from webpagesgraphdatabase_spark.streaming.jobs import run_available_now

    path = _write_fixture(tmp_path)
    stream = sources.read_documents_jsonl_stream(spark, str(tmp_path / "*.jsonl"))
    run_available_now(stream, "jsonl_docs", str(tmp_path / "ckpt_jsonl"))
    got = {(r.doc_id, r.text) for r in spark.table("jsonl_docs").collect()}
    docs, _ = sources.read_documents_jsonl(spark, path)
    want = {(r.doc_id, r.text) for r in docs.collect()}
    assert got == want and len(got) == 2


def test_orc_roundtrip_and_required_gate(spark, tmp_path):
    from webpagesgraphdatabase_spark import sources

    rows = [
        (1, "good text", "en", "web", 9),
        (2, None, "en", "web", 0),  # missing required text
        (3, "more text", None, "web", 9),  # optional null is fine
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sources.write_orc(df, str(tmp_path / "docs.orc"))
    docs, rejects = sources.read_documents_orc(spark, str(tmp_path / "docs.orc"))
    assert {r.doc_id for r in docs.collect()} == {1, 3}
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0].reason == "missing:text"


def test_orc_schema_drift_raises_by_name(spark, tmp_path):
    import pytest

    from webpagesgraphdatabase_spark import sources

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    df.write.mode("overwrite").orc(str(tmp_path / "drifted.orc"))
    with pytest.raises(ValueError, match="lang"):
        sources.read_documents_orc(spark, str(tmp_path / "drifted.orc"))


def test_orc_extra_columns_are_pruned_not_fatal(spark, tmp_path):
    from webpagesgraphdatabase_spark import sources

    df = spark.createDataFrame(
        [(1, "t", "en", "web", 1, "EXTRA")],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, extra string",
    )
    df.write.mode("overwrite").orc(str(tmp_path / "wide.orc"))
    docs, _ = sources.read_documents_orc(spark, str(tmp_path / "wide.orc"))
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert docs.count() == 1
