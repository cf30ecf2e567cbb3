"""PII scan/redact operator (operators/pii.py) — edge-case pins for
the Java-regex side (the DuckDB/RE2 twin is hash-checked by the
t_lang_quality gate row, which carries these columns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webpagesgraphdatabase_spark.operators import pii


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _redact_one(spark, text: str) -> str:
    return pii.pii_redact(_docs(spark, [text])).collect()[0].clean_text


def _scan_one(spark, text: str):
    return pii.pii_scan(_docs(spark, [text])).collect()[0]


def test_redacts_each_kind(spark):
    out = _redact_one(
        spark,
        "mail a.b+c@ex.co or 10.1.2.3 or +4915112345678 or 123-45-6789 end",
    )
    assert out == "mail <EMAIL> or <IP> or <PHONE> or <ID> end"


def test_email_with_plus_local_part_not_eaten_by_phone_rule(spark):
    # rule order: the email must win the '+digits' substring, so the
    # phone rule never sees it
    out = _redact_one(spark, "reach a+1234567@example.com today")
    assert out == "reach <EMAIL> today"
    r = _scan_one(spark, "reach a+1234567@example.com today")
    assert (r.n_email, r.n_phone) == (1, 0)


def test_scan_counts_multiple_hits(spark):
    r = _scan_one(spark, "x@y.io z@w.dev 1.2.3.4 5.6.7.8 9.10.11.12")
    assert (r.n_email, r.n_ip, r.n_phone, r.n_id) == (2, 3, 0, 0)


def test_clean_text_has_no_residual_matches(spark):
    planted = pii.plant_pii(_docs(spark, ["some document body"]))
    clean = pii.pii_redact(planted, "text_pii")
    residual = pii.pii_scan(clean, "clean_text").collect()[0]
    assert (residual.n_email, residual.n_ip, residual.n_phone, residual.n_id) == (
        0,
        0,
        0,
        0,
    )


def test_plant_pii_adds_exactly_one_of_each(spark):
    planted = pii.plant_pii(_docs(spark, ["body one", "body two"]))
    rows = pii.pii_scan(planted, "text_pii").collect()
    for r in rows:
        assert (r.n_email, r.n_ip, r.n_phone, r.n_id) == (1, 1, 1, 1)


def test_scrub_equals_scan_join_redact(spark):
    docs = pii.plant_pii(
        _docs(spark, ["body a", "b mail x@y.zz 1.2.3.4"])
    ).select("doc_id", F.col("text_pii").alias("text"))
    combined = sorted(map(tuple, pii.pii_scrub(docs).collect()))
    joined = sorted(
        map(
            tuple,
            pii.pii_scan(docs).join(pii.pii_redact(docs), "doc_id").collect(),
        )
    )
    assert combined == joined


def test_non_pii_text_untouched(spark):
    text = "ordinary text with version 1.2 and year 2024"
    assert _redact_one(spark, text) == text


def test_ip_requires_four_octets(spark):
    assert _scan_one(spark, "1.2.3 only").n_ip == 0
    # 1.2.3.4.5: the first 4-octet window matches (a '.' is a word
    # boundary after the 4) — Java and RE2 agree, and over-redaction on
    # a dotted-number run is the safe direction for a scrubber
    assert _scan_one(spark, "1.2.3.4.5 run").n_ip == 1


@pytest.mark.parametrize(
    "text,n",
    [("+1234567", 1), ("+123456", 0), ("call +123456789012345 now", 1)],
)
def test_phone_length_bounds(spark, text, n):
    assert _scan_one(spark, text).n_phone == n
