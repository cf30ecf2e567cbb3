from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from webpagesgraphdatabase_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", shuffle_partitions=4)
    yield spark


@pytest.fixture()
def store(spark, tmp_path):
    from webpagesgraphdatabase_spark.graph.mutations import GraphStore

    s = GraphStore(spark, str(tmp_path / "warehouse"))
    s.init_schema()
    return s


def link_row(url: str, **overrides) -> dict:
    row = {
        "url": url,
        "title": f"title {url}",
        "raw_category": "raw",
        "suggested_category": "CatA",
        "raw_content": "x" * 120,
        "cleaned_content": "y" * 120,
        "keywords": "k1, k2",
        "category_explanation": "because",
        "keyword_explanation": "reasons",
    }
    row.update(overrides)
    return row
