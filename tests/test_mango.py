"""Unit tests for the Mango selector → Column compiler (R4) — full
operator surface against in-memory frames.
"""

from __future__ import annotations

import pytest

from couchwarehouse_spark.functions.mango import MangoError, compile_selector


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 30.0, "york", None),
            (2, "bob", 45.0, "leeds", "x"),
            (3, "carol", 20.0, "york", "y"),
            (4, "dan", 60.0, None, None),
        ],
        "id long, name string, age double, city string, tag string",
    )


def ids(df, sel, **kw):
    return sorted(r["id"] for r in df.filter(compile_selector(sel, **kw)).collect())


def test_implicit_eq_and_and(people):
    assert ids(people, {"city": "york"}) == [1, 3]
    assert ids(people, {"city": "york", "age": {"$gt": 25}}) == [1]


def test_comparisons(people):
    assert ids(people, {"age": {"$gte": 45}}) == [2, 4]
    assert ids(people, {"age": {"$lt": 30}}) == [3]
    assert ids(people, {"age": {"$gt": 20, "$lte": 45}}) == [1, 2]


def test_ne_includes_missing(people):
    # Mango $ne matches docs where the field is absent (NULL here).
    assert ids(people, {"city": {"$ne": "york"}}) == [2, 4]


def test_in_nin(people):
    assert ids(people, {"city": {"$in": ["york", "leeds"]}}) == [1, 2, 3]
    assert ids(people, {"city": {"$nin": ["york"]}}) == [2, 4]


def test_exists(people):
    assert ids(people, {"tag": {"$exists": True}}) == [2, 3]
    assert ids(people, {"tag": {"$exists": False}}) == [1, 4]


def test_regex(people):
    assert ids(people, {"name": {"$regex": "^[ab]"}}) == [1, 2]


def test_logical_operators(people):
    assert ids(people, {"$or": [{"city": "leeds"}, {"age": {"$lt": 25}}]}) == [2, 3]
    assert ids(people, {"$and": [{"city": "york"}, {"age": {"$lt": 25}}]}) == [3]
    assert ids(people, {"$nor": [{"city": "york"}, {"city": "leeds"}]}) == [4]
    assert ids(people, {"$not": {"age": {"$gte": 30}}}) == [3]
    assert ids(people, {"age": {"$not": {"$lt": 45}}}) == [2, 4]


def test_dotted_paths_flattened(people):
    # dotted → flattened column name when flattened=True (default)
    df = people.withColumnRenamed("city", "address_city")
    got = sorted(
        r["id"]
        for r in df.filter(compile_selector({"address.city": "york"})).collect()
    )
    assert got == [1, 3]


def test_empty_selector_matches_all(people):
    assert ids(people, {}) == [1, 2, 3, 4]


def test_errors():
    with pytest.raises(MangoError):
        compile_selector({"selector": {"a": 1}})  # wrapper, reference index.js:210-213
    with pytest.raises(MangoError):
        compile_selector({"a": {"$bogus": 1}})
    with pytest.raises(MangoError):
        compile_selector({"$bogus": [{"a": 1}]})
