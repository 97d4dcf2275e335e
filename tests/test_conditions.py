"""Condition-compiler tests (mirrors the table-driven style of the
reference's conditions/*_test.go)."""

from __future__ import annotations

import pytest

from beats_spark.conditions import compile_condition
from tests.conftest import rows


@pytest.fixture(scope="module")
def df(spark):
    data = [
        (1, "error", "db timeout on login", 9.5, "10.1.2.3", ["a", "b"]),
        (2, "info", "user login ok", 0.5, "8.8.8.8", ["b"]),
        (3, "error", "disk full", 99.0, "127.0.0.1", []),
        (4, "warn", None, 5.0, "192.168.1.7", None),
    ]
    return spark.createDataFrame(
        data, "id int, level string, msg string, value double, ip string, tags array<string>"
    )


def ids(df, cond):
    return [r[0] for r in rows(df.filter(compile_condition(cond, df)), "id")]


def test_equals(df):
    assert ids(df, {"equals": {"level": "error"}}) == [1, 3]


def test_equals_conjunction(df):
    assert ids(df, {"equals": {"level": "error", "id": 3}}) == [3]


def test_contains(df):
    assert ids(df, {"contains": {"msg": "login"}}) == [1, 2]


def test_contains_array_field(df):
    assert ids(df, {"contains": {"tags": "a"}}) == [1]


def test_regexp(df):
    assert ids(df, {"regexp": {"msg": "^user"}}) == [2]


def test_regexp_literal_specializes_to_contains(df):
    # no metacharacters → compiled as substring match
    assert ids(df, {"regexp": {"msg": "disk"}}) == [3]


def test_range(df):
    assert ids(df, {"range": {"value": {"gte": 1, "lt": 50}}}) == [1, 4]


def test_has_fields(df):
    assert ids(df, {"has_fields": ["msg", "tags"]}) == [1, 2, 3]


def test_network_private(df):
    assert ids(df, {"network": {"ip": "private"}}) == [1, 4]


def test_network_cidr(df):
    assert ids(df, {"network": {"ip": "10.0.0.0/8"}}) == [1]


def test_network_loopback_list(df):
    assert ids(df, {"network": {"ip": ["loopback", "8.8.0.0/16"]}}) == [2, 3]


def test_network_public(df):
    assert ids(df, {"network": {"ip": "public"}}) == [2]


def test_bool_combinators(df):
    cond = {
        "or": [
            {"and": [{"equals": {"level": "error"}}, {"range": {"value": {"gt": 50}}}]},
            {"not": {"has_fields": ["msg"]}},
        ]
    }
    assert ids(df, cond) == [3, 4]


def test_attrs_fallback(spark):
    df = spark.createDataFrame(
        [(1, {"env": "prod"}), (2, {"env": "dev"})], "id int, attrs map<string,string>"
    )
    assert ids(df, {"equals": {"env": "prod"}}) == [1]
