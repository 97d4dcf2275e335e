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


# -- IPv6 network conditions (conditions/network.go:33-63,211-226) ------------


def _ips(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "ip string")


def _match(spark, spec, vals):
    from beats_spark.conditions import compile_condition

    df = _ips(spark, vals)
    out = df.withColumn("m", compile_condition({"network": {"ip": spec}}, df))
    return {r["ip"]: bool(r["m"]) for r in out.collect()}


def test_network_ipv6_named_ranges(spark):
    got = _match(spark, "loopback", ["::1", "127.0.0.1", "fe80::1", "2001:db8::1"])
    assert got == {"::1": True, "127.0.0.1": True, "fe80::1": False,
                   "2001:db8::1": False}
    got = _match(spark, "link_local_unicast",
                 ["fe80::4240:30ff:feb0:21c0", "169.254.3.4", "fe00::1"])
    assert got == {"fe80::4240:30ff:feb0:21c0": True, "169.254.3.4": True,
                   "fe00::1": False}
    got = _match(spark, "private", ["fd00::1", "fc00::2", "10.1.2.3", "2001:db8::1"])
    assert got == {"fd00::1": True, "fc00::2": True, "10.1.2.3": True,
                   "2001:db8::1": False}


def test_network_ipv6_explicit_cidr(spark):
    got = _match(spark, "2001:db8::/32",
                 ["2001:db8::1", "2001:db8:ffff::9", "2001:db9::1", "junk", "10.0.0.1"])
    assert got == {"2001:db8::1": True, "2001:db8:ffff::9": True,
                   "2001:db9::1": False, "junk": False, "10.0.0.1": False}


def test_network_ipv6_compressed_forms_parse(spark):
    # real parse, not a contains(':') heuristic: equivalent forms match,
    # malformed colon-strings don't
    got = _match(spark, "fe80::/10",
                 ["fe80:0000:0000:0000:0000:0000:0000:0001", "fe80::1", "fe80:::1", "::"])
    assert got == {"fe80:0000:0000:0000:0000:0000:0000:0001": True,
                   "fe80::1": True, "fe80:::1": False, "::": False}


def test_network_public_both_families(spark):
    got = _match(spark, "public",
                 ["8.8.8.8", "10.0.0.1", "127.0.0.1", "169.254.1.1",
                  "2001:db8::1", "fd00::1", "::1", "fe80::1", "junk"])
    assert got == {"8.8.8.8": True, "10.0.0.1": False, "127.0.0.1": False,
                   "169.254.1.1": False, "2001:db8::1": True, "fd00::1": False,
                   "::1": False, "fe80::1": False, "junk": False}


def test_network_mixed_family_list(spark):
    got = _match(spark, ["192.168.0.0/16", "fe80::/10"],
                 ["192.168.9.9", "fe80::2", "10.0.0.1", "2001:db8::1"])
    assert got == {"192.168.9.9": True, "fe80::2": True, "10.0.0.1": False,
                   "2001:db8::1": False}


def test_network_public_excludes_special_ranges(spark):
    # isLocalOrPrivate (network.go:225-232) also excludes unspecified,
    # IPv4 broadcast, link-local multicast, interface-local multicast
    got = _match(spark, "public",
                 ["0.0.0.0", "255.255.255.255", "224.0.0.5", "224.0.1.1",
                  "::", "ff01::1", "ff02::1", "ff05::1", "8.8.8.8"])
    assert got == {"0.0.0.0": False, "255.255.255.255": False,
                   "224.0.0.5": False, "224.0.1.1": True,
                   "::": False, "ff01::1": False, "ff02::1": False,
                   "ff05::1": True, "8.8.8.8": True}


def test_network_unspecified_and_multicast_v6(spark):
    got = _match(spark, "unspecified", ["::", "0.0.0.0", "::1"])
    assert got == {"::": True, "0.0.0.0": True, "::1": False}
    got = _match(spark, "multicast", ["ff02::1", "224.0.0.5", "fe80::1"])
    assert got == {"ff02::1": True, "224.0.0.5": True, "fe80::1": False}
