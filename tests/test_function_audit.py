"""FUNCTIONS.md per-name audit stays in lockstep with the reference list."""

from __future__ import annotations

import os
import re

import pytest

REF = (
    "/root/reference/flink-table/flink-table-common/src/main/java/org/apache/"
    "flink/table/functions/BuiltInFunctionDefinitions.java"
)
MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "FUNCTIONS.md")


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_every_reference_name_is_audited():
    with open(REF) as f:
        names = set(re.findall(r'name\("([^"]+)"\)', f.read()))
    with open(MD) as f:
        audited = set(re.findall(r"^\| `([^`]+)` \|", f.read(), re.M))
    assert names - audited == set(), f"unaudited: {sorted(names - audited)}"
    assert audited - names == set(), f"stale rows: {sorted(audited - names)}"
    assert len(names) == 224


def test_new_shims_evaluate(spark):
    from apache_flink_spark.functions.registry import register_all

    register_all(spark)
    row = spark.sql(
        """SELECT length(sha256('x')) AS l256,
                  json_object('k', 'v') AS jo,
                  json_array3(NULL, NULL, 'z') AS ja,
                  current_time_() AS ct,
                  local_time_() AS lt
        """
    ).collect()[0]
    assert row.l256 == 64
    assert row.jo == '{"k":"v"}'
    assert row.ja == '["z"]'
    assert re.match(r"^\d{2}:\d{2}:\d{2}$", row.ct)
    assert re.match(r"^\d{2}:\d{2}:\d{2}$", row.lt)
