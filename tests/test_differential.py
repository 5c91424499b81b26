"""Run every registered query against its DuckDB oracle — the same check the
driver performs at sf0.01 (SURVEY.md §5.2.1)."""

from __future__ import annotations

import os

import pytest

from aws_kinesis_spark import registry
from tests.oracle import assert_frames_match, duckdb_frame

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

registry._ensure_loaded()
NAMES = sorted(registry.REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    entry = registry.REGISTRY[name]
    sdf = entry.fn(spark, SF)
    if entry.oracle is None:
        # rows-only check, mirroring the driver's weaker path
        assert sdf.count() >= 0
        return
    odf = duckdb_frame(entry.oracle, SF)
    assert_frames_match(sdf, odf, name)
