"""Every registered query must match its DuckDB oracle at sf0.001 (the
driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from yelp_business_data_pipeline_spark.plans import QUERIES

from .oracle_harness import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    ok, msg = compare(name, sf_dir, spark)
    assert ok, f"{name}: {msg}"
