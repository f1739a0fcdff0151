"""The t2 gate, locally: every registered query hash-matches its DuckDB oracle.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to mirror the driver exactly.
"""

from __future__ import annotations

import pytest

from flink_ci_flink_spark.queries import QUERIES
from tests.compare import assert_frames_match, assert_oracle_types_strict

ALL = sorted(QUERIES)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # Rows-only check (mirrors the driver's weaker path).
        assert spark_pdf is not None
        return
    oracle_tbl = duck.execute(spec.oracle).arrow()
    assert_oracle_types_strict(oracle_tbl, name)
    oracle_pdf = oracle_tbl.to_pandas()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_hugeint_oracle_rejected(duck):
    """A deliberately un-cast SUM (DuckDB HUGEINT) must fail the strict gate."""
    tbl = duck.execute(
        "SELECT SUM(x) AS s FROM (VALUES (CAST(1 AS BIGINT)), (2)) t(x)"
    ).arrow()
    with pytest.raises(AssertionError, match="BIGINT"):
        assert_oracle_types_strict(tbl, "demo_uncast")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
