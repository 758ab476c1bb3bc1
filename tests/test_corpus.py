"""t1 smoke + t2-style oracle check for the declared corpus (SURVEY §2.3).

Every corpus query runs at sf0.001 and must hash-match the DuckDB
oracle — the same comparison the driver applies at sf0.01.
"""

from __future__ import annotations

import pytest

from ccog_spark.harness import compare_query
from ccog_spark.queries.registry import ORACLE, REGISTRY
from tests.conftest import SF_SMOKE


NO_ORACLE = {"cog_write"}  # TIFF bytes; strong gate in test_raster


def test_registry_oracle_keys_align():
    assert set(ORACLE) == set(REGISTRY) - NO_ORACLE


@pytest.mark.parametrize("qid", sorted(set(REGISTRY) - NO_ORACLE))
def test_query_matches_oracle(spark, qid):
    r = compare_query(spark, qid, SF_SMOKE)
    assert r.ok, f"{qid}: {r.detail}"


@pytest.mark.parametrize("qid", sorted(NO_ORACLE))
def test_no_oracle_query_runs(spark, qid):
    rows = REGISTRY[qid](spark, SF_SMOKE).collect()
    assert len(rows) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_engine_facade(spark):
    from ccog_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=SF_SMOKE)
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n == 6000
    assert len(eng.query("q02").collect()) == 6
    assert eng.check("q02").ok
    assert "q02" in eng.query_ids()
    # UDTF registered through the facade
    n = eng.sql(
        "SELECT count(*) AS n FROM documents, LATERAL explode_shingles(text)"
    ).collect()[0].n
    assert n > 0
