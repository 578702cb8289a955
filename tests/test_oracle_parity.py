"""Mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() entry must match DuckDB on the same parquet tables.
Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF to widen.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare, run_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    assert name in _QUERIES, f"oracle_sql has {name} but queries() does not"
    sdf = _QUERIES[name](spark, sf_dir)
    opdf = run_oracle(_ORACLES[name], sf_dir)
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_have_oracle_or_reason():
    missing = set(_QUERIES) - set(_ORACLES)
    # non-SQL-expressible ops are allowed to omit oracles; keep the list
    # explicit so additions are deliberate.  Empty since round 8:
    # similarity_ivfpq_trained (the round-7 omission) gained an
    # unrolled deterministic-Lloyd oracle -- fixed-count iteration is
    # SQL-expressible the same way pagerank_neardup's CTE is.
    allowed_missing: set[str] = set()
    assert missing <= allowed_missing, f"queries without oracle: {missing - allowed_missing}"
