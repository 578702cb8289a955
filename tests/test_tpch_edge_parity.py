"""Adversarial-distribution parity for the TPC-H faces.

The driver's oracle gate exercises each query on the fixed sf0.01
fixture; this suite re-runs ALL 22 TPC-H faces against their own DuckDB
oracles on a dataset they were never tuned against: per-column bootstrap
resamples of the real tables (fresh cross-column value combinations,
smaller key spaces so joins collide harder) PLUS crafted rows in a
reserved key space (>= 1000) that pin the boundary semantics the smooth
fixture never hits:

- an exact revenue tie in q15's scalar-MAX quarter (two suppliers, one
  integral-price line each -- no summation, so the tie is exact in both
  engines and BOTH rows must come back);
- an exact min-unit-cost tie for a boundary-size (p_size = 15) STANDARD
  part in q2 (both suppliers must be kept by the window-MIN equality);
- q20's >= 0.5 * max dominance boundary hit exactly (qty 20 vs max 40);
- q21's three-order census: single-supplier-returned (excluded,
  n_supp < 2), two-supplier-one-returned (counted), two-supplier-both-
  returned (excluded, n_r = 2);
- a customer with zero orders and one with only '5-LOW' orders, both of
  which q13's join-condition predicate must keep in the c_count = 0
  bucket.

Reference for the crafted semantics: TPC-H spec queries 2/13/15/20/21
as adapted in plans/analytics.py (docstrings cite the plan hazards).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from oracle_utils import compare, run_oracle

SRC = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TPCH_QUERIES = [
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_parts", "q12_priority_shipping",
    "q13_order_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_part_supplier_census", "q17_small_quantity", "q18_large_orders",
    "q19_disjunctive_revenue", "q20_dominant_suppliers",
    "q21_blocking_suppliers", "q22_dormant_value",
]

N_PART, N_SUPP, N_CUST, N_ORD, N_LINE = 40, 10, 20, 60, 400


def _boot(rng: np.random.RandomState, col: pd.Series, n: int) -> np.ndarray:
    """Bootstrap n values from a real column (fresh combinations)."""
    return col.to_numpy()[rng.randint(0, len(col), n)]


def _write(dirname: str, name: str, df: pd.DataFrame) -> None:
    schema = pq.read_schema(os.path.join(SRC, f"{name}.parquet"))
    table = pa.Table.from_pandas(df[schema.names], schema=schema,
                                 preserve_index=False)
    pq.write_table(table, os.path.join(dirname, f"{name}.parquet"))


@pytest.fixture(scope="session")
def edge_dir(tmp_path_factory):
    rng = np.random.RandomState(int(os.environ.get("SPARK_GRAFT_EDGE_SEED", "8")))
    out = str(tmp_path_factory.mktemp("tpch_edge"))
    real = {t: pd.read_parquet(os.path.join(SRC, f"{t}.parquet"))
            for t in ("part", "supplier", "customer", "orders",
                      "lineitem", "nation", "region")}

    # nation / region pass through unchanged (dimension value spaces)
    _write(out, "nation", real["nation"])
    _write(out, "region", real["region"])

    part = pd.DataFrame({
        "p_partkey": np.arange(N_PART),
        "p_name": _boot(rng, real["part"]["p_name"], N_PART),
        "p_brand": _boot(rng, real["part"]["p_brand"], N_PART),
        "p_type": _boot(rng, real["part"]["p_type"], N_PART),
        "p_size": _boot(rng, real["part"]["p_size"], N_PART),
        "p_retailprice": _boot(rng, real["part"]["p_retailprice"], N_PART),
    })
    # crafted: q2 boundary-size STANDARD part; q20 'small %' part
    part = pd.concat([part, pd.DataFrame({
        "p_partkey": [1000, 1001],
        "p_name": ["crafted tie widget", "small crafted gadget"],
        "p_brand": ["Brand#99", "Brand#99"],
        "p_type": ["STANDARD", "PROMO"],
        "p_size": [15, 1],
        "p_retailprice": [100.0, 100.0],
    })], ignore_index=True)

    nkeys = real["nation"]["n_nationkey"]
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(N_SUPP),
        "s_name": [f"edge supplier {i}" for i in range(N_SUPP)],
        "s_nationkey": _boot(rng, nkeys, N_SUPP),
        "s_acctbal": np.round(rng.uniform(-500, 5000, N_SUPP), 2),
    })
    supplier.loc[0, "s_acctbal"] = -10.0   # q11/q16 exclusion faces
    supplier = pd.concat([supplier, pd.DataFrame({
        "s_suppkey": [1000, 1001, 1002],
        "s_name": ["crafted tie A", "crafted tie B", "crafted blocker"],
        "s_nationkey": [int(nkeys.iloc[0])] * 3,
        "s_acctbal": [100.0, 100.0, 100.0],
    })], ignore_index=True)

    customer = pd.DataFrame({
        "c_custkey": np.arange(N_CUST),
        "c_name": [f"edge customer {i}" for i in range(N_CUST)],
        "c_nationkey": _boot(rng, nkeys, N_CUST),
        "c_acctbal": _boot(rng, real["customer"]["c_acctbal"], N_CUST),
        "c_mktsegment": _boot(rng, real["customer"]["c_mktsegment"], N_CUST),
    })

    orders = pd.DataFrame({
        "o_orderkey": np.arange(N_ORD),
        # custkey 19 gets NO orders (q13/q22 zero-order face);
        # custkey 18 gets ONLY '5-LOW' orders (q13 join-condition face)
        "o_custkey": rng.randint(0, 18, N_ORD),
        "o_orderstatus": _boot(rng, real["orders"]["o_orderstatus"], N_ORD),
        "o_totalprice": _boot(rng, real["orders"]["o_totalprice"], N_ORD),
        "o_orderdate": _boot(rng, real["orders"]["o_orderdate"], N_ORD),
        "o_orderpriority": _boot(
            rng, real["orders"]["o_orderpriority"], N_ORD),
    })
    orders.loc[0:2, "o_custkey"] = 18
    orders.loc[0:2, "o_orderpriority"] = "5-LOW"
    orders = pd.concat([orders, pd.DataFrame({
        "o_orderkey": [1000, 1001, 1002],          # q21 census orders
        "o_custkey": [0, 1, 2],
        "o_orderstatus": ["F", "F", "F"],
        "o_totalprice": [1000.0, 1000.0, 1000.0],
        "o_orderdate": [pd.Timestamp("1996-03-01")] * 3,
        "o_orderpriority": ["3-MEDIUM"] * 3,
    })], ignore_index=True)

    li = real["lineitem"]
    lineitem = pd.DataFrame({
        "l_orderkey": rng.randint(0, N_ORD, N_LINE),
        "l_partkey": rng.randint(0, N_PART, N_LINE),
        "l_suppkey": rng.randint(0, N_SUPP, N_LINE),
        "l_linenumber": rng.randint(1, 8, N_LINE).astype(np.int32),
        "l_quantity": rng.randint(1, 51, N_LINE).astype(float),
        "l_extendedprice": _boot(rng, li["l_extendedprice"], N_LINE),
        "l_discount": _boot(rng, li["l_discount"], N_LINE),
        "l_tax": _boot(rng, li["l_tax"], N_LINE),
        "l_returnflag": _boot(rng, li["l_returnflag"], N_LINE),
        "l_linestatus": _boot(rng, li["l_linestatus"], N_LINE),
        "l_shipdate": _boot(rng, li["l_shipdate"], N_LINE),
    })
    crafted_lines = pd.DataFrame({
        # q15 exact revenue tie: one integral-price, zero-discount line
        # each for suppliers 1000/1001 in the 1996-Q1 window, priced far
        # above any bootstrap supplier's quarterly revenue
        "l_orderkey":  [1, 2,
                        # q2 min-unit-cost tie on part 1000 (uc = 50.0)
                        3, 4,
                        # q20 dominance boundary on part 1001 in 1997:
                        # supplier 1000 ships 40, supplier 1001 ships 20
                        5, 6,
                        # q21 census: order 1000 single-supplier returned;
                        # order 1001 suppliers 1000(R)+1001(N);
                        # order 1002 suppliers 1000(R)+1001(R)
                        1000, 1001, 1001, 1002, 1002],
        "l_partkey":   [0, 0, 1000, 1000, 1001, 1001, 0, 0, 1, 0, 1],
        "l_suppkey":   [1000, 1001, 1000, 1001, 1000, 1001,
                        1002, 1000, 1001, 1000, 1001],
        "l_linenumber": np.full(11, 1, dtype=np.int32),
        "l_quantity":  [1.0, 1.0, 2.0, 2.0, 40.0, 20.0,
                        1.0, 1.0, 1.0, 1.0, 1.0],
        "l_extendedprice": [10_000_000.0, 10_000_000.0, 100.0, 100.0,
                            50.0, 25.0, 10.0, 10.0, 10.0, 10.0, 10.0],
        "l_discount":  np.zeros(11),
        "l_tax":       np.zeros(11),
        "l_returnflag": ["N", "N", "N", "N", "N", "N",
                         "R", "R", "N", "R", "R"],
        "l_linestatus": ["F"] * 11,
        "l_shipdate": [pd.Timestamp("1996-02-15")] * 4
        + [pd.Timestamp("1997-06-01")] * 2
        + [pd.Timestamp("1996-03-02")] * 5,
    })
    lineitem = pd.concat([lineitem, crafted_lines], ignore_index=True)

    _write(out, "part", part)
    _write(out, "supplier", supplier)
    _write(out, "customer", customer)
    _write(out, "orders", orders)
    _write(out, "lineitem", lineitem)
    return out


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_tpch_parity_on_adversarial_fixture(spark, edge_dir, name):
    problems = compare(_QUERIES[name](spark, edge_dir),
                       run_oracle(_ORACLES[name], edge_dir))
    assert not problems, (name, problems)


class TestCraftedSemantics:
    """The crafted rows must actually exercise their boundaries --
    otherwise the parity above would pass vacuously."""

    def test_q15_returns_both_tied_suppliers(self, spark, edge_dir):
        rows = _QUERIES["q15_top_supplier"](spark, edge_dir).collect()
        assert [r["s_suppkey"] for r in rows] == [1000, 1001]
        assert rows[0]["total_revenue"] == rows[1]["total_revenue"]

    def test_q2_keeps_min_cost_tie(self, spark, edge_dir):
        rows = _QUERIES["q2_min_cost_supplier"](spark, edge_dir).collect()
        tied = {r["s_name"] for r in rows if r["p_partkey"] == 1000}
        assert tied == {"crafted tie A", "crafted tie B"}

    def test_q20_half_max_boundary_is_dominant(self, spark, edge_dir):
        rows = _QUERIES["q20_dominant_suppliers"](spark, edge_dir).collect()
        by = {r["s_name"]: r["n_dominant"] for r in rows}
        # 20 >= 0.5 * 40 exactly: the boundary supplier counts
        assert by.get("crafted tie A", 0) >= 1     # shipped the max
        assert by.get("crafted tie B", 0) >= 1     # shipped exactly half

    def test_q21_census_counts_only_the_sole_returner(self, spark, edge_dir):
        rows = _QUERIES["q21_blocking_suppliers"](spark, edge_dir).collect()
        by = {r["s_name"]: r["numwait"] for r in rows}
        # order 1001: supplier 1000 is the sole returner on a 2-supplier
        # F order -> counted once.  Order 1000 (single supplier) and
        # order 1002 (both returned) contribute nothing.
        assert by.get("crafted tie A") == 1
        assert "crafted blocker" not in by
        assert "crafted tie B" not in by

    def test_q13_keeps_zero_order_bucket(self, spark, edge_dir):
        rows = _QUERIES["q13_order_distribution"](spark, edge_dir).collect()
        zero = [r for r in rows if r["c_count"] == 0]
        # custkey 19 (no orders at all) and custkey 18 (only '5-LOW'
        # orders, filtered by the join condition) both land at zero
        assert zero and zero[0]["custdist"] >= 2
