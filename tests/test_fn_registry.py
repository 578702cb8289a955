"""KVF-semantics tests for the SQL scalar function registry
(reference: p5/server/my_functable.cc:45-71 -- duplicate name ERR_FUNC,
invalid body ERR_SO with no residual registration)."""

from __future__ import annotations

from operating_system_map_reduce_spark import codes
from operating_system_map_reduce_spark.functions.registry import (
    BUILTIN_FUNCTIONS,
    SqlFunctionRegistry,
    ensure_builtins,
)


class TestSqlFunctionRegistry:
    def test_builtins_register_ok(self, spark):
        # order-independence: a prior query in the shared session may
        # have ensure_builtins()'d the same names (CREATE OR REPLACE);
        # clear them so the no-replace KVF path is what's under test
        for name in BUILTIN_FUNCTIONS:
            spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        reg = SqlFunctionRegistry(spark)
        results = reg.register_builtins()
        assert set(results) == set(BUILTIN_FUNCTIONS)
        assert all(v == codes.RES_OK for v in results.values())

    def test_duplicate_name_err_func(self, spark):
        reg = SqlFunctionRegistry(spark)
        assert reg.register("osmr_dup_probe", "(x INT) RETURNS INT", "x + 1",
                            "osmr_dup_probe(1)") == codes.RES_OK
        assert reg.register("osmr_dup_probe", "(x INT) RETURNS INT", "x + 2",
                            "osmr_dup_probe(1)") == codes.RES_ERR_FUNC

    def test_invalid_body_err_so_no_residue(self, spark):
        reg = SqlFunctionRegistry(spark)
        code = reg.register("osmr_broken_probe", "(x INT) RETURNS INT",
                            "no_such_function(x)", "osmr_broken_probe(1)")
        assert code == codes.RES_ERR_SO
        assert "osmr_broken_probe" not in reg.names()
        # the name is reusable after the failed registration
        assert reg.register("osmr_broken_probe", "(x INT) RETURNS INT", "x * 2",
                            "osmr_broken_probe(2)") == codes.RES_OK

    def test_name_cap(self, spark):
        reg = SqlFunctionRegistry(spark)
        assert reg.register("x" * (codes.LEN_FNAME + 1),
                            "(x INT) RETURNS INT", "x") == codes.RES_ERR_REQ_FMT

    def test_functions_compute(self, spark):
        ensure_builtins(spark)
        row = spark.sql(
            "SELECT osmr_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), "
            "               array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d, "
            "       osmr_ws_tokens('  a b  c ') AS w, "
            "       osmr_bpe_tokens('abcdefgh xy') AS b, "
            "       osmr_jaccard(array('a','b'), array('b','c')) AS j"
        ).collect()[0]
        assert row["d"] == 11.0
        assert row["w"] == 3
        assert row["b"] == 3   # ceil(8/4) + ceil(2/4)
        assert abs(row["j"] - 1.0 / 3.0) < 1e-12
