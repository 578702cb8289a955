"""Z-order clustering (operators/zorder.py): Morton-code correctness
and the data-skipping payoff of the clustered layout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from operating_system_map_reduce_spark.operators import zorder as Z


class TestMortonCode:
    def test_interleave_matches_python_reference(self, spark):
        """Spark expression vs a bit-twiddling Python reference over a
        grid of cell pairs, including the extremes."""
        def morton(a: int, b: int, bits: int) -> int:
            z = 0
            for i in range(bits):
                z |= ((a >> i) & 1) << (2 * i + 1)
                z |= ((b >> i) & 1) << (2 * i)
            return z

        cases = [(a, b) for a in (0, 1, 2, 3, 100, 65535)
                 for b in (0, 1, 5, 255, 65535)]
        df = spark.createDataFrame(cases, "a long, b long")
        got = {(r["a"], r["b"]): r["z"] for r in
               df.withColumn("z", Z.interleave_expr(F.col("a"), F.col("b"))).collect()}
        for (a, b), z in got.items():
            assert z == morton(a, b, Z.DEFAULT_BITS), (a, b)

    def test_locality_monotone_blocks(self, spark):
        """Rows close in BOTH dims share high Morton bits: the top-bits
        block of (a, b) equals that of (a+1, b+1) far more often than
        that of (a, b+large)."""
        def morton(a, b):
            z = 0
            for i in range(16):
                z |= ((a >> i) & 1) << (2 * i + 1)
                z |= ((b >> i) & 1) << (2 * i)
            return z

        near = sum(morton(a, b) >> 20 == morton(a + 1, b + 1) >> 20
                   for a in range(0, 60000, 997) for b in range(0, 60000, 991))
        far = sum(morton(a, b) >> 20 == morton(a, (b + 30000) % 65536) >> 20
                  for a in range(0, 60000, 997) for b in range(0, 60000, 991))
        assert near > far * 3

    def test_grid_clamps_and_degenerate_range(self, spark):
        df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (-5.0,), (200.0,)], "x double")
        cells = {r["x"]: r["g"] for r in
                 df.withColumn("g", Z.grid_expr(F.col("x"), 0.0, 100.0, 4)).collect()}
        assert cells[-5.0] == 0 and cells[200.0] == 15   # clamped
        assert cells[0.0] == 0 and 7 <= cells[50.0] <= 8
        same = {r["g"] for r in
                df.withColumn("g", Z.grid_expr(F.col("x"), 7.0, 7.0, 4)).collect()}
        assert same <= {0, 15}  # degenerate range never errors


class TestZorderLayout:
    def test_files_get_tight_two_dim_envelopes(self, spark, tmp_path):
        """Write the same data z-ordered and naturally-partitioned; the
        z-ordered layout's mean per-file envelope area must be a small
        fraction of the naive one -- that area ratio IS the expected
        scan-pruning win for two-dimensional predicates."""
        import random

        rng = random.Random(5)
        rows = [(rng.randint(0, 9999), rng.random() * 1000.0) for _ in range(40000)]
        df = spark.createDataFrame(rows, "k long, v double")
        zval = Z.interleave_expr(
            Z.grid_expr(F.col("k").cast("double"), 0.0, 9999.0),
            Z.grid_expr(F.col("v"), 0.0, 1000.0),
        )
        n_files = 16
        zpath, npath = str(tmp_path / "zord"), str(tmp_path / "naive")
        Z.zorder_layout(df, zval, n_files).drop("_z").write.parquet(zpath)
        df.repartition(n_files).write.parquet(npath)

        def mean_envelope(path):
            per_file = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg((F.max("k") - F.min("k")).alias("dk"),
                     (F.max("v") - F.min("v")).alias("dv"))
                .select((F.col("dk") * F.col("dv")).alias("area"))
                .agg(F.avg("area")).collect()[0][0]
            )
            return per_file

        ratio = mean_envelope(zpath) / mean_envelope(npath)
        # 16 z-range files ~ 4x4 grid -> ~1/16 the area; allow slack.
        assert ratio < 0.25, ratio

    def test_layout_preserves_rows_exactly(self, spark):
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 100).cast("double").alias("v"))
        zval = Z.interleave_expr(
            Z.grid_expr(F.col("k").cast("double"), 0.0, 999.0),
            Z.grid_expr(F.col("v"), 0.0, 99.0),
        )
        out = Z.zorder_layout(df, zval, 4).drop("_z")
        assert out.count() == 1000
        assert out.exceptAll(df).count() == 0 and df.exceptAll(out).count() == 0


class TestMortonProperties:
    def test_interleave_is_bijective(self):
        """Pure-Python mirror of the expression: distinct (a, b) cell
        pairs must map to distinct z-values (hypothesis-driven)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        def morton(a: int, b: int) -> int:
            z = 0
            for i in range(16):
                z |= ((a >> i) & 1) << (2 * i + 1)
                z |= ((b >> i) & 1) << (2 * i)
            return z

        @given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                        min_size=2, max_size=50, unique=True))
        @settings(max_examples=200, deadline=None)
        def check(pairs):
            zs = [morton(a, b) for a, b in pairs]
            assert len(set(zs)) == len(pairs)
            # de-interleave round-trips
            for (a, b), z in zip(pairs, zs):
                ra = rb = 0
                for i in range(16):
                    rb |= ((z >> (2 * i)) & 1) << i
                    ra |= ((z >> (2 * i + 1)) & 1) << i
                assert (ra, rb) == (a, b)

        check()
