"""Similarity search over an embedding column (array<float>).

Two paths, as a real pipeline needs both:
 - ``cosine_knn``: exact brute-force top-k.  O(n^2) candidate space --
   the *quality baseline*, fine for a broadcast-able query set, wrong
   as the primary path at 100 TB.
 - ``lsh_bucket_expr``: random-hyperplane LSH bucketing.  Hyperplane
   signs are derived deterministically from md5 (module constant), so
   the DuckDB oracle reproduces the exact buckets.  At scale: bucket is
   computed map-side, the shuffle is on bucket id, and candidate pairs
   exist only within buckets (multi-probe = register several sign
   tables).

Float discipline: all arithmetic casts float->double elementwise before
multiply, and folds run left-to-right in index order -- DuckDB's
list_sum(list_transform(...)) matches bit-for-bit (verified in tests).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

N_PLANES = 16
DIM = 64
# multi-table LSH: recall for a single b-bit table is (1-theta/pi)^b,
# which is tiny for useful thetas; T independent tables lift it to
# 1-(1-p)^T.  4 tables x 4 bits gives ~50% top-1 recall on these
# embeddings at ~1/16 of the candidate space per table.
N_TABLES = 4
TABLE_BITS = 4


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 from md5 parity -- reproducible anywhere."""
    h = hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 1 else -1


HYPERPLANES: list[list[int]] = [
    [_plane_sign(p, i) for i in range(DIM)] for p in range(N_PLANES)
]


def dot_sql(a: str, b: str) -> str:
    """Spark-SQL double dot product, left-to-right fold.

    NB: interpreted HOF lambdas -- no codegen.  Kept for the SQL
    surface (functions/registry.py osmr_cosine) and as the oracle
    template; bulk plans use the numpy stages below, which compute the
    IDENTICAL doubles (np.cumsum is a sequential fold, so association
    order matches this aggregate and DuckDB's list_sum bit-for-bit)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


# --- numpy kernels (Arrow-batched, bit-identical to the SQL folds) --------

def _stack(series) -> np.ndarray:
    """pandas Series of float32 arrays -> (n, DIM) float64 matrix.
    float32 -> float64 is exact, matching CAST(x AS DOUBLE)."""
    if len(series) == 0:
        return np.empty((0, DIM), dtype=np.float64)
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _seq_dot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot as a LEFT-TO-RIGHT fold: cumsum along the index
    axis is sequential ((p1+p2)+p3...), bit-identical to the SQL
    aggregate and DuckDB list_sum -- np.sum/np.dot pairwise-associate
    and may differ in ulps, so they must NOT be used here."""
    if A.shape[0] == 0:
        return np.empty(0, dtype=np.float64)
    return np.cumsum(A * B, axis=1)[:, -1]


PLANES_MAT = np.array(HYPERPLANES, dtype=np.float64)  # (N_PLANES, DIM)


def _drop_zero_vectors(emb: DataFrame, vec_col: str) -> DataFrame:
    """Zero vectors have no cosine direction: their cosine is 0/0 = NaN,
    which SQL window-ranks FIRST (NaN > everything in DESC) while numpy
    comparisons drop it -- an engine-divergence trap.  Policy, applied
    identically in every ANN path and oracle (WHERE nrm > 0): zero-norm
    vectors are excluded from candidates.  norm == 0 iff every element
    is 0, so the check stays in codegen (no fold needed)."""
    return emb.filter(F.exists(F.col(vec_col), lambda x: x != 0.0))


def vector_norms(emb: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """(id, vec, nrm) in one map-side Arrow pass -- norms only, for
    consumers that need no bucketing (cosine_knn).  The bucketed paths
    use lsh_members / ivf_members, which fuse their own fanout; Catalyst
    cannot prune columns out of a Python stage, so computing buckets
    here would charge every caller 16 hyperplane folds per row."""
    import pandas as pd

    src = _drop_zero_vectors(emb, vec_col).select(F.col(id_col), F.col(vec_col))
    id_field = src.schema[id_col]
    vec_field = src.schema[vec_col]

    def norm_batches(batches):
        for pdf in batches:
            E = _stack(pdf[vec_col])
            yield pd.DataFrame({
                id_col: pdf[id_col], vec_col: pdf[vec_col],
                "nrm": np.sqrt(_seq_dot(E, E)),
            })

    schema = StructType([id_field, vec_field, StructField("nrm", DoubleType())])
    return src.mapInPandas(norm_batches, schema)


def _chunked_cosines(Q: np.ndarray, E: np.ndarray, qn: np.ndarray,
                     en: np.ndarray, chunk: int = 128):
    """Yield (start, cosine block) for Q x E with peak memory bounded
    by the (chunk, m) running block -- dimension-at-a-time accumulation
    into one outer-product sum, never a (chunk, m, DIM) tensor (which
    on a skewed million-member bucket would be ~100 GB).  The
    accumulation order is dim 0 first, then += dim 1..DIM-1: the
    identical left-to-right fold as cumsum over the vector axis and the
    SQL aggregate, so every cosine stays bit-identical to the oracle."""
    for s in range(0, Q.shape[0], chunk):
        q = Q[s:s + chunk]
        dots = np.multiply.outer(q[:, 0], E[:, 0])
        for d in range(1, Q.shape[1]):
            dots += np.multiply.outer(q[:, d], E[:, d])
        yield s, dots / (qn[s:s + chunk, None] * en[None, :])


def _grouped_topk(members: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Per-group all-pairs cosine, emitting each member's top-k
    neighbors WITHIN its group as slim (qid, nid, cosine) rows.

    This is the scale-critical shape for bucketed ANN: the quadratic
    work happens inside an Arrow batch (numpy), and only k rows per
    member leave the group -- versus materializing every candidate
    pair through two vector-carrying shuffled joins + a distinct,
    which round-1 profiling showed dominates wall-clock (~1M wide
    rows for 2k vectors at sf0.1).  Global top-k over the union of
    per-group top-k is exact: any pair dropped here had >= k better
    pairs in the SAME group, which also beat it globally (tie-break
    nid-asc is preserved by sorting members and stable argsort)."""
    import pandas as pd

    def topk_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"qid": ids[:0], "nid": ids[:0],
                                 "cosine": np.empty(0, dtype=np.float64)})
        E = _stack(pdf["__vec"])
        nrm = pdf["__nrm"].to_numpy()
        q_out, n_out, c_out = [], [], []
        for s, cos in _chunked_cosines(E, E, nrm, nrm):
            for local in range(cos.shape[0]):
                cos[local, s + local] = -np.inf  # exclude self
            kk = min(k, m - 1)
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(cos, idx, axis=1)
            keep = np.isfinite(vals)
            q_out.append(np.repeat(ids[s:s + cos.shape[0]], kk)[keep.ravel()])
            n_out.append(ids[idx].ravel()[keep.ravel()])
            c_out.append(vals.ravel()[keep.ravel()])
        return pd.DataFrame({"qid": np.concatenate(q_out),
                             "nid": np.concatenate(n_out),
                             "cosine": np.concatenate(c_out)})

    id_type = members.schema["__id"].dataType
    schema = StructType([
        StructField("qid", id_type), StructField("nid", id_type),
        StructField("cosine", DoubleType()),
    ])
    return members.groupBy(*group_cols).applyInPandas(topk_fn, schema)


def lsh_members(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(tbl, bucket, __id, __vec, __nrm) in ONE map-side Arrow pass.

    Fuses norm + bucket computation + the xN_TABLES fanout into the scan stage: no
    repartition shuffle, no separate explode projection -- stage-count
    is what dominates bucketed-ANN wall clock once the folds are numpy
    (round-2 profile: each extra stage ~0.15-0.6 s at sf0.1).  At
    100 TB parquet supplies the map-side parallelism (many splits);
    the only shuffle left in the plan is the groupBy on (tbl, bucket)."""
    import pandas as pd

    src = _drop_zero_vectors(emb, vec_col).select(F.col(id_col), F.col(vec_col))
    id_field, vec_field = src.schema[id_col], src.schema[vec_col]

    def member_batches(batches):
        for pdf in batches:
            E = _stack(pdf[vec_col])
            n = E.shape[0]
            if n == 0:
                continue
            nrm = np.sqrt(_seq_dot(E, E))
            buckets = np.empty((N_TABLES, n), dtype=np.int64)
            for t in range(N_TABLES):
                b = np.zeros(n, dtype=np.int64)
                for r in range(TABLE_BITS):
                    plane = PLANES_MAT[t * TABLE_BITS + r]
                    d = _seq_dot(E, np.broadcast_to(plane, E.shape))
                    b += np.where(d >= 0, 2 ** r, 0)
                buckets[t] = b
            yield pd.DataFrame({
                "tbl": np.repeat(np.arange(N_TABLES, dtype=np.int32), n),
                "bucket": buckets.ravel(),
                "__id": np.tile(pdf[id_col].to_numpy(), N_TABLES),
                "__vec": pd.Series(list(pdf[vec_col]) * N_TABLES),
                "__nrm": np.tile(nrm, N_TABLES),
            })

    schema = StructType([
        StructField("tbl", IntegerType()), StructField("bucket", LongType()),
        StructField("__id", id_field.dataType),
        StructField("__vec", vec_field.dataType),
        StructField("__nrm", DoubleType()),
    ])
    return src.mapInPandas(member_batches, schema)


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """(vec_id, rank, neighbor_id, cosine) from slim candidate rows in
    ONE shuffle on qid: dedup duplicate (qid, nid) pairs by max (the
    same neighbor reached via several tables/cells scores identical
    doubles), order by cosine desc / nid asc, emit ranks 1..k.

    Stays JVM-side: both the max-dedup aggregate and the ranking window
    are whole-stage-codegen operators over slim rows.  A pandas variant
    was measured and rejected twice at sf0.1 -- per-qid applyInPandas
    pays ~ms of pandas setup per group (6 s for 2k groups once AQE
    coalesces them into one task), and even a vectorized
    whole-partition mapInPandas loses to codegen because each python
    stage boundary costs ~0.4-0.5 s of worker dispatch regardless of
    work."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.groupBy("qid", "nid").agg(F.max("cosine").alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"), F.col("rank"),
            F.col("nid").alias("neighbor_id"),
            F.round(F.col("cosine"), 6).alias("cosine"),
        )
    )


# cosine_knn materialises an O(n^2) candidate space; above this many
# input vectors the pair count (1e5^2 = 1e10) stops being a "quality
# baseline" and becomes a cluster-killer, so the caller must opt in.
EXACT_KNN_MAX_ROWS = 100_000


class ExactKnnTooLarge(RuntimeError):
    """cosine_knn refused a large input; pass exact=True or use lsh_knn/ivf_knn."""


def cosine_knn(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
               vec_col: str = "embedding", exact: bool = False,
               blocks: int = 8) -> DataFrame:
    """Exact top-k cosine neighbors for every vector.

    Plan shape (round-7 blocked all-pairs): vectors land in ``blocks``
    row-blocks by id hash; every unordered block pair (a <= b) forms one
    applyInPandas group whose members' pairwise cosines are scored
    in-numpy (chunked outer-product fold, left-to-right -- bit-identical
    to the SQL aggregate) and only per-member top-k rows leave the
    group; a (qid, nid) dedup collapses the same-block pairs that
    multiple groups re-score, and a global window finishes exact top-k.
    The baseline stays deliberately quadratic in COMPUTE, but nothing
    quadratic is ever SHUFFLED: each vector is replicated ``blocks``
    times (vs n times for the pair-join spelling, which materialized
    n^2 wide vector rows through a nested-loop join -- 18.7 s at sf0.1
    against ~1 s blocked).  Same per-pair folds, same tie-breaks, same
    output.

    To stop the footgun firing silently at scale, inputs larger than
    ``EXACT_KNN_MAX_ROWS`` raise :class:`ExactKnnTooLarge` unless the
    caller passes ``exact=True``; the scale paths are ``lsh_knn`` /
    ``ivf_knn``.  The guard costs one count() over the (pruned) id
    column -- negligible next to the n^2 compute it is guarding.
    """
    from pyspark.sql.window import Window

    if not exact:
        n = emb.select(id_col).count()
        if n > EXACT_KNN_MAX_ROWS:
            raise ExactKnnTooLarge(
                f"cosine_knn input has {n} rows (> {EXACT_KNN_MAX_ROWS}): "
                f"the exact all-pairs baseline would score ~{n * n:.1e} "
                "pairs. Use lsh_knn/ivf_knn, or pass exact=True to force."
            )
    with_norm = vector_norms(emb, id_col, vec_col)
    base = with_norm.select(
        F.pmod(F.hash(F.col(id_col)), F.lit(blocks)).alias("__blk"),
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"),
        F.col("nrm").alias("__nrm"),
    )
    # fan each vector to every group containing its block: group key is
    # the UNORDERED block pair, so v in block a meets block x's vectors
    # in group (min(a,x), max(a,x)) -- exactly `blocks` groups per
    # vector, one membership row each
    members = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("__other"),
        "__blk", "__id", "__vec", "__nrm",
    ).select(
        F.least("__blk", "__other").alias("ga"),
        F.greatest("__blk", "__other").alias("gb"),
        "__id", "__vec", "__nrm",
    )
    scored = _grouped_topk(members, ["ga", "gb"], k)
    # same-block pairs are scored once per group that includes their
    # block; the per-pair fold is order-independent of group
    # composition, so duplicates carry identical cosines -- max() is a
    # dedup, not a choice.  Candidate volume is n*blocks*k slim rows.
    cand = scored.groupBy("qid", "nid").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("rank"),
            F.col("nid").alias("neighbor_id"),
            F.round(F.col("cosine"), 6).alias("cosine"),
        )
    )


def lsh_bucket_spark_sql(vec_col: str = "embedding") -> str:
    """Spark-SQL expression assigning the hyperplane-LSH bucket id."""
    bits = []
    for p, plane in enumerate(HYPERPLANES):
        arr = "array(" + ", ".join(f"CAST({s} AS DOUBLE)" for s in plane) + ")"
        d = dot_sql(vec_col, arr)
        bits.append(f"CASE WHEN {d} >= 0 THEN {2 ** p} ELSE 0 END")
    return " + ".join(bits)


def lsh_bucket_duckdb_sql(vec_col: str = "embedding") -> str:
    """DuckDB twin: identical buckets from the same sign table."""
    bits = []
    for p, plane in enumerate(HYPERPLANES):
        arr = "[" + ", ".join(f"CAST({s} AS DOUBLE)" for s in plane) + "]"
        d = (
            f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
            f"CAST({vec_col}[i] AS DOUBLE) * ({arr})[i]))"
        )
        bits.append(f"CASE WHEN {d} >= 0 THEN {2 ** p} ELSE 0 END")
    return " + ".join(bits)


def _bucket_sql_for_planes(vec_col: str, plane_idxs: list[int], duckdb: bool) -> str:
    bits = []
    for rank, p in enumerate(plane_idxs):
        plane = HYPERPLANES[p]
        if duckdb:
            arr = "[" + ", ".join(f"CAST({s} AS DOUBLE)" for s in plane) + "]"
            d = (
                f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
                f"CAST({vec_col}[i] AS DOUBLE) * ({arr})[i]))"
            )
        else:
            arr = "array(" + ", ".join(f"CAST({s} AS DOUBLE)" for s in plane) + ")"
            d = dot_sql(vec_col, arr)
        bits.append(f"CASE WHEN {d} >= 0 THEN {2 ** rank} ELSE 0 END")
    return " + ".join(bits)


def table_bucket_sql(vec_col: str, table: int, duckdb: bool = False) -> str:
    """Bucket id for LSH table ``table`` (TABLE_BITS planes per table)."""
    idxs = list(range(table * TABLE_BITS, (table + 1) * TABLE_BITS))
    return _bucket_sql_for_planes(vec_col, idxs, duckdb)


def cosine_near_dup(emb: DataFrame, threshold: float = 0.40,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    Same scale shape as lsh_knn: candidates come only from shared LSH
    buckets (shuffle key = (table, bucket), never a cross join), exact
    cosine re-rank on candidates, threshold filter.  Pairs above the
    threshold that share no bucket are absent by contract -- the oracle
    reproduces the identical candidate generation so the approximation
    itself is what gets verified."""
    import pandas as pd

    members = lsh_members(emb, id_col, vec_col)

    def near_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                 "cosine": np.empty(0, dtype=np.float64)})
        E = _stack(pdf["__vec"])
        nrm = pdf["__nrm"].to_numpy()
        a_out, b_out, c_out = [], [], []
        for s, cos in _chunked_cosines(E, E, nrm, nrm):
            for local in range(cos.shape[0]):
                # keep only the upper triangle: id_a < id_b (ids sorted)
                cos[local, :s + local + 1] = -np.inf
            qi, ni = np.nonzero(cos >= threshold)
            a_out.append(ids[qi + s])
            b_out.append(ids[ni])
            c_out.append(cos[qi, ni])
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out),
                             "cosine": np.concatenate(c_out)})

    id_type = members.schema["__id"].dataType
    schema = StructType([
        StructField("id_a", id_type), StructField("id_b", id_type),
        StructField("cosine", DoubleType()),
    ])
    return (
        members.groupBy("tbl", "bucket").applyInPandas(near_fn, schema)
        .groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


# IVF coarse quantization: NLIST deterministic centroids (the lowest
# NLIST ids -- reproducible in any engine without a trained codebook),
# every vector assigned to its nearest centroid, queries probe the
# NPROBE nearest cells.  At scale the centroid table is broadcast
# (NLIST rows), assignment is map-side, and the candidate join shuffles
# on cell id only.  NLIST sizes the candidate set: cells average
# n/NLIST vectors, so candidates/query ~ NPROBE * n/NLIST; production
# would grow NLIST ~ sqrt(n) -- 64 keeps the re-rank ~1.5M pairs at
# sf0.1 (16 made it 6M+ and 4x slower).
IVF_NLIST = 64
IVF_NPROBE = 4


def ivf_members(emb: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding",
                nprobe: int = IVF_NPROBE) -> DataFrame:
    """(cell, indexed, __id, __vec, __nrm): nearest-centroid probe
    assignment fused with norms in one map-side Arrow pass.

    The centroid table (IVF_NLIST deterministic rows -- the lowest ids,
    reproducible in any engine without a trained codebook) is collected
    to the driver and closed over by the numpy stage: the mapInPandas
    equivalent of a broadcast join.  Each vector ranks its own NLIST
    sims in-batch and emits one row per probed cell, tagged with
    whether the vector is INDEXED there (home cell = nearest).  No
    repartition, no cells-to-stats join -- the only shuffle in the
    ivf_knn plan is the groupBy on cell."""
    import pandas as pd

    emb = _drop_zero_vectors(emb, vec_col)
    cent_rows = (
        emb.orderBy(F.col(id_col).asc()).limit(IVF_NLIST)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
        .collect()
    )
    src = emb.select(F.col(id_col), F.col(vec_col))
    id_field, vec_field = src.schema[id_col], src.schema[vec_col]
    # tiny tables: fewer centroids than probes -- probe what exists
    # (argsort would otherwise yield < nprobe columns and the output
    # arrays would disagree on length)
    nprobe = min(nprobe, len(cent_rows))
    if nprobe == 0:
        return src.sparkSession.createDataFrame([], StructType([
            StructField("cell", LongType()), StructField("indexed", BooleanType()),
            StructField("__id", id_field.dataType),
            StructField("__vec", vec_field.dataType),
            StructField("__nrm", DoubleType()),
        ]))
    # rows sorted by cell id: stable argsort then breaks sim ties by
    # ascending cell, matching ORDER BY sim DESC, cell ASC in the oracle.
    cent_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])

    def member_batches(batches):
        for pdf in batches:
            E = _stack(pdf[vec_col])
            n = E.shape[0]
            if n == 0:
                continue
            nrm = np.sqrt(_seq_dot(E, E))
            sims = np.empty((n, len(cent_ids)), dtype=np.float64)
            for j in range(len(cent_ids)):
                sims[:, j] = _seq_dot(E, np.broadcast_to(C[j], E.shape)) / (nrm * cn[j])
            # stable argsort on -sim: ties keep column order = cell asc
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame({
                "cell": cent_ids[order].ravel(),
                "indexed": np.tile(
                    np.arange(nprobe) == 0, n),
                "__id": np.repeat(pdf[id_col].to_numpy(), nprobe),
                "__vec": pd.Series(
                    [v for v in pdf[vec_col] for _ in range(nprobe)]),
                "__nrm": np.repeat(nrm, nprobe),
            })

    schema = StructType([
        StructField("cell", LongType()), StructField("indexed", BooleanType()),
        StructField("__id", id_field.dataType),
        StructField("__vec", vec_field.dataType),
        StructField("__nrm", DoubleType()),
    ])
    return src.mapInPandas(member_batches, schema)


def ivf_knn(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k cosine via IVF: probe NPROBE cells per query,
    exact cosine over vectors indexed in those cells.

    Plan shape (3 stages): fused map-side probe assignment, one shuffle
    on cell for in-group scoring (a neighbor is indexed in exactly one
    cell, so (qid, nid) pairs are unique across groups -- no distinct
    needed, and only top-k slim rows leave each group), then the
    JVM-side dedup + ranking of _ranked_topk."""
    import pandas as pd

    members = ivf_members(emb, id_col, vec_col)

    def cell_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        idx_mask = pdf["indexed"].to_numpy()
        ids = pdf["__id"].to_numpy()
        nids = ids[idx_mask]
        if len(nids) == 0 or len(ids) == 0:
            return pd.DataFrame({"qid": ids[:0], "nid": ids[:0],
                                 "cosine": np.empty(0, dtype=np.float64)})
        E = _stack(pdf["__vec"])
        nrm = pdf["__nrm"].to_numpy()
        NE, nn = E[idx_mask], nrm[idx_mask]
        q_out, n_out, c_out = [], [], []
        for s, cos in _chunked_cosines(E, NE, nrm, nn):
            qids_blk = ids[s:s + cos.shape[0]]
            self_pos = np.searchsorted(nids, qids_blk)
            for local, qv in enumerate(qids_blk):
                p = self_pos[local]
                if p < len(nids) and nids[p] == qv:
                    cos[local, p] = -np.inf  # exclude self
            kk = min(k, len(nids))
            order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            vals = np.take_along_axis(cos, order, axis=1)
            keep = np.isfinite(vals)
            q_out.append(np.repeat(qids_blk, kk)[keep.ravel()])
            n_out.append(nids[order].ravel()[keep.ravel()])
            c_out.append(vals.ravel()[keep.ravel()])
        return pd.DataFrame({"qid": np.concatenate(q_out),
                             "nid": np.concatenate(n_out),
                             "cosine": np.concatenate(c_out)})

    id_type = members.schema["__id"].dataType
    schema = StructType([
        StructField("qid", id_type), StructField("nid", id_type),
        StructField("cosine", DoubleType()),
    ])
    scored = members.groupBy("cell").applyInPandas(cell_fn, schema)
    return _ranked_topk(scored, k)


def semantic_dedup_manifest(emb: DataFrame, threshold: float = 0.40,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 -- public method): cluster the embedding space,
    then inside each cluster mark as a DUPLICATE every vector whose
    cosine to a LOWER-id cluster-mate reaches the threshold; the
    lowest-id member of each semantic neighborhood survives.  Returns
    the purge manifest: (vec_id, keeper_id, cosine) where keeper_id is
    the LOWEST-id in-cluster neighbor at or above the threshold (a
    deterministic survivor rule, like dedup_purge_canonical's).

    Scale shape: the cluster assignment is the IVF home-cell pass
    (map-side, centroid table broadcast into the Arrow stage), the only
    shuffle keys on cell, the quadratic scoring happens in-numpy inside
    each cell with chunked left-to-right folds (bit-identical to the
    SQL aggregate), and only manifest rows leave a cell -- the pair
    space is bounded by sum-over-cells(|cell|^2), never corpus^2,
    which is the entire point of clustering first (SemDeDup section 3).
    The oracled face uses the deterministic lowest-id codebook so DuckDB
    reproduces the identical cells; a production run swaps in
    kmeans_centroids codebooks (same serving shape, rows-only check --
    the similarity_ivfpq_trained precedent)."""
    import pandas as pd

    members = ivf_members(emb, id_col, vec_col, nprobe=1)

    def cell_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"vec_id": ids[:0], "keeper_id": ids[:0],
                                 "cosine": np.empty(0, dtype=np.float64)})
        E = _stack(pdf["__vec"])
        nrm = pdf["__nrm"].to_numpy()
        d_out, k_out, c_out = [], [], []
        for s, cos in _chunked_cosines(E, E, nrm, nrm):
            for local in range(cos.shape[0]):
                g = s + local          # global row index = id rank asc
                if g == 0:
                    continue
                hits = np.nonzero(cos[local, :g] >= threshold)[0]
                if hits.size:
                    j = int(hits[0])   # lowest-id qualifying neighbor
                    d_out.append(ids[g])
                    k_out.append(ids[j])
                    c_out.append(cos[local, j])
        return pd.DataFrame({
            "vec_id": np.asarray(d_out, dtype=ids.dtype),
            "keeper_id": np.asarray(k_out, dtype=ids.dtype),
            "cosine": np.asarray(c_out, dtype=np.float64),
        })

    id_type = members.schema["__id"].dataType
    schema = StructType([
        StructField("vec_id", id_type), StructField("keeper_id", id_type),
        StructField("cosine", DoubleType()),
    ])
    return (
        members.groupBy("cell").applyInPandas(cell_fn, schema)
        .select("vec_id", "keeper_id", F.round("cosine", 6).alias("cosine"))
    )


def lsh_knn(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k cosine via multi-table hyperplane LSH.

    Plan: per vector compute N_TABLES bucket ids map-side; explode to
    (table, bucket, id, vec); candidates = distinct same-bucket pairs in
    ANY table (equi-join per table -- the shuffle key is (table,
    bucket), never an O(n^2) cross product); exact cosine only on
    candidates; per-qid ranked top-k.  Missing neighbors (no shared
    bucket) are genuinely absent -- that is the approximation contract.

    Plan shape: fused map-side bucketing, one shuffle on (tbl, bucket)
    for in-group scoring, then the JVM-side dedup + ranking of
    _ranked_topk."""
    # Quadratic work stays inside each (table, bucket) Arrow group; a
    # vector appears in exactly one bucket per table, so its global
    # candidate set is the union of its N_TABLES groups and the union
    # of per-group top-k contains the global top-k.  Only slim
    # (qid, nid, cosine) rows shuffle after the group stage; the same
    # neighbor found via two tables dedups by max (identical doubles).
    members = lsh_members(emb, id_col, vec_col)
    scored = _grouped_topk(members, ["tbl", "bucket"], k)
    return _ranked_topk(scored, k)


def ivf_search(corpus: DataFrame, queries: DataFrame, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Query-set vs corpus ANN -- the serving shape of IVF: the CORPUS
    is indexed once (each vector in its home cell; centroids = the
    NLIST lowest-id corpus vectors, codebook-free and reproducible in
    any engine), and the QUERY batch probes its NPROBE nearest cells;
    exact cosine runs only inside probed cells.  Unlike ivf_knn's
    self-join, query vectors are never candidates -- neighbors come
    exclusively from the corpus.

    Plan shape: two fused map-side assignment passes (no shuffle), one
    shuffle on cell for in-group scoring, then _ranked_topk's JVM-side
    dedup + ranking.  At 100 TB the corpus assignment is a one-time
    index build (persisted in production); the per-batch cost is the
    small query side plus the probed cells."""
    corpus = _drop_zero_vectors(corpus, vec_col)
    queries = _drop_zero_vectors(queries, vec_col)
    cent_rows = (
        corpus.orderBy(F.col(id_col).asc()).limit(IVF_NLIST)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
        .collect()
    )
    if not cent_rows:
        cent_ids = np.empty(0, dtype=np.int64)
        C = np.empty((0, 0), dtype=np.float64)
    else:
        cent_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
        C = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cent_rows])
    return _ivf_search_core(corpus, queries, k, id_col, vec_col, cent_ids, C)


def _ivf_search_core(corpus: DataFrame, queries: DataFrame, k: int,
                     id_col: str, vec_col: str,
                     cent_ids: np.ndarray, C: np.ndarray) -> DataFrame:
    """Shared IVF serving plan: centroids are an already-built (ids,
    matrix) codebook -- deterministic lowest-id rows for the oracled
    path, trained k-means for the quality path.  Inputs must already be
    zero-vector-free."""
    import pandas as pd

    src_c = corpus.select(F.col(id_col), F.col(vec_col))
    src_q = queries.select(F.col(id_col), F.col(vec_col))
    id_field, vec_field = src_c.schema[id_col], src_c.schema[vec_col]
    member_schema = StructType([
        StructField("cell", LongType()), StructField("is_q", BooleanType()),
        StructField("__id", id_field.dataType),
        StructField("__vec", vec_field.dataType),
        StructField("__nrm", DoubleType()),
    ])
    out_schema = StructType([
        StructField("qid", id_field.dataType),
        StructField("nid", id_field.dataType),
        StructField("cosine", DoubleType()),
    ])
    if len(cent_ids) == 0:
        empty = src_c.sparkSession.createDataFrame([], out_schema)
        return _ranked_topk(empty, k)
    cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])

    def assign_fn(nprobe: int, is_q: bool):
        def batches(bs):
            for pdf in bs:
                E = _stack(pdf[vec_col])
                n = E.shape[0]
                if n == 0:
                    continue
                nrm = np.sqrt(_seq_dot(E, E))
                sims = np.empty((n, len(cent_ids)), dtype=np.float64)
                for j in range(len(cent_ids)):
                    sims[:, j] = _seq_dot(
                        E, np.broadcast_to(C[j], E.shape)) / (nrm * cn[j])
                # stable argsort: sim ties keep cell-ascending order,
                # matching ORDER BY sim DESC, cell ASC in the oracle
                order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
                yield pd.DataFrame({
                    "cell": cent_ids[order].ravel(),
                    "is_q": np.full(n * nprobe, is_q),
                    "__id": np.repeat(pdf[id_col].to_numpy(), nprobe),
                    "__vec": pd.Series(
                        [v for v in pdf[vec_col] for _ in range(nprobe)]),
                    "__nrm": np.repeat(nrm, nprobe),
                })
        return batches

    nprobe_q = min(IVF_NPROBE, len(cent_ids))
    members = (
        src_c.mapInPandas(assign_fn(1, False), member_schema)
        .unionByName(src_q.mapInPandas(assign_fn(nprobe_q, True), member_schema))
    )

    def cell_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        qmask = pdf["is_q"].to_numpy()
        nids = pdf["__id"].to_numpy()[~qmask]
        qids = pdf["__id"].to_numpy()[qmask]
        if len(nids) == 0 or len(qids) == 0:
            return pd.DataFrame({"qid": qids[:0], "nid": qids[:0],
                                 "cosine": np.empty(0, dtype=np.float64)})
        E = _stack(pdf["__vec"])
        nrm = pdf["__nrm"].to_numpy()
        QE, qn = E[qmask], nrm[qmask]
        NE, nn = E[~qmask], nrm[~qmask]
        kk = min(k, len(nids))
        q_out, n_out, c_out = [], [], []
        for s, cos in _chunked_cosines(QE, NE, qn, nn):
            order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            q_out.append(np.repeat(qids[s:s + cos.shape[0]], kk))
            n_out.append(nids[order].ravel())
            c_out.append(np.take_along_axis(cos, order, axis=1).ravel())
        return pd.DataFrame({"qid": np.concatenate(q_out),
                             "nid": np.concatenate(n_out),
                             "cosine": np.concatenate(c_out)})

    scored = members.groupBy("cell").applyInPandas(cell_fn, out_schema)
    return _ranked_topk(scored, k)


def kmeans_centroids(corpus: DataFrame, nlist: int = IVF_NLIST,
                     iters: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Deterministic distributed spherical k-means for IVF centroid
    training -- the quality half the lowest-id codebook trades away.

    Lloyd iterations with a fixed count (no data-dependent stopping), a
    deterministic init (unit vectors of the ``nlist`` lowest-id rows),
    and a content-sorted partial reduce, so repeated runs on the same
    data AND the same input partitioning yield bit-identical codebooks
    without any RNG.  (Across different partitionings the per-batch
    partial sums themselves differ, so determinism is per-layout --
    float summation order changes by ~1 ulp, never cluster quality.)
    Assignment metric is cosine (matching the serving-side probe),
    so training operates on UNIT vectors and the update step is the
    normalized mean direction of each cell's members.

    Scale shape per iteration: one map-side Arrow pass emits per-BATCH
    partial (sum-vector, count) rows -- at most nlist rows per batch --
    and only those partials are collected (bounded by nlist x
    input-partitions rows of dim doubles, independent of corpus size;
    the same constant-size-collect discipline as the 1-row convergence
    probes elsewhere).  The full corpus is never collected and never
    reshuffled; the codebook matrix (nlist x dim) is what a production
    job would persist.

    Not oracle-gated: a DuckDB re-implementation of iterative k-means
    adds no verification value; quality is pinned instead by the
    recall-vs-brute-force test in tests/test_mining_ops.py."""
    import pandas as pd

    corpus = _drop_zero_vectors(corpus, vec_col)
    init_rows = (corpus.orderBy(F.col(id_col).asc()).limit(nlist)
                 .select(vec_col).collect())
    if not init_rows:
        return np.empty((0, 0), dtype=np.float64)
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                  for r in init_rows])
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    n_cells, dim = C.shape
    src = corpus.select(vec_col)
    partial_schema = StructType([
        StructField("cell", LongType()),
        StructField("psum", ArrayType(DoubleType())),
        StructField("cnt", LongType()),
    ])

    for _ in range(iters):
        Cb = C  # closed over by this iteration's Arrow stage

        def partial_batches(bs, Cb=Cb):
            for pdf in bs:
                E = _stack(pdf[vec_col])
                if E.shape[0] == 0:
                    continue
                U = E / np.sqrt(_seq_dot(E, E))[:, None]
                sims = U @ Cb.T
                assign = np.argmax(sims, axis=1)
                sums = np.zeros((n_cells, dim), dtype=np.float64)
                counts = np.zeros(n_cells, dtype=np.int64)
                np.add.at(sums, assign, U)
                np.add.at(counts, assign, 1)
                live = np.nonzero(counts)[0]
                yield pd.DataFrame({
                    "cell": live.astype(np.int64),
                    "psum": list(sums[live]),
                    "cnt": counts[live],
                })

        partials = src.mapInPandas(partial_batches, partial_schema).collect()
        # accumulate in a content-sorted order, not collect (= task
        # completion) order: float addition is non-associative, so an
        # order-free reduce would make the codebook bits depend on task
        # scheduling even for identical data + layout.
        partials.sort(key=lambda r: (r["cell"], r["cnt"], tuple(r["psum"])))
        sums = np.zeros((n_cells, dim), dtype=np.float64)
        counts = np.zeros(n_cells, dtype=np.int64)
        for r in partials:
            sums[r["cell"]] += np.asarray(r["psum"], dtype=np.float64)
            counts[r["cell"]] += r["cnt"]
        live = counts > 0
        newC = C.copy()  # empty cells keep their previous direction
        newC[live] = sums[live] / counts[live, None]
        norms = np.linalg.norm(newC, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        C = newC / norms
    return C


def ivf_search_trained(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       nlist: int = IVF_NLIST, iters: int = 5,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """``ivf_search`` served from a k-means-trained codebook instead of
    the lowest-id rows: same plan shape (map-side probe assignment, one
    shuffle on cell, JVM-side ranking), better-calibrated recall because
    the cells follow the data's actual density.  Cell labels are the
    codebook row indices 0..nlist-1."""
    corpus = _drop_zero_vectors(corpus, vec_col)
    queries = _drop_zero_vectors(queries, vec_col)
    C = kmeans_centroids(corpus, nlist=nlist, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    cent_ids = np.arange(C.shape[0], dtype=np.int64)
    return _ivf_search_core(corpus, queries, k, id_col, vec_col, cent_ids, C)


# --- product quantization (the IVF-PQ compression companion) ---------------
# PQ splits the vector into PQ_M subspaces and snaps each subvector to
# its nearest codebook entry -- the memory-compression half of the
# canonical 100 TB ANN stack (IVF narrows the search, PQ shrinks the
# residency: 64 floats -> PQ_M codes).  The codebook is deterministic
# (the PQ_K lowest-id vectors' subvectors, the same no-training rule as
# IVF's centroid table) so a SQL oracle regenerates it exactly.  At
# scale: the codebook is a constant broadcast, assignment is map-side
# Arrow, and the only shuffle downstream is whatever aggregate consumes
# the codes.
PQ_M = 8                 # subspaces
PQ_SUB = DIM // PQ_M     # dims per subspace
PQ_K = 16                # codes per subspace


def pq_codes(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id, subspace, code, sq_err): per-subspace nearest-codebook
    assignment with its squared L2 error.

    Distances fold LEFT-TO-RIGHT over the subspace dims (cumsum), so
    the doubles match the oracle's list_sum fold bit-for-bit; argmin
    ties break toward the lowest code id (numpy first-minimum over a
    codebook ordered by id == ORDER BY dist, cid)."""
    import pandas as pd

    cb_rows = (
        emb.orderBy(F.col(id_col).asc()).limit(PQ_K)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    cb_ids = np.array([r["cid"] for r in cb_rows], dtype=np.int64)
    CB = np.stack([np.asarray(r["cv"], dtype=np.float64) for r in cb_rows])
    src = emb.select(F.col(id_col), F.col(vec_col))
    id_type = src.schema[id_col].dataType
    schema = StructType([
        StructField("vec_id", id_type),
        StructField("subspace", IntegerType()),
        StructField("code", LongType()),
        StructField("sq_err", DoubleType()),
    ])

    def code_batches(batches):
        for pdf in batches:
            E = _stack(pdf[vec_col])
            n = E.shape[0]
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            out_id, out_s, out_c, out_e = [], [], [], []
            for s in range(PQ_M):
                lo, hi = s * PQ_SUB, (s + 1) * PQ_SUB
                sub = E[:, lo:hi]
                d2 = np.empty((n, PQ_K), dtype=np.float64)
                for k in range(PQ_K):
                    diff = sub - CB[k, lo:hi]
                    # sequential fold (see _seq_dot): oracle-identical
                    d2[:, k] = np.cumsum(diff * diff, axis=1)[:, -1]
                best = np.argmin(d2, axis=1)  # first min == lowest cid
                out_id.append(ids)
                out_s.append(np.full(n, s, dtype=np.int32))
                out_c.append(cb_ids[best])
                out_e.append(d2[np.arange(n), best])
            yield pd.DataFrame({
                "vec_id": np.concatenate(out_id),
                "subspace": np.concatenate(out_s),
                "code": np.concatenate(out_c),
                "sq_err": np.concatenate(out_e),
            })

    return src.mapInPandas(code_batches, schema)


def pq_codebooks_trained(corpus: DataFrame, iters: int = 5,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> np.ndarray:
    """(PQ_M, PQ_K, PQ_SUB) per-subspace codebooks trained with
    deterministic L2 Lloyd iterations -- the quality half of PQ that the
    lowest-id codebook (kept for the SQL oracle) trades away.

    Same distributed-training shape as ``kmeans_centroids``: a fixed
    iteration count, a deterministic init (the PQ_K lowest-id vectors'
    subvectors, i.e. exactly the untrained codebook), a content-sorted
    partial reduce (bit-identical per data + input layout), and one
    map-side Arrow pass per iteration that emits per-batch partial
    (sum, count) rows for all PQ_M x PQ_K cells at once; only those
    partials (at most PQ_M*PQ_K rows per batch) reach the driver.  Assignment metric is
    squared L2 per subspace, matching ``pq_codes``' quantizer.

    Not oracle-gated; quality is pinned by the distortion-reduction test
    (trained codebooks must cut mean squared quantization error vs the
    untrained ones) in tests/test_mining_ops.py."""
    import pandas as pd

    corpus = _drop_zero_vectors(corpus, vec_col)
    init_rows = (corpus.orderBy(F.col(id_col).asc()).limit(PQ_K)
                 .select(vec_col).collect())
    if not init_rows:
        return np.empty((PQ_M, 0, PQ_SUB), dtype=np.float64)
    flat = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                     for r in init_rows])
    n_codes = flat.shape[0]
    CB = np.stack([flat[:, s * PQ_SUB:(s + 1) * PQ_SUB]
                   for s in range(PQ_M)])          # (PQ_M, n_codes, PQ_SUB)
    src = corpus.select(vec_col)
    partial_schema = StructType([
        StructField("slot", LongType()),           # s * n_codes + code
        StructField("psum", ArrayType(DoubleType())),
        StructField("cnt", LongType()),
    ])

    for _ in range(iters):
        CBb = CB

        def partial_batches(bs, CBb=CBb):
            for pdf in bs:
                E = _stack(pdf[vec_col])
                if E.shape[0] == 0:
                    continue
                sums = np.zeros((PQ_M * n_codes, PQ_SUB), dtype=np.float64)
                counts = np.zeros(PQ_M * n_codes, dtype=np.int64)
                for s in range(PQ_M):
                    sub = E[:, s * PQ_SUB:(s + 1) * PQ_SUB]
                    # ||x-c||^2 = ||x||^2 - 2xc + ||c||^2; argmin only
                    # needs the last two terms
                    d2 = (-2.0 * sub @ CBb[s].T
                          + (CBb[s] * CBb[s]).sum(axis=1))
                    best = np.argmin(d2, axis=1) + s * n_codes
                    np.add.at(sums, best, sub)
                    np.add.at(counts, best, 1)
                live = np.nonzero(counts)[0]
                yield pd.DataFrame({
                    "slot": live.astype(np.int64),
                    "psum": list(sums[live]),
                    "cnt": counts[live],
                })

        partials = src.mapInPandas(partial_batches, partial_schema).collect()
        # content-sorted accumulation: see kmeans_centroids -- removes
        # task-completion-order nondeterminism from the float reduce.
        partials.sort(key=lambda r: (r["slot"], r["cnt"], tuple(r["psum"])))
        sums = np.zeros((PQ_M * n_codes, PQ_SUB), dtype=np.float64)
        counts = np.zeros(PQ_M * n_codes, dtype=np.int64)
        for r in partials:
            sums[r["slot"]] += np.asarray(r["psum"], dtype=np.float64)
            counts[r["slot"]] += r["cnt"]
        newCB = CB.copy()  # empty cells keep their previous entry
        live = counts > 0
        flat_cb = newCB.reshape(PQ_M * n_codes, PQ_SUB)
        flat_cb[live] = sums[live] / counts[live, None]
        CB = flat_cb.reshape(PQ_M, n_codes, PQ_SUB)
    return CB


def pq_codes_trained(emb: DataFrame, iters: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """``pq_codes`` quantizing against ``pq_codebooks_trained`` output:
    same (vec_id, subspace, code, sq_err) schema, codes are codebook row
    indices 0..PQ_K-1.  Same map-side Arrow plan; the trained codebook
    is a driver constant closed over by the stage."""
    import pandas as pd

    CB = pq_codebooks_trained(emb, iters=iters, id_col=id_col,
                              vec_col=vec_col)
    emb = _drop_zero_vectors(emb, vec_col)
    src = emb.select(F.col(id_col), F.col(vec_col))
    id_type = src.schema[id_col].dataType
    n_codes = CB.shape[1]
    schema = StructType([
        StructField("vec_id", id_type),
        StructField("subspace", IntegerType()),
        StructField("code", LongType()),
        StructField("sq_err", DoubleType()),
    ])

    def code_batches(batches):
        for pdf in batches:
            E = _stack(pdf[vec_col])
            n = E.shape[0]
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy()
            out_id, out_s, out_c, out_e = [], [], [], []
            for s in range(PQ_M):
                sub = E[:, s * PQ_SUB:(s + 1) * PQ_SUB]
                d2 = ((sub * sub).sum(axis=1)[:, None]
                      - 2.0 * sub @ CB[s].T
                      + (CB[s] * CB[s]).sum(axis=1))
                best = np.argmin(d2, axis=1)
                out_id.append(ids)
                out_s.append(np.full(n, s, dtype=np.int32))
                out_c.append(best.astype(np.int64))
                out_e.append(np.maximum(d2[np.arange(n), best], 0.0))
            yield pd.DataFrame({
                "vec_id": np.concatenate(out_id),
                "subspace": np.concatenate(out_s),
                "code": np.concatenate(out_c),
                "sq_err": np.concatenate(out_e),
            })

    return src.mapInPandas(code_batches, schema)


def ivfpq_search(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ serving search: IVF candidate generation (home cells /
    NPROBE probes, exactly ivf_search's) scored against PQ-RECONSTRUCTED
    corpus vectors -- the full compressed-index ANN stack, where the
    index stores PQ_M codes per vector instead of DIM floats and
    queries rank by cosine to the reconstruction.

    Determinism contract: cell assignment uses the ORIGINAL corpus
    vector (the index build sees the real data); reconstruction snaps
    each subvector to the codebook entry chosen by the same
    sequential-fold argmin as pq_codes; the scoring norm folds the
    reconstructed 64 dims FLAT left-to-right, and the oracle rebuilds
    the same array (flatten of ordered codebook slices) so every double
    matches bit-for-bit."""
    corpus = _drop_zero_vectors(corpus, vec_col)
    queries = _drop_zero_vectors(queries, vec_col)
    cent_rows = (
        corpus.orderBy(F.col(id_col).asc()).limit(IVF_NLIST)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
        .collect()
    )
    cb_rows = (
        corpus.orderBy(F.col(id_col).asc()).limit(PQ_K)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    if not cent_rows or not cb_rows:
        cent_ids = np.empty(0, dtype=np.int64)
        C = np.empty((0, 0), dtype=np.float64)
        CBS32 = np.empty((PQ_M, 0, PQ_SUB), dtype=np.float32)
    else:
        cent_ids = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
        C = np.stack([np.asarray(r["cv"], dtype=np.float64)
                      for r in cent_rows])
        # codebook kept in the STORAGE dtype (float32): reconstructions
        # are exact codebook entries, cast to double only inside folds
        CB32 = np.stack([np.asarray(r["cv"], dtype=np.float32)
                         for r in cb_rows])
        CBS32 = np.stack([CB32[:, s_ * PQ_SUB:(s_ + 1) * PQ_SUB]
                          for s_ in range(PQ_M)])
    return _ivfpq_search_core(corpus, queries, k, id_col, vec_col,
                              cent_ids, C, CBS32)


def trained_codebooks(corpus: DataFrame, iters: int = 5,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Train both halves of the compressed index once: (IVF centroids,
    PQ codebooks).  A production job trains per corpus snapshot and
    persists the two small matrices; callers that serve many query
    batches pass the result to ``ivfpq_search_trained`` so training cost
    is paid once per corpus, not per search."""
    corpus = _drop_zero_vectors(corpus, vec_col)
    C = kmeans_centroids(corpus, iters=iters, id_col=id_col, vec_col=vec_col)
    CBS = pq_codebooks_trained(corpus, iters=iters, id_col=id_col,
                               vec_col=vec_col)
    return C, CBS


def ivfpq_search_trained(corpus: DataFrame, queries: DataFrame, k: int = 5,
                         iters: int = 5, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         codebooks: tuple[np.ndarray, np.ndarray] | None = None,
                         ) -> DataFrame:
    """``ivfpq_search`` served entirely from TRAINED codebooks: spherical
    k-means IVF centroids (``kmeans_centroids``) and per-subspace
    L2-Lloyd PQ codebooks (``pq_codebooks_trained``) -- the full
    production compressed-index stack with both quantizers calibrated to
    the data.  Same plan shape as the oracled path; quality pinned by
    the recall test in tests/test_mining_ops.py.  Pass ``codebooks``
    (from ``trained_codebooks``) to serve from an already-trained
    index."""
    corpus = _drop_zero_vectors(corpus, vec_col)
    queries = _drop_zero_vectors(queries, vec_col)
    if codebooks is None:
        codebooks = trained_codebooks(corpus, iters=iters, id_col=id_col,
                                      vec_col=vec_col)
    C, CBS = codebooks
    cent_ids = np.arange(C.shape[0], dtype=np.int64)
    return _ivfpq_search_core(corpus, queries, k, id_col, vec_col,
                              cent_ids, C, CBS.astype(np.float32))


def _ivfpq_search_core(corpus: DataFrame, queries: DataFrame, k: int,
                       id_col: str, vec_col: str, cent_ids: np.ndarray,
                       C: np.ndarray, CBS32: np.ndarray) -> DataFrame:
    """Shared IVF-PQ serving plan over an already-built coarse codebook
    (cent_ids, C) and per-subspace PQ codebook CBS32 of shape
    (PQ_M, n_codes, PQ_SUB)."""
    import pandas as pd

    src_c = corpus.select(F.col(id_col), F.col(vec_col))
    src_q = queries.select(F.col(id_col), F.col(vec_col))
    id_field, vec_field = src_c.schema[id_col], src_c.schema[vec_col]
    member_schema = StructType([
        StructField("cell", LongType()), StructField("is_q", BooleanType()),
        StructField("__id", id_field.dataType),
        StructField("__vec", vec_field.dataType),
        StructField("__nrm", DoubleType()),
    ])
    out_schema = StructType([
        StructField("qid", id_field.dataType),
        StructField("nid", id_field.dataType),
        StructField("cosine", DoubleType()),
    ])
    if len(cent_ids) == 0 or CBS32.shape[1] == 0:
        empty = src_c.sparkSession.createDataFrame([], out_schema)
        return _ranked_topk(empty, k)
    cn = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
    CBS64 = CBS32.astype(np.float64)
    n_codes = CBS32.shape[1]

    def corpus_batches(bs):
        for pdf in bs:
            E = _stack(pdf[vec_col])
            n = E.shape[0]
            if n == 0:
                continue
            nrm = np.sqrt(_seq_dot(E, E))
            sims = np.empty((n, len(cent_ids)), dtype=np.float64)
            for j in range(len(cent_ids)):
                sims[:, j] = _seq_dot(
                    E, np.broadcast_to(C[j], E.shape)) / (nrm * cn[j])
            home = cent_ids[np.argsort(-sims, axis=1, kind="stable")[:, 0]]
            recon = np.empty((n, DIM), dtype=np.float32)
            for s in range(PQ_M):
                lo, hi = s * PQ_SUB, (s + 1) * PQ_SUB
                sub = E[:, lo:hi]
                d2 = np.empty((n, n_codes), dtype=np.float64)
                for kk in range(n_codes):
                    diff = sub - CBS64[s, kk]
                    d2[:, kk] = np.cumsum(diff * diff, axis=1)[:, -1]
                best = np.argmin(d2, axis=1)  # first min == lowest cid
                recon[:, lo:hi] = CBS32[s][best]
            R64 = recon.astype(np.float64)
            rnrm = np.sqrt(np.cumsum(R64 * R64, axis=1)[:, -1])
            keep = rnrm > 0
            yield pd.DataFrame({
                "cell": home[keep],
                "is_q": np.zeros(int(keep.sum()), dtype=bool),
                "__id": pdf[id_col].to_numpy()[keep],
                "__vec": pd.Series(list(recon[keep])),
                "__nrm": rnrm[keep],
            })

    nprobe_q = min(IVF_NPROBE, len(cent_ids))

    def query_batches(bs):
        for pdf in bs:
            E = _stack(pdf[vec_col])
            n = E.shape[0]
            if n == 0:
                continue
            nrm = np.sqrt(_seq_dot(E, E))
            sims = np.empty((n, len(cent_ids)), dtype=np.float64)
            for j in range(len(cent_ids)):
                sims[:, j] = _seq_dot(
                    E, np.broadcast_to(C[j], E.shape)) / (nrm * cn[j])
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe_q]
            yield pd.DataFrame({
                "cell": cent_ids[order].ravel(),
                "is_q": np.ones(n * nprobe_q, dtype=bool),
                "__id": np.repeat(pdf[id_col].to_numpy(), nprobe_q),
                "__vec": pd.Series(
                    [v for v in pdf[vec_col] for _ in range(nprobe_q)]),
                "__nrm": np.repeat(nrm, nprobe_q),
            })

    members = (
        src_c.mapInPandas(corpus_batches, member_schema)
        .unionByName(src_q.mapInPandas(query_batches, member_schema))
    )

    def cell_fn(pdf):
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        qmask = pdf["is_q"].to_numpy()
        nids = pdf["__id"].to_numpy()[~qmask]
        qids = pdf["__id"].to_numpy()[qmask]
        if len(nids) == 0 or len(qids) == 0:
            return pd.DataFrame({"qid": qids[:0], "nid": qids[:0],
                                 "cosine": np.empty(0, dtype=np.float64)})
        E = _stack(pdf["__vec"])
        nrm = pdf["__nrm"].to_numpy()
        QE, qn = E[qmask], nrm[qmask]
        NE, nn = E[~qmask], nrm[~qmask]
        kk = min(k, len(nids))
        q_out, n_out, c_out = [], [], []
        for s, cos in _chunked_cosines(QE, NE, qn, nn):
            order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
            q_out.append(np.repeat(qids[s:s + cos.shape[0]], kk))
            n_out.append(nids[order].ravel())
            c_out.append(np.take_along_axis(cos, order, axis=1).ravel())
        return pd.DataFrame({"qid": np.concatenate(q_out),
                             "nid": np.concatenate(n_out),
                             "cosine": np.concatenate(c_out)})

    scored = members.groupBy("cell").applyInPandas(cell_fn, out_schema)
    return _ranked_topk(scored, k)
