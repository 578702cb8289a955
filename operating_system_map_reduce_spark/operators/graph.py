"""Distributed connected components over DataFrame edge lists.

The dedup pipeline's missing link: pair detectors (MinHash LSH, exact
hash, embedding cosine) emit EDGES, but building a deduplicated corpus
needs per-document CLUSTER labels — transitively closed, so that
A~B, B~C collapses {A,B,C} onto one canonical document even when A and
C never co-occur in a bucket.

Spark-first design (no GraphFrames dependency):
 - min-label propagation expressed as join + groupBy per round; every
   round is two shuffles on the node id, both AQE-coalesced.
 - convergence is detected with a cheap global aggregate (the sum of
   labels decreases monotonically and strictly until fixpoint), not a
   per-row diff join.
 - lineage is truncated every round with localCheckpoint — iterative
   self-join plans otherwise grow exponentially and overwhelm the
   optimizer by round ~8.  (At 100 TB this becomes a reliable
   checkpoint to object storage; same plan shape.)

Round count is bounded by the component DIAMETER, not n: near-dup
clusters are shallow (a handful of hops), so 3-5 rounds in practice.
For adversarial long-chain graphs the known O(log n)-round fix is
alternating large-star/small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14); the propagation form is
kept here because dedup graphs are diameter-bounded and the per-round
plan is half the shuffles.

Reference parity note: the reference engine (C++ kv/map-reduce server)
has no graph tier; this module is part of the charter's
training-data-pipeline extension, feeding plans/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Propagation did not reach a fixpoint within max_iter rounds."""


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """(id, comp) for every node in `edges`; comp = min node id in the
    component.  Edges may be directed/deduplicated or not — they are
    symmetrized and deduplicated here.

    Only nodes that appear in an edge are labeled (dedup singletons
    carry no edge and need no label; callers union them back if they
    want identity rows).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.union(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))).distinct()
    # Materialize the (static) edge list once; every round joins it.
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("comp").cast("long")).collect()[0][0]

    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label in the pool
        msgs = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "comp")
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("comp").cast("long")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise ConvergenceError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(component diameter exceeds the bound; raise max_iter or switch "
        "to large-star/small-star)"
    )
