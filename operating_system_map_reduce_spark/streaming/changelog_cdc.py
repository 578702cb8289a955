"""Streaming CDC replay of the append-only changelog.

Batch replay (sources/changelog.py) recomputes latest-per-key over the
whole log; this operator maintains the same state INCREMENTALLY: a
file-source readStream tails the log directory, and each micro-batch
merges into a materialized state snapshot (union + latest-seq-wins
dedup + atomic directory swap -- the streaming generalization of the
reference's sequential load_file replay, p3/server/my_storage.cc:573-702).

With a checkpoint directory, a re-run only processes NEW log files: the
cost of catching up is proportional to the delta, not the log -- the
property that makes the design hold when the log is 100 TB and a batch
re-replay would be a full-table job.  Tombstones stay in the state
snapshot (so late-arriving lower-seq records can never resurrect a
deleted key) and are filtered only in the returned view.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from operating_system_map_reduce_spark.sources.changelog import ChangeLog, fsync_dir


class ChangelogCDC:
    def __init__(self, log: ChangeLog):
        self.log = log
        self.state_dir = os.path.join(log.root, "state")
        self.checkpoint_dir = os.path.join(log.root, "checkpoint")

    def _state(self) -> DataFrame | None:
        d = self.state_dir
        if not os.path.isdir(d):
            return None
        files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
        if not files:
            return None
        return self.log.spark.read.schema(self.log.schema).parquet(*files)

    def _apply_batch(self, batch: DataFrame, _batch_id: int) -> None:
        from pyspark.sql.window import Window

        merged = batch
        cur = self._state()
        if cur is not None:
            merged = cur.unionByName(batch)
        w = Window.partitionBy(self.log.key_col).orderBy(F.desc(self.log.seq_col))
        latest = (merged.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))
        # distributed write to a tmp dir, then atomic swap: the state
        # rewrite is a Spark job (one shuffle on key), never a driver
        # collect -- state can be as large as the live table.
        tmp = os.path.join(self.log.root, f"state.tmp-{uuid.uuid4().hex[:8]}")
        latest.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(self.state_dir):
            old = self.state_dir + ".old-" + uuid.uuid4().hex[:8]
            os.rename(self.state_dir, old)
            os.rename(tmp, self.state_dir)
            shutil.rmtree(old)
        else:
            os.rename(tmp, self.state_dir)

    def catch_up(self) -> DataFrame:
        """Process all unseen log files, then return the live-state view
        (tombstones filtered)."""
        stream = (self.log.spark.readStream.schema(self.log.schema)
                  .parquet(self.log.log_dir))
        q = (stream.writeStream.foreachBatch(self._apply_batch)
             .option("checkpointLocation", self.checkpoint_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return self.state()

    def state(self) -> DataFrame:
        cur = self._state()
        if cur is None:
            return self.log.spark.createDataFrame([], self.log.schema)
        return cur.filter(F.col(self.log.op_col) != "delete")


class ChangelogStreamSink:
    """Structured Streaming WRITE path into the ChangeLog layout -- the
    100 TB ingestion shape the batch ``ChangeLog.append`` (driver-side
    pyarrow, a per-request ~ms action) deliberately is not.

    A mutation stream (any readStream source carrying the log schema:
    seq, op, key, payload columns) lands in ``<root>/log/`` as the same
    one-parquet-file-per-batch layout the driver writes, so every
    existing reader -- ``replay()``, ``replay_cached()``, compaction,
    the ``ChangelogCDC`` tailer -- works unchanged on streamed appends,
    and the two write paths can interleave in one log.

    Mechanics: ``foreachBatch`` writes each micro-batch DISTRIBUTED to a
    tmp dir (executors stream part-files; the driver never materializes
    the batch), fsyncs, then renames the completed part-files into the
    log dir -- readers can never observe a half-written file.  The
    rename loop is driver-side metadata-only (O(files), not O(bytes)).
    Checkpointed: a restart re-processes only unread source batches.
    Exactly-once is not required: replay's latest-seq-per-key dedup
    makes a replayed duplicate record a no-op, the same idempotence the
    reference gets from replaying a record already in the map
    (p3/server/my_storage.cc:573-702 upserts on AUTHDIFF/KVUPDATE)."""

    def __init__(self, log: ChangeLog):
        self.log = log
        self.checkpoint_dir = os.path.join(log.root, "ingest-checkpoint")

    def _sink_batch(self, batch: DataFrame, batch_id: int) -> None:
        cols = [f.name for f in self.log.schema.fields]
        tmp = os.path.join(self.log.root, f"ingest.tmp-{uuid.uuid4().hex[:8]}")
        batch.select(*cols).write.mode("overwrite").parquet(tmp)
        renamed = False
        for i, name in enumerate(sorted(os.listdir(tmp))):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(tmp, name)
            # Spark's parquet writer does NOT fsync data files, so the
            # sink fsyncs each completed part file itself (a read-only
            # fd flushes that file's dirty pages on Linux) BEFORE the
            # rename publishes it -- the same contents-then-metadata
            # ordering ChangeLog.append uses.
            with open(src, "rb") as f:
                os.fsync(f.fileno())
            dst = os.path.join(
                self.log.log_dir,
                f"batch-stream-{batch_id:012d}-{i:04d}-{uuid.uuid4().hex[:8]}.parquet")
            os.rename(src, dst)
            renamed = True
        if renamed:
            # make the renames themselves durable: without a directory
            # fsync a crash here can lose the new directory entries even
            # though the part-file bytes were fsync'd above.
            fsync_dir(self.log.log_dir)
        shutil.rmtree(tmp)

    def ingest_available(self, stream: DataFrame) -> None:
        """Drain everything currently available from the mutation stream
        into the log (Trigger.AvailableNow), blocking until done."""
        q = (stream.writeStream.foreachBatch(self._sink_batch)
             .option("checkpointLocation", self.checkpoint_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    def start(self, stream: DataFrame):
        """Continuous ingestion; returns the StreamingQuery handle."""
        return (stream.writeStream.foreachBatch(self._sink_batch)
                .option("checkpointLocation", self.checkpoint_dir)
                .start())
