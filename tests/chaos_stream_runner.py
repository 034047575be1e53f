"""Subprocess runner for the streaming chaos test (VERDICT r5 item 8).

Runs a file-source streaming query (maxFilesPerTrigger=1, availableNow)
whose foreachBatch writes each micro-batch idempotently to
``out/batch=<epoch_id>`` (overwrite-by-epoch — the documented foreachBatch
exactly-once recipe). In ``kill`` mode the runner SIGKILLs its WHOLE
process group (python driver + JVM) right after batch 1's data lands and
BEFORE the micro-batch commit is written — the sharpest failure a real
ingest fears: side effect durable, offset commit lost. In ``resume``
mode it restarts from the same checkpoint and must re-run exactly the
uncommitted batch (same epoch id, same data) and then finish.

Invoked by tests/test_streaming.py::test_stream_chaos_kill_midbatch_exactly_once
as: python chaos_stream_runner.py <kill|resume> <src> <ckpt> <out> <attempt>
"""

from __future__ import annotations

import os
import signal
import sys


def main() -> None:
    mode, src, ckpt, out, attempt = sys.argv[1:6]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # static read of one staged file gives the stream its schema
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )

    def write_batch(df, epoch_id: int) -> None:
        (
            df.withColumn("attempt", F.lit(int(attempt)))
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"batch={epoch_id}"))
        )
        if mode == "kill" and epoch_id == 1:
            # data for batch 1 is durable; the commit log entry is NOT.
            with open(os.path.join(out, "_KILLED_MIDBATCH"), "w") as fh:
                fh.write(str(epoch_id))
            os.killpg(os.getpgid(0), signal.SIGKILL)  # driver + JVM, now

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.stop()




def main_stateful() -> None:
    """Stateful twin: a complete-mode groupBy count over the same
    paged file source. The kill lands after batch 1's sink write but
    before its commit, so the restart must REWIND the state store to
    batch 0's version and re-apply batch 1 exactly once — if state
    were double-applied, the final counts would be inflated."""
    mode, src, ckpt, out, attempt = sys.argv[2:7]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def write_batch(df, epoch_id: int) -> None:
        (
            df.withColumn("attempt", F.lit(int(attempt)))
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"batch={epoch_id}"))
        )
        if mode == "kill" and epoch_id == 1:
            with open(os.path.join(out, "_KILLED_MIDBATCH"), "w") as fh:
                fh.write(str(epoch_id))
            os.killpg(os.getpgid(0), signal.SIGKILL)

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "stateful":
        main_stateful()
    else:
        main()
