"""Subprocess runner for the streaming chaos tests (VERDICT r5 item 8).

Runs a file-source streaming query (maxFilesPerTrigger=1, availableNow)
whose foreachBatch writes each micro-batch idempotently to
``out/batch=<epoch_id>`` (overwrite-by-epoch — the documented foreachBatch
exactly-once recipe). In ``kill`` mode the runner SIGKILLs its WHOLE
process group (python driver + JVM) right after batch 1's data lands and
BEFORE the micro-batch commit is written — the sharpest failure a real
ingest fears: side effect durable, offset commit lost. In ``resume``
mode it restarts from the same checkpoint and must re-run exactly the
uncommitted batch (same epoch id, same data) and then finish.

Two drills share this ONE crash-injection protocol (so the kill
condition can never silently diverge between them):

- ``stateless``: append the raw rows — exactly-once at the sink.
- ``stateful``: complete-mode groupBy count — the restart must REWIND
  the state store to batch 0's committed version and re-apply batch 1
  exactly once (double-applied state inflates the final counts, lost
  state deflates them).

Invoked by tests/test_streaming.py as:
    python chaos_stream_runner.py <stateless|stateful> <kill|resume>
        <src> <ckpt> <out> <attempt>
"""

from __future__ import annotations

import os
import signal
import sys


def main() -> None:
    flavor, mode, src, ckpt, out, attempt = sys.argv[1:7]
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
    if flavor == "stateful":
        df = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        output_mode = "complete"
    else:
        df = stream
        output_mode = "append"

    def write_batch(batch_df, epoch_id: int) -> None:
        (
            batch_df.withColumn("attempt", F.lit(int(attempt)))
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"batch={epoch_id}"))
        )
        if mode == "kill" and epoch_id == 1:
            # data for batch 1 is durable; the commit log entry is NOT.
            with open(os.path.join(out, "_KILLED_MIDBATCH"), "w") as fh:
                fh.write(str(epoch_id))
            os.killpg(os.getpgid(0), signal.SIGKILL)  # driver + JVM, now

    q = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
