"""documents → training-batch manifest: the "make batches" half of
the pretraining data path (the upstream "clean the corpus" half is
``plans/corpus_prep.py``). One declarative plan composes:

1. quality gate      — row-local predicates, fused into the scan
2. exact dedup       — canonical-text hash groupBy (one shuffle)
3. tokenize          — BPE-chunk proxy count (`text_tokens` leg)
4. sequence packing  — per-SOURCE longest-first next-fit bins
                       (`wf_pack_sequences` geometry: no global sort)
5. shard assignment  — deterministic content hash of (source, bin)
                       (`wf_shuffle_shard` rule)

and emits the per-shard manifest a training job consumes: bin/doc/
token counts plus an order-free doc-id checksum so two independent
runs (or two engines) can prove they built the SAME batches. The
whole dataflow is SQL-expressible, so the DuckDB oracle checks the
PIPELINE end to end, not just its legs.

Scale posture: stages 1-3 are narrow maps fused into the scan; the
only shuffles are the dedup hash agg, the per-source packing window
(source-partitioned — never a single reducer), and the final
shard-sized manifest agg. Every hash is the shared cross-engine h32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators._helpers import h32
from ..spec import QuerySpec

PB_MIN_TOKENS = 20      # quality floor: whitespace tokens
PB_MAX_WORD_LEN = 12    # quality ceiling: mean word length (chars)
PB_BUDGET = 256         # BPE-chunk tokens per packed sequence bin
PB_SHARDS = 8           # training shards


def pipeline_pretrain_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality gate → exact dedup → tokenize → pack →
    shard → per-shard manifest (see module docstring)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    # 1. quality gate: row-local, fused into the scan
    n_ws = F.size(F.split("text", " "))
    mean_word = (F.length("text") - n_ws + 1) / n_ws  # chars per token
    gated = docs.filter((n_ws >= PB_MIN_TOKENS) & (mean_word <= PB_MAX_WORD_LEN))

    # 2. exact dedup on canonical text (keep min doc_id per content)
    canon = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    w_dup = Window.partitionBy(h32(canon)).orderBy("doc_id")
    deduped = (
        gated.withColumn("rk", F.row_number().over(w_dup))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )

    # 3. tokenize: BPE-chunk proxy (the `text_tokens` counting leg)
    toks = deduped.select(
        "doc_id",
        "source",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0))
        .cast("bigint")
        .alias("n_tok"),
    )

    # 4. per-source longest-first next-fit packing (no global sort)
    w_pack = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tok"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("n_tok").over(w_pack)).withColumn(
        "bin_id", F.expr(f"(cum - n_tok) div {PB_BUDGET}")
    )

    # 5. deterministic shard of each (source, bin) + manifest
    shard = (h32(F.concat_ws(":", F.col("source"), F.col("bin_id"))) % PB_SHARDS).cast(
        "int"
    )
    return (
        packed.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.countDistinct("source", "bin_id").cast("bigint").alias("n_bins"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(h32(F.col("doc_id").cast("string"))).cast("bigint").alias("docs_checksum"),
        )
        .orderBy("shard_id")
    )


PIPELINE_PRETRAIN_BATCHES_ORACLE = f"""
WITH gated AS (
    SELECT doc_id, source, text,
           len(string_split(text, ' ')) AS n_ws
    FROM documents
    WHERE len(string_split(text, ' ')) >= {PB_MIN_TOKENS}
      AND (length(text) - len(string_split(text, ' ')) + 1)
          / len(string_split(text, ' ')) <= {PB_MAX_WORD_LEN}
),
deduped AS (
    SELECT doc_id, source, text
    FROM (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (
                   PARTITION BY ('0x' || substring(md5(
                       lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                   ), 1, 8))::BIGINT
                   ORDER BY doc_id) AS rk
        FROM gated
    ) WHERE rk = 1
),
toks AS (
    SELECT doc_id, source,
           CAST(len(regexp_extract_all(text, '[a-z]{{1,4}}')) AS BIGINT) AS n_tok
    FROM deduped
),
packed AS (
    SELECT doc_id, source, n_tok,
           CAST((SUM(n_tok) OVER (PARTITION BY source
                                  ORDER BY n_tok DESC, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tok) // {PB_BUDGET} AS BIGINT) AS bin_id
    FROM toks
),
sharded AS (
    SELECT *,
           CAST(('0x' || substring(md5(source || ':' || CAST(bin_id AS VARCHAR)),
                                   1, 8))::BIGINT % {PB_SHARDS} AS INTEGER) AS shard_id
    FROM packed
)
SELECT shard_id,
       CAST(COUNT(DISTINCT (source, bin_id)) AS BIGINT) AS n_bins,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
            AS BIGINT) AS docs_checksum
FROM sharded
GROUP BY shard_id
ORDER BY shard_id
"""

SPECS = [
    QuerySpec(
        "pipeline_pretrain_batches",
        pipeline_pretrain_batches,
        PIPELINE_PRETRAIN_BATCHES_ORACLE,
        doc="documents→batches flagship: gate→dedup→tokenize→pack→shard, checksummed manifest",
        tags=("llm", "pipeline", "flagship"),
    )
]
