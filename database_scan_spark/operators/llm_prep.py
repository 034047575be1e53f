"""LLM training-data preparation operators beyond the dedup/quality
surface: overlapping token-window chunking, per-source mixture
sampling, corpus n-gram vocabulary, and forward-fill imputation.

All pure JVM expressions (split/slice/sequence/window) — whole-stage
codegen end to end, each with a DuckDB oracle twin. These are the
"shape text into training sequences" counterparts to the reference's
scan→filter→dedup dataflow (candidate_drugs.py:84-158): narrow
per-row maps plus one hash aggregation, so the plans scale linearly
with corpus size and shuffle only where an aggregation demands it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..spec import QuerySpec
from ._helpers import h32, spread

# Chunking geometry: windows of CHUNK whitespace tokens starting every
# STRIDE tokens (CHUNK-STRIDE token overlap), runt tail chunks dropped
# unless they are the document's only chunk.
CHUNK = 32
STRIDE = 24
MIN_TAIL = 8


def wf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking of documents into training
    sequences. Narrow op: split → sequence of starts → posexplode →
    slice; no shuffle at any scale (chunk rows stay co-located with
    their source document partition)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split("text", " ")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(STRIDE))
        ).alias("chunk_id", "chunk_start"),
        F.slice(toks, F.col("chunk_start") + 1, CHUNK).alias("chunk_toks"),
    )
    return (
        chunks.withColumn("n_chunk_tokens", F.size("chunk_toks").cast("int"))
        .filter((F.col("n_chunk_tokens") >= MIN_TAIL) | (F.col("chunk_start") == 0))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            "n_chunk_tokens",
            F.array_join("chunk_toks", " ").alias("chunk_text"),
        )
    )


WF_CHUNK_DOCUMENTS_ORACLE = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
    SELECT doc_id, toks,
           unnest(generate_series(0, GREATEST(len(toks) - 1, 0), {STRIDE})) AS chunk_start
    FROM t
), c AS (
    SELECT doc_id, chunk_start,
           toks[chunk_start + 1 : chunk_start + {CHUNK}] AS chunk_toks
    FROM s
)
SELECT doc_id,
       CAST(chunk_start // {STRIDE} AS INTEGER) AS chunk_id,
       CAST(chunk_start AS INTEGER) AS chunk_start,
       CAST(len(chunk_toks) AS INTEGER) AS n_chunk_tokens,
       array_to_string(chunk_toks, ' ') AS chunk_text
FROM c
WHERE len(chunk_toks) >= {MIN_TAIL} OR chunk_start = 0
"""


def wf_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture sampling for training-set composition:
    each source gets a deterministic keep-rate (basis points derived
    from its numeric suffix), membership decided by the shared
    cross-engine hash — the distributed analog of weighted dataset
    mixing. Returns the per-source audit (in/kept/token budget).
    One hash aggregation; the sample predicate itself is narrow and
    would push straight onto a 100 TB scan."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rate_bp = F.lit(10000) - F.lit(450) * F.regexp_extract("source", "(\\d+)", 1).cast(
        "int"
    )
    kept = (h32(F.concat_ws(":", F.col("doc_id"), F.lit("mix"))) % 10000) < rate_bp
    n_tok = F.size(F.split("text", " "))
    return (
        docs.select(
            "source",
            rate_bp.alias("rate_bp"),
            kept.cast("int").alias("k"),
            n_tok.alias("n_tok"),
        )
        .groupBy("source", "rate_bp")
        .agg(
            F.count(F.lit(1)).alias("n_in"),
            F.sum("k").alias("n_kept"),
            F.sum(F.col("k") * F.col("n_tok")).alias("tokens_kept"),
        )
        .select(
            "source",
            F.col("rate_bp").cast("int").alias("rate_bp"),
            F.col("n_in").cast("long").alias("n_in"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.col("tokens_kept").cast("long").alias("tokens_kept"),
        )
    )


WF_DATA_MIXTURE_ORACLE = """
WITH d AS (
    SELECT source,
           10000 - 450 * CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) AS rate_bp,
           CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || 'mix'), 1, 8))::BIGINT % 10000
                     < 10000 - 450 * CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER)
                THEN 1 ELSE 0 END AS k,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
)
SELECT source,
       CAST(rate_bp AS INTEGER) AS rate_bp,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(k) AS BIGINT) AS n_kept,
       CAST(SUM(k * n_tok) AS BIGINT) AS tokens_kept
FROM d
GROUP BY source, rate_bp
"""


def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-5 bigrams per language by frequency
    (count desc, bigram asc — explicit total order per SURVEY §1.4).
    explode → hash-agg → per-group top-k window; the single shuffle
    is the bigram count, map-side combined."""
    docs = (
        spread(load(spark, sf_dir, "documents").select("lang", "text"))
        .withColumn("toks", F.split("text", " "))
        # guard BEFORE sequence(): Spark's sequence(1, 0) counts DOWN
        # ([1, 0]) instead of returning empty, and element_at(toks, 0)
        # would then throw.
        .filter(F.size("toks") >= 2)
    )
    grams = docs.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("bigram"),
    )
    counts = grams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("bigram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "bigram", F.col("cnt").cast("long").alias("cnt"), F.col("rank").cast("int").alias("rank"))
    )


TEXT_NGRAM_TOPK_ORACLE = """
WITH t AS (
    SELECT lang, string_split(text, ' ') AS toks FROM documents
), g AS (
    SELECT lang,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM t
    WHERE len(toks) >= 2
), c AS (
    SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY lang, bigram
)
SELECT lang, bigram, cnt, CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rn FROM c)
WHERE rn <= 5
"""


def win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation: treat `value` as observed only on
    purchase/view events and carry the last observation forward per
    user (ts, event_id total order). One shuffle on user_id; the
    running `last(ignorenulls)` is a streaming frame — no buffering
    of the partition."""
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    observed = F.when(F.col("event_type").isin("purchase", "view"), F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        observed.alias("observed"),
        F.last(observed, ignorenulls=True).over(w).alias("filled"),
    )


WIN_FORWARD_FILL_ORACLE = """
SELECT user_id, event_id, ts,
       CASE WHEN event_type IN ('purchase', 'view') THEN value END AS observed,
       last_value(CASE WHEN event_type IN ('purchase', 'view') THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM events
"""


SPECS = [
    QuerySpec(
        name="wf_chunk_documents",
        fn=wf_chunk_documents,
        oracle=WF_CHUNK_DOCUMENTS_ORACLE,
        doc="overlapping token-window chunking into training sequences (narrow, shuffle-free)",
        tags=("llm", "workflow"),
    ),
    QuerySpec(
        name="wf_data_mixture",
        fn=wf_data_mixture,
        oracle=WF_DATA_MIXTURE_ORACLE,
        doc="deterministic per-source mixture sampling audit (hash-threshold membership)",
        tags=("llm", "workflow"),
    ),
    QuerySpec(
        name="text_ngram_topk",
        fn=text_ngram_topk,
        oracle=TEXT_NGRAM_TOPK_ORACLE,
        doc="corpus bigram vocabulary: top-5 per language, explicit total order",
        tags=("llm", "text"),
    ),
    QuerySpec(
        name="win_forward_fill",
        fn=win_forward_fill,
        oracle=WIN_FORWARD_FILL_ORACLE,
        doc="last-observation-carried-forward imputation per user (streaming window frame)",
        tags=("window",),
    ),
]
