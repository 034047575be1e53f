"""Property-based tests (hypothesis) for the cross-engine kernels.

The whole correctness model rests on a few Spark expressions being
bit-identical to their DuckDB twins (README 'determinism
disciplines'). The parity suite checks them on fixture data; these
properties check them on ADVERSARIAL generated data — unicode,
empty strings, extreme floats — where silent divergence would
otherwise hide until a fixture happens to hit it.

Each hypothesis example ships a whole BATCH of generated values
through one Spark job + one DuckDB query (per-value jobs would be
100x slower), so max_examples stays low without losing case count.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# no NUL (parquet/arrow strings are NUL-hostile in some paths) and no
# surrogates (not encodable to utf-8)
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=40,
    ),
    min_size=1,
    max_size=50,
)

FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
VEC_PAIRS = st.lists(
    st.tuples(
        st.lists(FLOATS, min_size=4, max_size=4),
        st.lists(FLOATS, min_size=4, max_size=4),
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=TEXTS)
@settings(**_SETTINGS)
def test_h32_matches_duckdb_on_arbitrary_text(spark, texts):
    """h32 (the shared 32-bit hash) must equal its DuckDB twin for any
    unicode input — every dedup/fingerprint oracle depends on it."""
    from database_scan_spark.operators._helpers import h32

    sdf = spark.createDataFrame([(t,) for t in texts], "x string")
    got = [r.h for r in sdf.select(h32(F.col("x")).alias("h")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": texts}))
    want = [
        r[0]
        for r in con.sql(
            "SELECT ('0x' || substring(md5(x), 1, 8))::BIGINT FROM t"
        ).fetchall()
    ]
    assert got == want


@given(pairs=VEC_PAIRS)
@settings(**_SETTINGS)
def test_dot_matches_duckdb_on_arbitrary_vectors(spark, pairs):
    """The zip_with+aggregate dot product must be bit-identical to
    DuckDB's list_dot_product (same left-to-right fold) for arbitrary
    finite doubles — similarity/ANN oracles depend on it."""
    from database_scan_spark.operators._helpers import dot

    sdf = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a array<double>, b array<double>"
    )
    got = [r.d for r in sdf.select(dot(F.col("a"), F.col("b")).alias("d")).collect()]
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})
    )
    want = [r[0] for r in con.sql("SELECT list_dot_product(a, b) FROM t").fetchall()]
    assert got == want  # exact equality, not approx — the fold must match


@given(texts=TEXTS)
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, texts):
    """_shingles must produce exactly the distinct 3-gram token
    shingles (space-split, order of first occurrence irrelevant) for
    any text, including <3-token edge cases."""
    from database_scan_spark.operators.dedup import _shingles

    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        set(r.s) for r in sdf.select(_shingles(F.split("text", " ")).alias("s")).collect()
    ]
    for t, g in zip(texts, got):
        toks = t.split(" ")
        want = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        assert g == want, (t, g, want)


@given(
    doc_id=st.integers(min_value=0, max_value=1 << 40),
    payload=st.binary(min_size=0, max_size=5000),
)
@settings(**_SETTINGS)
def test_media_codec_roundtrip(doc_id, payload):
    """The vendored BMP/WAV codec must parse back exactly the
    metadata it encoded, for ANY payload bytes — header integrity is
    what mm_decode_real's oracle hash depends on."""
    from database_scan_spark.operators.multimodal import (
        decode_media,
        encode_media,
    )

    blob = encode_media(doc_id, payload)
    meta = decode_media(blob)
    n = len(payload)
    assert meta["n_bytes"] == len(blob)
    if doc_id % 2 == 0:
        assert meta["modality"] == "image"
        assert meta["width"] == n % 64 + 1
        assert meta["height"] == n % 48 + 1
        stride = ((meta["width"] * 3 + 3) // 4) * 4
        assert len(blob) == 54 + stride * meta["height"]
    else:
        assert meta["modality"] == "audio"
        assert meta["channels"] == n % 2 + 1
        assert meta["sample_rate"] == (8000, 16000, 44100)[n % 3]
        assert meta["n_samples"] == n % 1000 + 1
        assert len(blob) == 44 + meta["n_samples"] * meta["channels"] * 2


def test_media_codec_opaque_fallback():
    """Unknown container formats must degrade to opaque byte
    metadata, never raise."""
    from database_scan_spark.operators.multimodal import decode_media

    for blob in (b"", b"\x89PNG\r\n\x1a\n", b"JFIF" * 40, b"RIFF1234AVI "):
        meta = decode_media(blob)
        assert meta["modality"] == "opaque"
        assert meta["n_bytes"] == len(blob)


@given(texts=TEXTS, ks=st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_variant_extraction_matches_duckdb_json(spark, texts, ks):
    """fn_variant_json's contract on adversarial input: for every
    string — valid {"k": int} objects AND arbitrary junk —
    try_parse_json + try_variant_get must agree with DuckDB's
    json_valid-guarded json_extract_string on the extracted value."""
    import json

    rows = [json.dumps({"k": k}) for k in ks] + list(texts)
    sdf = spark.createDataFrame([(r,) for r in rows], "x string")
    got = (
        sdf.select(
            F.try_variant_get(F.try_parse_json("x"), "$.k", "bigint").alias("k")
        )
        .toPandas()["k"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": rows}))
    want = [
        r[0]
        for r in con.sql(
            "SELECT CASE WHEN json_valid(x) THEN "
            "TRY_CAST(json_extract_string(x, '$.k') AS BIGINT) END FROM t"
        ).fetchall()
    ]
    assert [None if pd.isna(v) else int(v) for v in got] == [
        None if v is None else int(v) for v in want
    ]


@given(vals=st.lists(st.integers(-2**31, 2**31), min_size=1, max_size=200))
@settings(**_SETTINGS)
def test_theta_sketch_exact_below_nominal(spark, vals):
    """agg_theta_distinct_union's oracle regime: a theta sketch with
    lgK=20 must report the EXACT distinct count for any input whose
    cardinality is below the nominal 2^20 — the property that makes a
    full value oracle legitimate at fixture scale."""
    sdf = spark.createDataFrame([(v,) for v in vals], "x long")
    est = sdf.agg(
        F.theta_sketch_estimate(F.theta_sketch_agg(F.col("x"), F.lit(20))).alias("d")
    ).collect()[0]["d"]
    assert est == len(set(vals))


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=12), min_size=1, max_size=30
    ),
    pair=st.tuples(st.sampled_from("ab_"), st.sampled_from("ab_")),
)
@settings(**_SETTINGS)
def test_bpe_merge_replace_matches_reference(spark, words, pair):
    """The delimiter-wrapped replace() used by text_bpe_train must
    implement GREEDY LEFT-TO-RIGHT NON-OVERLAPPING pair merging — the
    BPE rule — for arbitrary symbol sequences, including the
    adversarial overlap cases ('aaaa' merging (a,a) -> [aa, aa], not
    [aa, a, a] or [a, aa, a]). Alphabet {a,b,_} with the end-of-word
    marker provokes maximal overlap."""
    import re as _re

    lhs, rhs = pair

    def reference_merge(seq, a, b):
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        return out

    pdf = pd.DataFrame({"word": words})
    sdf = spark.createDataFrame(pdf)
    arr = F.concat(F.split("word", ""), F.array(F.lit("_")))
    wrapped = F.concat_ws(
        "", F.transform(arr, lambda s: F.concat(F.lit("<"), s, F.lit(">")))
    )
    merged = F.regexp_extract_all(
        F.replace(
            wrapped,
            F.lit(f"<{lhs}><{rhs}>"),
            F.lit(f"<{lhs}{rhs}>"),
        ),
        F.lit("<([^>]*)>"),
        1,
    )
    got = [r[0] for r in sdf.select(merged).collect()]
    want = [reference_merge(list(w) + ["_"], lhs, rhs) for w in words]
    assert got == want, (pair, words, got, want)


# ---------------------------------------------------------------------------
# Pure-algebra identities behind the sixth-session statistics (no
# Spark needed: these validate the formulas the operators encode,
# against brute-force reference implementations).
# ---------------------------------------------------------------------------

PAIRS = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=2, max_size=60
)


@given(PAIRS)
@settings(max_examples=200, deadline=None)
def test_kendall_histogram_pair_identity(xy):
    """The histogram CELL-pair concordance count used by
    analytic_kendall_tau equals the brute-force row-pair count."""
    from collections import Counter

    nc = nd = 0
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            s = (xy[i][0] - xy[j][0]) * (xy[i][1] - xy[j][1])
            nc += s > 0
            nd += s < 0
    hist = Counter(xy)
    cells = list(hist.items())
    nc2 = nd2 = 0
    for (qa, da), ca in cells:
        for (qb, db), cb in cells:
            s = (qa - qb) * (da - db)
            if s > 0:
                nc2 += ca * cb
            elif s < 0:
                nd2 += ca * cb
    assert nc2 % 2 == 0 and nd2 % 2 == 0
    assert (nc, nd) == (nc2 // 2, nd2 // 2)


@given(st.lists(st.floats(0, 5, allow_nan=False), min_size=1, max_size=10))
@settings(max_examples=200, deadline=None)
def test_bh_stepup_equals_naive(absz):
    """The single-cutoff BH implementation (reject rank <= last
    qualifying index) equals the textbook step-up procedure."""
    thr = [2.807034, 2.575829, 2.432379, 2.326348, 2.241403,
           2.170090, 2.108358, 2.053749, 2.004654, 1.959964]
    zs = sorted(absz, reverse=True)
    m = len(zs)
    # textbook: find the LARGEST i with z_(i) >= thr_i; reject 1..i
    k = 0
    for i in range(m):
        if zs[i] >= thr[i]:
            k = i + 1
    naive = [i < k for i in range(m)]
    # operator form: cut = max(rank where z >= thr), reject rank <= cut
    cut = max((i + 1 for i in range(m) if zs[i] >= thr[i]), default=0)
    ours = [(i + 1) <= cut for i in range(m)]
    assert ours == naive


@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=30),
    st.integers(0, 100),
)
@settings(max_examples=200, deadline=None)
def test_waterfill_closed_form_equals_progressive(demands, pct):
    """The closed-form water level of wf_fair_share_budget equals
    iterative progressive filling, and grants always sum to the
    budget."""
    budget = sum(demands) * pct // 100
    # progressive filling (reference): raise the level until spent
    remaining = budget
    alloc = [0] * len(demands)
    active = [i for i in range(len(demands)) if demands[i] > 0]
    while remaining > 0 and active:
        share = remaining // len(active)
        if share == 0:
            # hand out the last units deterministically (by demand
            # order then index, mirroring the operator's k-order)
            order = sorted(active, key=lambda i: (demands[i], i))
            for i in order[:remaining]:
                alloc[i] += 1
            remaining = 0
            break
        progressed = False
        for i in list(active):
            take = min(share, demands[i] - alloc[i])
            alloc[i] += take
            remaining -= take
            if alloc[i] == demands[i]:
                active.remove(i)
                progressed = True
        if not progressed and all(
            alloc[i] == demands[i] for i in range(len(demands))
        ):
            break
        if not active:
            break
    # closed form (operator's math)
    order = sorted(range(len(demands)), key=lambda i: (demands[i], i))
    n = len(demands)
    cum = 0
    k_sat, cum_sat = 0, 0
    for rank, i in enumerate(order, start=1):
        cum += demands[i]
        if cum + demands[i] * (n - rank) <= budget:
            k_sat, cum_sat = rank, cum
    closed = [0] * n
    n_uncapped = n - k_sat
    level = (budget - cum_sat) // n_uncapped if n_uncapped else 0
    rem = (budget - cum_sat) % n_uncapped if n_uncapped else 0
    for rank, i in enumerate(order, start=1):
        if rank <= k_sat:
            closed[i] = demands[i]
        else:
            closed[i] = min(
                demands[i], level + (1 if rank - k_sat <= rem else 0)
            )
    assert sum(closed) == budget
    assert all(c <= d for c, d in zip(closed, demands))
    assert sum(alloc) == budget


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24),
    b=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24),
)
def test_jaro_winkler_matches_duckdb_on_arbitrary_strings(a, b):
    """The vendored Python Jaro-Winkler must agree with DuckDB's
    independent C++ implementation on ARBITRARY printable strings —
    the fuzz extension of dedup_jaro_winkler's 224-pair oracle
    (match-window edges, empty strings, transposition counting,
    boost-threshold boundary)."""
    from database_scan_spark.operators.dedup import _jw_scalar

    jw = _jw_scalar()
    con = duckdb.connect()
    expected = con.execute(
        "SELECT round(jaro_winkler_similarity(?, ?), 6)", [a, b]
    ).fetchone()[0]
    assert round(jw(a, b), 6) == expected, (a, b)


INTS_POS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),   # count numerator
        st.integers(min_value=1, max_value=10**12),  # total denominator
    ),
    min_size=1,
    max_size=50,
)


@given(pairs=INTS_POS)
@settings(**_SETTINGS)
def test_micronat_log_quantization_matches_duckdb(spark, pairs):
    """The DSIR/CCNet determinism story rests on round(ln(x)*1e6, 0)
    agreeing between Java's Math.log and DuckDB's libm ln for
    Laplace-smoothed count ratios. Property-check it on adversarial
    integer ratios (the only shape the engine ever feeds it)."""
    pdf = pd.DataFrame(pairs, columns=["c", "n"])
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            F.round(F.log((F.col("c") + 1) / (F.col("n") + 256)) * 1e6, 0)
            .cast("long")
            .alias("w")
        )
        .toPandas()["w"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            "SELECT CAST(round(ln((c + 1) * 1.0 / (n + 256)) * 1e6, 0) AS BIGINT) FROM t"
        ).fetchall()
    ]
    con.close()
    assert got == want


HASHES_32 = st.lists(
    st.integers(min_value=0, max_value=(1 << 32) - 1), min_size=1, max_size=60
)


@given(hs=HASHES_32)
@settings(**_SETTINGS)
def test_hll_bucket_rank_kernel_matches_reference(spark, hs):
    """agg_hll_portable's register kernel — top-8-bit bucket, 24-bit
    suffix leading-zero rank via bin() length — against a pure-Python
    bit-twiddling reference, on arbitrary 32-bit hash values."""
    W = 24
    pdf = pd.DataFrame({"h": hs})
    sdf = spark.createDataFrame(pdf)
    w = F.col("h") % F.lit(1 << W)
    got = (
        sdf.select(
            (F.col("h") / F.lit(1 << W)).cast("long").alias("b"),
            F.when(w == 0, F.lit(W + 1))
            .otherwise(F.lit(W + 1) - F.length(F.bin(w)))
            .cast("long")
            .alias("r"),
        )
        .toPandas()
    )
    for h, b, r in zip(hs, got["b"], got["r"]):
        assert b == h >> W
        suffix = h & ((1 << W) - 1)
        assert r == (W + 1 if suffix == 0 else W + 1 - suffix.bit_length())


@given(texts=TEXTS)
@settings(**_SETTINGS)
def test_gopher_kernel_matches_python_reference(spark, texts):
    """Gopher rule booleans (integer cross-multiplied thresholds)
    against a direct Python evaluation on arbitrary unicode docs."""
    from database_scan_spark.operators.text_analysis import (
        GOPHER_ALPHA_DEN,
        GOPHER_ALPHA_NUM,
        GOPHER_MAX_MEAN_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP_TYPES,
        GOPHER_MIN_WORDS,
        GOPHER_STOPS,
        text_gopher_rules,
    )
    import database_scan_spark.operators.text_analysis as ta
    import re
    from unittest import mock

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    with mock.patch.object(ta, "load", lambda _s, _d, _t: docs):
        got = {
            r.doc_id: r for r in text_gopher_rules(spark, "ignored").collect()
        }
    for i, text in enumerate(texts):
        toks = text.split(" ")
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_alpha = sum(1 for t in toks if re.search("[a-z]", t))
        n_stop = len({t for t in toks if t in GOPHER_STOPS})
        r = got[i]
        assert r.n_words == n and r.sum_word_len == sum_len
        assert r.n_alpha_words == n_alpha and r.n_stop_types == n_stop
        assert r.rule_word_count == int(GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS)
        assert r.rule_mean_len == int(
            GOPHER_MIN_MEAN_LEN * n <= sum_len <= GOPHER_MAX_MEAN_LEN * n
        )
        assert r.rule_stopwords == int(n_stop >= GOPHER_MIN_STOP_TYPES)
        assert r.rule_alpha_ratio == int(n_alpha * GOPHER_ALPHA_DEN >= n * GOPHER_ALPHA_NUM)


def test_global_order_equals_single_task_window(spark):
    """global_order / ntile_from_rank (the distributed exact-rank path
    behind agg_histogram_equidepth, analytic_rfm, analytic_pareto,
    analytic_gains_table) must be BIT-identical to the single-task
    Window.orderBy formulation on rank, NTILE (incl. heavy ties), and
    DESC DECIMAL cumulative sums — for any bucket count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_scan_spark.catalog import load
    from database_scan_spark.operators._helpers import (
        global_order,
        ntile_from_rank,
    )

    o = load(spark, "/root/testdata/sf0.001", "orders").select(
        "o_totalprice", "o_orderkey"
    )
    for n_buckets in (1, 3, 64):
        got = global_order(
            o, F.col("o_totalprice"), (F.col("o_orderkey"),),
            rank_col="rk", n_buckets=n_buckets,
        ).select("o_orderkey", "rk")
        want = o.select(
            "o_orderkey",
            F.row_number()
            .over(Window.orderBy("o_totalprice", "o_orderkey"))
            .cast("long")
            .alias("rk"),
        )
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    # NTILE with heavy ties (key rounded to thousands) and k not
    # dividing n, vs the engine's own ntile over the same total order
    o2 = o.withColumn("kt", F.round(F.col("o_totalprice") / 1000).cast("long"))
    n = o2.agg(F.count(F.lit(1)).alias("n"))
    got2 = (
        global_order(o2, F.col("kt"), (F.col("o_orderkey"),),
                     rank_col="rk", n_buckets=7)
        .crossJoin(F.broadcast(n))
        .select(
            "o_orderkey",
            ntile_from_rank(F.col("rk"), F.col("n"), 7).alias("b"),
        )
    )
    want2 = o2.select(
        "o_orderkey",
        F.ntile(7).over(Window.orderBy("kt", "o_orderkey")).cast("long").alias("b"),
    )
    assert got2.exceptAll(want2).count() == 0
    assert want2.exceptAll(got2).count() == 0

    # DESC DECIMAL cumulative sum
    pc = o.groupBy((F.col("o_orderkey") % 37).alias("g")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    gotc = global_order(
        pc, -F.col("rev"), (F.col("g"),),
        cum_sums={"cum": F.col("rev")}, n_buckets=5,
    ).select("g", F.col("cum").cast("decimal(30,2)").alias("cum"))
    wantc = pc.select(
        "g",
        F.sum("rev")
        .over(
            Window.orderBy(F.desc("rev"), F.asc("g")).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("decimal(30,2)")
        .alias("cum"),
    )
    assert gotc.exceptAll(wantc).count() == 0
    assert wantc.exceptAll(gotc).count() == 0


# keys with deliberately heavy ties (small domain), negatives, and
# extreme magnitudes — the shapes that break rank/bucket arithmetic
_GO_KEYS = st.lists(
    st.one_of(
        st.integers(min_value=-5, max_value=5),          # heavy ties
        st.integers(min_value=-(2**40), max_value=2**40),
    ),
    min_size=1,
    max_size=60,
)


@given(keys=_GO_KEYS, k=st.integers(min_value=1, max_value=9))
@settings(**_SETTINGS)
def test_global_order_property_random_keys(spark, keys, k):
    """global_order + ntile_from_rank equal the single-task window on
    arbitrary integer keys (heavy ties, negatives, huge magnitudes)
    and arbitrary NTILE k — the adversarial-data companion of the
    fixture-based equivalence test."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from database_scan_spark.operators._helpers import (
        global_order,
        ntile_from_rank,
    )

    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(keys)], "id long, v long"
    )
    n = df.agg(F.count(F.lit(1)).alias("n"))
    got = (
        global_order(df, F.col("v"), (F.col("id"),), rank_col="rk", n_buckets=4)
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "rk",
            ntile_from_rank(F.col("rk"), F.col("n"), k).alias("b"),
        )
    )
    w = Window.orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("rk"),
        F.ntile(k).over(w).cast("long").alias("b"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ntile_from_rank_exhaustive_small_domain(spark):
    """Exhaustive boundary check of the integer NTILE arithmetic: for
    every (n <= 30, k <= 8, rank <= n), ntile_from_rank must equal the
    SQL NTILE definition (first n%k tiles get n/k+1 rows) computed
    independently in Python — 3,720 combinations, one Spark job."""
    from pyspark.sql import functions as F

    from database_scan_spark.operators._helpers import ntile_from_rank

    def expected(n: int, k: int, r: int) -> int:
        q, rem = divmod(n, k)
        big = q + 1
        if r <= big * rem:
            return (r + big - 1) // big if big else 0
        return rem + (r - big * rem + q - 1) // q

    # sanity of the reference itself: tiles are contiguous, start at
    # 1, use min(n, k) tiles, and sizes differ by at most one
    for n in (1, 7, 30):
        for k in (1, 3, 8):
            tiles = [expected(n, k, r) for r in range(1, n + 1)]
            assert tiles == sorted(tiles) and tiles[0] == 1
            assert len(set(tiles)) == min(n, k)
            sizes = [tiles.count(t) for t in sorted(set(tiles))]
            assert max(sizes) - min(sizes) <= 1
            assert sizes == sorted(sizes, reverse=True)

    rows = [
        (n, k, r, expected(n, k, r))
        for n in range(1, 31)
        for k in range(1, 9)
        for r in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "n long, k int, r long, want long")
    # evaluate per-k (ntile_from_rank takes k as a python int)
    for k in range(1, 9):
        sub = df.filter(F.col("k") == k).withColumn(
            "got", ntile_from_rank(F.col("r"), F.col("n"), k)
        )
        n_bad = sub.filter(F.col("got") != F.col("want")).count()
        assert n_bad == 0, f"k={k}: {n_bad} mismatches"


def test_ntile_from_rank_exact_past_2_53(spark):
    """The division inside ntile_from_rank runs in DECIMAL(38,0), so
    it stays exact for rank domains past 2^53 where double division
    rounds (ADVICE r5). Probe tile boundaries at n = 2^60 — each
    boundary rank and its neighbor must land in different tiles."""
    from pyspark.sql import functions as F

    from database_scan_spark.operators._helpers import ntile_from_rank

    def expected(n: int, k: int, r: int) -> int:
        q, rem = divmod(n, k)
        big = q + 1
        if r <= big * rem:
            return (r + big - 1) // big
        return rem + (r - big * rem + q - 1) // max(q, 1)

    n, k = 1 << 60, 10
    q, rem = divmod(n, k)  # rem = 6: first 6 tiles get q+1 rows

    def edge(tile: int) -> int:  # last rank of `tile`
        return tile * (q + 1) if tile <= rem else rem * (q + 1) + (tile - rem) * q

    probes = set()
    for tile in range(1, k):  # every tile boundary ± 1
        probes.update((edge(tile), edge(tile) + 1))
    probes.update((1, n, (1 << 53) + 1, (1 << 53) + 3))
    rows = [(r, n, expected(n, k, r)) for r in sorted(probes)]
    df = spark.createDataFrame(rows, "r long, n long, want long")
    got = df.withColumn("got", ntile_from_rank(F.col("r"), F.col("n"), k))
    assert got.filter(F.col("got") != F.col("want")).count() == 0
    # adjacent boundary probes actually straddle tiles (non-vacuous)
    for tile in range(1, k):
        assert expected(n, k, edge(tile)) == tile
        assert expected(n, k, edge(tile) + 1) == tile + 1


# distinct cents values with per-period counts — gaps, negatives, and
# one-sided periods included (the shapes that break cumsum/gap math)
_WD_TABLES = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # value (cents)
        st.integers(min_value=0, max_value=50),        # period-1 count
        st.integers(min_value=0, max_value=50),        # period-2 count
    ),
    min_size=2,
    max_size=40,
    unique_by=lambda t: t[0],
).filter(lambda rows: sum(r[1] for r in rows) > 0 and sum(r[2] for r in rows) > 0)


@given(rows=_WD_TABLES)
@settings(**_SETTINGS)
def test_wasserstein_global_order_core_property(spark, rows):
    """The r6 dq_drift_wasserstein core — global_order(cum_sums=...) +
    a rank+1 self-join for the value gap, replacing the unpartitioned
    cumsum/lead windows — must compute the exact discrete
    1-Wasserstein mass Σ gap(v)·|cum1(v)·N₂ − cum2(v)·N₁| for ANY
    per-value count table (VERDICT r5 item 3's property test)."""
    from pyspark.sql import functions as F

    from database_scan_spark.operators._helpers import global_order

    per_v = spark.createDataFrame(rows, "v long, c1 long, c2 long")
    ranked = global_order(
        per_v,
        F.col("v"),
        rank_col="_rk",
        cum_sums={"cum1": F.col("c1"), "cum2": F.col("c2")},
        n_buckets=5,
    )
    nxt = ranked.select((F.col("_rk") - 1).alias("_rk"), F.col("v").alias("_vn"))
    got = (
        ranked.join(nxt, "_rk")
        .select(
            (
                (F.col("_vn") - F.col("v")).cast("decimal(38,0)")
                * F.abs(
                    F.col("cum1").cast("decimal(38,0)") * F.lit(sum(r[2] for r in rows))
                    - F.col("cum2").cast("decimal(38,0)") * F.lit(sum(r[1] for r in rows))
                )
            ).alias("t")
        )
        .agg(F.coalesce(F.sum("t"), F.lit(0).cast("decimal(38,0)")).alias("mass"))
        .collect()[0]["mass"]
    )
    # pure-Python reference over the sorted value dictionary
    srt = sorted(rows)
    n1 = sum(r[1] for r in rows)
    n2 = sum(r[2] for r in rows)
    cum1 = cum2 = 0
    want = 0
    for (v, c1, c2), nxt_row in zip(srt, srt[1:]):
        cum1 += c1
        cum2 += c2
        want += (nxt_row[0] - v) * abs(cum1 * n2 - cum2 * n1)
    assert int(got) == want


def test_global_order_rejects_nan_and_accepts_infinity(spark):
    """NaN keys must fail LOUDLY (NaN sorts last in Spark's total
    order but compares false against every percentile boundary — the
    one input where global_order's bucketing and its sort could
    disagree); ±Infinity is orderable and must work, ranked at the
    extremes."""
    import pytest
    from pyspark.sql import functions as F

    from database_scan_spark.operators._helpers import global_order

    inf = float("inf")
    ok = spark.createDataFrame(
        [(i, v) for i, v in enumerate([3.0, -inf, 1.5, inf, -2.0])],
        "id long, k double",
    )
    got = {
        r["id"]: r["rk"]
        for r in global_order(
            ok, F.col("k"), (F.col("id"),), rank_col="rk", n_buckets=3
        ).collect()
    }
    assert got == {1: 1, 4: 2, 2: 3, 0: 4, 3: 5}  # -inf first, +inf last

    bad = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "id long, k double"
    )
    with pytest.raises(Exception, match="non-null and non-NaN"):
        global_order(
            bad, F.col("k"), (F.col("id"),), rank_col="rk", n_buckets=3
        ).collect()


# --- row-granular live cursor: no loss, no dup, no reorder — ever ----------
#
# The r8 cursor change (sources/page_stream.py) holds the offset inside
# a short page and serves only extensions. The arithmetic has edge
# cases (exact-full growth, multi-page growth in one poll, growth while
# idle) that example tests can miss; this property drives ARBITRARY
# grow/poll schedules through the reader with the HTTP transport
# stubbed and asserts the stream-level invariant: the concatenation of
# everything ever served equals a prefix of the store, and a final
# drain serves exactly the remainder.


@settings(max_examples=120, deadline=None)
@given(
    events=st.lists(
        st.one_of(
            st.tuples(st.just("grow"), st.integers(min_value=1, max_value=12)),
            st.tuples(st.just("poll"), st.just(0)),
        ),
        max_size=25,
    ),
    page_size=st.integers(min_value=1, max_value=5),
)
def test_live_cursor_serves_every_row_exactly_once(tmp_path_factory, events, page_size):
    import json as _json
    import urllib.request
    from unittest import mock

    from pyspark.sql.types import LongType, StructField, StructType

    from database_scan_spark.sources.page_stream import make_page_stream_source

    store: list[dict] = []

    class _Resp:
        def __init__(self, body: bytes):
            self._b = body

        def read(self):
            return self._b

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req, timeout=0):
        var = _json.loads(req.data)["variables"]
        i, size = var["index"], var["size"]
        rows = store[i * size : (i + 1) * size]
        return _Resp(_json.dumps({"data": {"rows": rows}}).encode())

    reader = make_page_stream_source()(
        options={
            "mode": "live",
            "endpoint": "http://stubbed.invalid/graphql",
            "spool_dir": str(tmp_path_factory.mktemp("spool")),
            "page_size": str(page_size),
            "rate_per_sec": "1e9",
        }
    ).simpleStreamReader(
        StructType([StructField("entity_id", LongType())])
    )

    served: list[int] = []
    off = reader.initialOffset()
    with mock.patch.object(urllib.request, "urlopen", fake_urlopen):
        for kind, n in events:
            if kind == "grow":
                base = len(store)
                store.extend({"entity_id": base + j} for j in range(n))
            else:
                rows, off = reader.read(off)
                served.extend(r[0] for r in rows)
            # THE invariant: served is always an exact store prefix.
            assert served == list(range(len(served)))
            assert len(served) <= len(store)
        # Final drain: everything in the store must come out, once.
        while True:
            rows, nxt = reader.read(off)
            served.extend(r[0] for r in rows)
            if nxt == off:
                break
            off = nxt
    assert served == list(range(len(store)))
    # Replay of the full committed range reproduces the exact stream.
    if served:
        replay = [
            r[0]
            for r in reader.readBetweenOffsets({"page": 0, "row": 0}, off)
        ]
        assert replay == served
