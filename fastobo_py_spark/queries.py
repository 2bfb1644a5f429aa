r"""Query registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver contract (__spark_entry__.py).

Each Spark query is written with the DataFrame API (the operator under
test); each oracle is the same computation in ANSI SQL for DuckDB over
the same parquet views. Column names and value rounding match exactly —
the driver hashes values after sorting columns by name.

OBO queries run over the deterministic synthetic corpus
(sources/corpus.py); their oracles are VALUES literals derived from the
independent pure-Python oracle (oracle.py) — golden snapshots computed by
a second implementation, not by Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastobo_py_spark.operators import dedup as D
from fastobo_py_spark.operators import similarity as S
from fastobo_py_spark.operators import text as X
from fastobo_py_spark.operators.hints import gated_broadcast
from fastobo_py_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Relational / TPC-H-ish (exercise joins, aggs, windows on the star schema)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with partial aggregation."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)        AS sum_qty,
       round(sum(l_extendedprice), 2)   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4)        AS avg_qty,
       round(avg(l_discount), 4)        AS avg_disc,
       count(*)                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k."""
    cust = load_table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(gated_broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


SQL_TOP_REVENUE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; dims broadcast."""
    region = F.broadcast(load_table(spark, sf, "region"))
    nation = F.broadcast(load_table(spark, sf, "nation"))
    supplier = gated_broadcast(load_table(spark, sf, "supplier"))
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(supplier, (li["l_suppkey"] == supplier["s_suppkey"]) & (customer["c_nationkey"] == supplier["s_nationkey"]))
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q_orders_topk_window(spark: SparkSession, sf: str) -> DataFrame:
    """Window top-k: 3 priciest orders per priority (O17 pattern)."""
    orders = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderpriority", "rank")
    )


SQL_ORDERS_TOPK = """
SELECT o_orderpriority, rank, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""


def q_orders_with_returns(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders having at least one
    returned lineitem, counted per priority (LeftSemi, no row blowup)."""
    orders = load_table(spark, sf, "orders")
    returned = load_table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_ORDERS_WITH_RETURNS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS anti-join — customers with no orders,
    counted per market segment (LeftAnti)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Events: time windowing + sessionization
# ---------------------------------------------------------------------------


def q_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .orderBy("hour", "event_type")
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30 min) — lag + cumulative sum windows."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.when(us - F.lag(us, 1).over(w) > 1800 * 1_000_000, 1).otherwise(0)
    sess = ev.withColumn("new_sess", F.coalesce(gap, F.lit(0))).withColumn(
        "session_ix", F.sum("new_sess").over(w)
    )
    return (
        sess.groupBy("user_id", "session_ix")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
        .orderBy("user_id", "session_ix")
    )


SQL_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         -- DuckDB sum() OVER returns HUGEINT; Spark emits BIGINT — cast so
         -- the driver's value hash agrees (same fix as duration_us below)
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_ix
  FROM flagged
)
SELECT user_id, session_ix, count(*) AS n_events,
       CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
FROM numbered
GROUP BY user_id, session_ix
ORDER BY user_id, session_ix
"""


def q_events_props_json(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction: parse the props JSON column and profile
    the extracted key per event type (get_json_object stays JVM-side)."""
    ev = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_PROPS = """
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k)   AS min_k,
       max(k)   AS max_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Text analysis (documents table)
# ---------------------------------------------------------------------------

_EN = "'the','a','of','and','to','in','is','it','for','on'"
_DE = "'der','die','das','und','ist','nicht','ein','mit'"
_FR = "'le','la','les','et','est','un','une','dans'"
_ES = "'el','la','los','y','es','un','una','que'"


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return X.text_stats(docs).orderBy("doc_id")


SQL_TEXT_STATS = f"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ltoks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars_actual,
       length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
       CAST(floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
             / greatest(length(text), 1) * 1000000) AS BIGINT) AS alpha_ppm,
       CAST(floor((0.4 * least(len(toks) / 64.0, 1.0)
           + 0.3 * least(len(list_filter(ltoks, x -> x IN ({_EN}))) / 4.0, 1.0)
           + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                         / greatest(length(text), 1))) * 1000000) AS BIGINT) AS quality_ppm,
       CASE
         WHEN length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) > length(text) * 0.3 THEN 'zh'
         WHEN greatest(len(list_filter(ltoks, x -> x IN ({_EN}))),
                       len(list_filter(ltoks, x -> x IN ({_DE}))),
                       len(list_filter(ltoks, x -> x IN ({_FR}))),
                       len(list_filter(ltoks, x -> x IN ({_ES})))) = 0 THEN 'und'
         WHEN len(list_filter(ltoks, x -> x IN ({_EN}))) =
              greatest(len(list_filter(ltoks, x -> x IN ({_EN}))), len(list_filter(ltoks, x -> x IN ({_DE}))),
                       len(list_filter(ltoks, x -> x IN ({_FR}))), len(list_filter(ltoks, x -> x IN ({_ES})))) THEN 'en'
         WHEN len(list_filter(ltoks, x -> x IN ({_DE}))) =
              greatest(len(list_filter(ltoks, x -> x IN ({_EN}))), len(list_filter(ltoks, x -> x IN ({_DE}))),
                       len(list_filter(ltoks, x -> x IN ({_FR}))), len(list_filter(ltoks, x -> x IN ({_ES})))) THEN 'de'
         WHEN len(list_filter(ltoks, x -> x IN ({_FR}))) =
              greatest(len(list_filter(ltoks, x -> x IN ({_EN}))), len(list_filter(ltoks, x -> x IN ({_DE}))),
                       len(list_filter(ltoks, x -> x IN ({_FR}))), len(list_filter(ltoks, x -> x IN ({_ES})))) THEN 'fr'
         ELSE 'es'
       END AS lang_guess,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
FROM base
ORDER BY doc_id
"""


def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Token budgeting + internal-repetition profile: whitespace tokens,
    BPE-ish pre-tokenizer tokens, and Gopher-style 3-gram repetition."""
    docs = load_table(spark, sf, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        X.token_count(t).alias("n_ws_tokens"),
        X.bpe_token_count(t).alias("n_bpe_tokens"),
        X.ngram_repetition_ppm(t, 3).alias("rep3_ppm"),
    ).orderBy("doc_id")


SQL_TEXT_TOKENS = r"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS toks,
         CASE WHEN trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') END AS ntoks
  FROM documents
), grams AS (
  SELECT doc_id, text, toks,
         CASE WHEN len(ntoks) >= 3
              THEN list_transform(range(1, len(ntoks) - 1),
                        i -> ntoks[i] || ' ' || ntoks[i+1] || ' ' || ntoks[i+2])
              ELSE []::VARCHAR[] END AS g3
  FROM base
)
SELECT doc_id,
       len(toks) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS n_bpe_tokens,
       CASE WHEN len(g3) > 0
            THEN CAST(floor((1.0 - len(list_distinct(g3))::DOUBLE / len(g3)) * 1000000) AS BIGINT)
            ELSE 0 END AS rep3_ppm
FROM grams
ORDER BY doc_id
"""


def q_quality_by_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregated quality profile per source — the corpus-curation view."""
    docs = load_table(spark, sf, "documents")
    stats = X.text_stats(docs)
    joined = stats.join(docs.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.floor(F.avg("quality_ppm")).cast("long").alias("avg_quality_ppm"),
            F.floor(F.avg("n_tokens") * 10000).cast("long").alias("avg_tokens_e4"),
        )
        .orderBy("source")
    )


SQL_QUALITY_BY_LANG = f"""
WITH base AS (
  SELECT doc_id, source, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ltoks
  FROM documents
), scored AS (
  SELECT doc_id, source, len(toks) AS n_tokens,
         CAST(floor((0.4 * least(len(toks) / 64.0, 1.0)
             + 0.3 * least(len(list_filter(ltoks, x -> x IN ({_EN}))) / 4.0, 1.0)
             + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                           / greatest(length(text), 1))) * 1000000) AS BIGINT) AS quality_ppm
  FROM base
)
SELECT source, count(*) AS n_docs,
       CAST(floor(avg(quality_ppm)) AS BIGINT) AS avg_quality_ppm,
       CAST(floor(avg(n_tokens) * 10000) AS BIGINT) AS avg_tokens_e4
FROM scored
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.exact_duplicates(docs).orderBy("fp")


SQL_DEDUP_EXACT = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents
GROUP BY 1
ORDER BY 1
"""

_SH = """
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [array_to_string(toks, ' ')] END AS shs
  FROM (SELECT doc_id,
               regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM documents)
"""

# double hashing mirror of operators.dedup.minhash_signatures: one md5
# per shingle, h_i = a + i*b over the two 32-bit halves
_SIG = (
    "SELECT doc_id, "
    + ", ".join(f"min(a + {i} * b) AS h{i}" for i in range(16))
    + " FROM (SELECT doc_id,"
    + " ('0x' || substr(md5(sh), 1, 8))::UBIGINT::BIGINT AS a,"
    + " ('0x' || substr(md5(sh), 9, 8))::UBIGINT::BIGINT AS b"
    + f" FROM (SELECT doc_id, unnest(shs) AS sh FROM ({_SH}))) GROUP BY doc_id"
)

_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_ix, md5(h{4*b}::VARCHAR || '|' || h{4*b+1}::VARCHAR || '|' || h{4*b+2}::VARCHAR || '|' || h{4*b+3}::VARCHAR) AS band_hash FROM sigs"
    for b in range(4)
)

_EST = " + ".join(f"(CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END)" for i in range(16))


def q_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.minhash_candidate_pairs(docs).orderBy("doc_a", "doc_b")


SQL_DEDUP_MINHASH = f"""
WITH sigs AS ({_SIG}),
bands AS ({_BANDS}),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
)
SELECT p.doc_a, p.doc_b, round(({_EST}) / 16.0, 6) AS est_jaccard
FROM pairs p JOIN sigs a ON p.doc_a = a.doc_id JOIN sigs b ON p.doc_b = b.doc_id
ORDER BY p.doc_a, p.doc_b
"""


def q_dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.ngram_jaccard_pairs(docs).orderBy("doc_a", "doc_b")


SQL_DEDUP_JACCARD = f"""
WITH sigs AS ({_SIG}),
bands AS ({_BANDS}),
pairs AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM ({_SH})),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_int
  FROM pairs p JOIN sh a ON p.doc_a = a.doc_id JOIN sh b ON p.doc_b = b.doc_id AND a.sh = b.sh
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(n_int / (sa.n_sh + sb.n_sh - n_int), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
ORDER BY i.doc_a, i.doc_b
"""


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate GROUPS: connected components over the exact-Jaccard
    (>= 0.5) near-dup pairs — the keep-one-per-cluster dedup decision.
    Doc ids ride as zero-padded strings so the CC min-label convention
    (lexicographic) equals numeric order in both engines."""
    docs = load_table(spark, sf, "documents")
    pairs = D.ngram_jaccard_pairs(docs, min_jaccard=0.5).select(
        F.format_string("%010d", F.col("doc_a")).alias("doc_a"),
        F.format_string("%010d", F.col("doc_b")).alias("doc_b"),
    )
    return (
        D.duplicate_clusters(pairs)
        .groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("component")
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sigs AS ({_SIG}),
bands AS ({_BANDS}),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM ({_SH})),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_int
  FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id AND a.sh = b.sh
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT lpad(i.doc_a::VARCHAR, 10, '0') AS a, lpad(i.doc_b::VARCHAR, 10, '0') AS b
  FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE round(n_int::DOUBLE / (sa.n_sh + sb.n_sh - n_int), 6) >= 0.5
),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
)
SELECT component, count(*) AS n_docs FROM (
  SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a
) GROUP BY component
ORDER BY component
"""


def q_corpus_keep_list(spark: SparkSession, sf: str) -> DataFrame:
    """The curation end-product: every doc classified kept /
    drop_low_quality / drop_near_dup with fixed precedence (quality
    first, then near-dup non-representatives). Composes the quality
    scorer, the two-stage MinHash→Jaccard pipeline, and the duplicate
    clusters into the keep-one-per-group decision a training-data
    pipeline actually ships."""
    docs = load_table(spark, sf, "documents")
    stats = X.text_stats(docs).select("doc_id", "quality_ppm")
    pairs = D.ngram_jaccard_pairs(docs, min_jaccard=0.5).select(
        F.format_string("%010d", F.col("doc_a")).alias("doc_a"),
        F.format_string("%010d", F.col("doc_b")).alias("doc_b"),
    )
    comps = D.duplicate_clusters(pairs).withColumnRenamed("id", "pid")
    classified = (
        stats.withColumn("pid", F.format_string("%010d", F.col("doc_id")))
        .join(comps, "pid", "left")
        .select(
            F.when(F.col("quality_ppm") < 400_000, F.lit("drop_low_quality"))
            .when(F.col("component").isNotNull() & (F.col("pid") != F.col("component")), F.lit("drop_near_dup"))
            .otherwise(F.lit("kept"))
            .alias("reason")
        )
    )
    return classified.groupBy("reason").agg(F.count("*").alias("n_docs")).orderBy("reason")


def sql_corpus_keep_list() -> str:
    return f"""
WITH RECURSIVE sigs AS ({_SIG}),
bands AS ({_BANDS}),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r ON l.band_ix = r.band_ix AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, unnest(shs) AS sh FROM ({_SH})),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_int
  FROM cand c JOIN sh a ON c.doc_a = a.doc_id JOIN sh b ON c.doc_b = b.doc_id AND a.sh = b.sh
  GROUP BY c.doc_a, c.doc_b
),
pairs AS (
  SELECT lpad(i.doc_a::VARCHAR, 10, '0') AS a, lpad(i.doc_b::VARCHAR, 10, '0') AS b
  FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id JOIN sizes sb ON i.doc_b = sb.doc_id
  WHERE round(n_int::DOUBLE / (sa.n_sh + sb.n_sh - n_int), 6) >= 0.5
),
sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a
),
comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
base AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ltoks
  FROM documents
),
q AS (
  SELECT doc_id,
         CAST(floor((0.4 * least(len(toks) / 64.0, 1.0)
             + 0.3 * least(len(list_filter(ltoks, x -> x IN ({_EN}))) / 4.0, 1.0)
             + 0.3 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                           / greatest(length(text), 1))) * 1000000) AS BIGINT) AS quality_ppm
  FROM base
)
SELECT reason, count(*) AS n_docs FROM (
  SELECT CASE WHEN q.quality_ppm < 400000 THEN 'drop_low_quality'
              WHEN c.component IS NOT NULL AND c.id <> c.component THEN 'drop_near_dup'
              ELSE 'kept' END AS reason
  FROM q LEFT JOIN comp c ON lpad(q.doc_id::VARCHAR, 10, '0') = c.id
) GROUP BY reason ORDER BY reason
"""


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return D.simhash(docs).orderBy("doc_id")


SQL_DEDUP_SIMHASH = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, b.bit, CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS w
  FROM hashed, (SELECT unnest(range(0, 60)) AS bit) b
), per_bit AS (
  SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id ORDER BY doc_id
"""


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    # threshold 0.4 yields a non-trivial pair set on the synthetic
    # embeddings (59 pairs at sf0.01; 0.9 matched nothing and verified
    # nothing about the cosine math)
    emb = load_table(spark, sf, "embeddings")
    return D.embedding_near_dup_pairs(emb, threshold=0.4).orderBy("vec_a", "vec_b")


SQL_DEDUP_EMBEDDING = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
ORDER BY vec_a, vec_b
"""


def q_dedup_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path: AND-OR hyperplane LSH buckets → exact-cosine verify."""
    emb = load_table(spark, sf, "embeddings")
    return D.embedding_near_dup_lsh(emb, threshold=0.4, n_tables=4, n_planes=4).orderBy("vec_a", "vec_b")


def sql_dedup_embedding_lsh(dim: int = 64, n_tables: int = 4, n_planes: int = 4, seed: int = 7) -> str:
    """DuckDB mirror of the LSH bucketing: the SAME seeded hyperplanes
    (float64 repr round-trips exactly) as SQL literals."""
    from fastobo_py_spark.operators.similarity import hyperplane_weights

    w = hyperplane_weights(dim, n_tables * n_planes, seed)
    def bucket_expr(t: int) -> str:
        bits = []
        for j in range(t * n_planes, (t + 1) * n_planes):
            arr = ", ".join(repr(float(x)) for x in w[:, j])
            bits.append(f"(CASE WHEN list_dot_product(v, [{arr}]) >= 0 THEN '1' ELSE '0' END)")
        return " || ".join(bits)

    tabs = " UNION ALL ".join(
        f"SELECT vec_id, v, nrm, {t} AS t, {bucket_expr(t)} AS bucket FROM e" for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), tabs AS ({tabs})
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM tabs a JOIN tabs b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
ORDER BY vec_a, vec_b
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Hamming-band SimHash near-dup pairs (exact for d<=3 by pigeonhole)."""
    docs = load_table(spark, sf, "documents")
    out = D.simhash_hamming_pairs(docs, max_hamming=3)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")).orderBy(
        "doc_a", "doc_b"
    )


# oracle verifies via ALL-PAIRS popcount (oracle scale) — identical result
# set to the band join by the pigeonhole argument in simhash_hamming_pairs
SQL_DEDUP_SIMHASH_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
  FROM documents
), hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT)::BIGINT AS h FROM toks
), bits AS (
  SELECT doc_id, b.bit, CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS w
  FROM hashed, (SELECT unnest(range(0, 60)) AS bit) b
), per_bit AS (
  SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY doc_id, bit
), sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
  FROM per_bit GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def q_ann_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return S.self_topk(emb, n_queries=20, k=5).orderBy("query_id", "rank")


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path ANN: bucket equi-join instead of the cross join."""
    emb = load_table(spark, sf, "embeddings")
    return S.lsh_bucketed_topk(emb, n_queries=20, k=5, n_planes=8).orderBy("query_id", "rank")


def sql_ann_lsh(dim: int = 64, n_planes: int = 8, seed: int = 7) -> str:
    from fastobo_py_spark.operators.similarity import hyperplane_weights

    w = hyperplane_weights(dim, n_planes, seed)
    bits = []
    for j in range(n_planes):
        arr = ", ".join(repr(float(x)) for x in w[:, j])
        bits.append(f"(CASE WHEN list_dot_product(v, [{arr}]) >= 0 THEN '1' ELSE '0' END)")
    bucket = " || ".join(bits)
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), sigs AS (SELECT vec_id, v, nrm, {bucket} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm, bucket FROM sigs WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         list_dot_product(s.v, q.qv) / (s.nrm * q.qnrm) AS cos
  FROM sigs s JOIN q ON s.bucket = q.bucket AND s.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


SQL_ANN_BRUTEFORCE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
), q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# OBO knowledge-graph queries (the flagship pipeline).
#
# These run over the deterministic synthetic corpus (sources/corpus.py) —
# the sf_dir argument is ignored because the corpus is seed-derived, not
# part of the driver's star schema. Their oracles are VALUES literals
# computed at call time by the independent pure-Python implementation
# (oracle.py: plain dicts + union-find), i.e. a genuine second opinion on
# the distributed joins / CC fixpoint, not a Spark re-run.
# ---------------------------------------------------------------------------

_CORPUS_KW = dict(n_obo=40, n_noise=160, n_broken=2, seed=42)


def _corpus_df(spark: SparkSession) -> DataFrame:
    from fastobo_py_spark.sources.corpus import corpus_df

    return corpus_df(spark, partitions=8, **_CORPUS_KW)


# ~20 OBO queries share the same 200-doc synthetic parse; memoize the
# (eagerly filled) clause cache per session so the contract harness parses
# once instead of once per query.
_CLAUSES_CACHE: dict = {}


def _clauses(spark: SparkSession) -> DataFrame:
    from fastobo_py_spark.operators.parse import parse_corpus, split_parsed

    key = spark.sparkContext.applicationId  # unique per session (id() can be GC-reused)
    cached = _CLAUSES_CACHE.get(key)
    if cached is not None:
        return cached
    cl, _ = split_parsed(parse_corpus(_corpus_df(spark)))
    cl = cl.persist()
    cl.count()
    _CLAUSES_CACHE[key] = cl
    return cl


def _sql_quote(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_sql(rows, cols) -> str:
    if not rows:
        sel = ", ".join(f"NULL AS {c}" for c in cols)
        return f"SELECT {sel} WHERE 1=0"
    body = ",\n".join("(" + ", ".join(_sql_quote(v) for v in r) + ")" for r in rows)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"


def q_obo_edges_by_pred(spark: SparkSession, sf: str) -> DataFrame:
    """Raw triple extraction profile: edges per predicate."""
    from fastobo_py_spark.operators.triples import extract_edges

    return (
        extract_edges(_clauses(spark))
        .dropDuplicates(["subj", "pred", "obj", "doc_sha"])
        .groupBy("pred")
        .agg(F.count("*").alias("n_edges"))
        .orderBy("pred")
    )


def sql_obo_edges_by_pred() -> str:
    from collections import Counter

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=False, apply_macros=False)
    counts = Counter(p for _, p, _, _, _ in edges)
    rows = sorted(counts.items())
    return _values_sql([(p, n) for p, n in rows], ["pred", "n_edges"])


def q_obo_canonical_edges_pato(spark: SparkSession, sf: str) -> DataFrame:
    """Fully canonicalized triples for the pato-like docs (exercises the
    equivalence-CC fixpoint + URL compaction targets)."""
    from fastobo_py_spark.operators.canonicalize import apply_xref_macros, rewrite_edges
    from fastobo_py_spark.operators.components import canonical_rewrite, equivalence_components

    cl = _clauses(spark).where(F.col("path").startswith("ontologies/pato"))
    from fastobo_py_spark.operators.triples import extract_edges

    e = extract_edges(cl)
    e = apply_xref_macros(e, cl)
    e = rewrite_edges(e, cl)
    comps = equivalence_components(e)
    e = canonical_rewrite(e, comps)
    return (
        e.dropDuplicates(["subj", "pred", "obj", "doc_sha"])
        .select("subj", "pred", "obj")
        .dropDuplicates()
        .orderBy("subj", "pred", "obj")
    )


def sql_obo_canonical_edges_pato() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    rows = [r for r in generate_corpus(**_CORPUS_KW) if r["path"].startswith("ontologies/pato")]
    edges = oracle.build_edges(rows, canonicalize=True)
    triples = sorted({(s, p, o) for s, p, o, _, _ in edges})
    return _values_sql(triples, ["subj", "pred", "obj"])


def q_obo_frame_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-family frame/clause counts (O13 metrics)."""
    cl = _clauses(spark)
    fam = F.regexp_extract(F.col("path"), r"ontologies/([a-z]+)_", 1)
    return (
        cl.withColumn("family", fam)
        .groupBy("family")
        .agg(
            F.countDistinct("doc_sha").alias("n_docs"),
            F.sum(F.when((F.col("tag") == "id") & (F.col("frame_type") != "Header"), 1).otherwise(0)).alias(
                "n_frames"
            ),
            F.count("*").alias("n_clauses"),
        )
        .orderBy("family")
    )


def sql_obo_frame_stats() -> str:
    import re as _re
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    rows = generate_corpus(**_CORPUS_KW)
    agg = defaultdict(lambda: [set(), 0, 0])
    clauses, _ = oracle.parse_rows(rows)
    import hashlib

    sha_to_fam = {
        hashlib.sha256(r["content"].encode()).hexdigest(): (_re.search(r"ontologies/([a-z]+)_", r["path"]).group(1) if _re.search(r"ontologies/([a-z]+)_", r["path"]) else "")
        for r in rows
        if oracle.is_obo_row(r)
    }
    for c in clauses:
        fam = sha_to_fam.get(c[0], "")
        a = agg[fam]
        a[0].add(c[0])
        if c[3 + 4] == "id" and c[3] != "Header":
            a[1] += 1
        a[2] += 1
    out = [(fam, len(a[0]), a[1], a[2]) for fam, a in sorted(agg.items())]
    return _values_sql(out, ["family", "n_docs", "n_frames", "n_clauses"])


def q_obo_obsolete_nodes(spark: SparkSession, sf: str) -> DataFrame:
    """Obsolete-term audit (the reference's obsolete.ipynb validation):
    obsolete nodes with their replacement status."""
    from fastobo_py_spark.operators.materialize import build_nodes

    nodes = build_nodes(_clauses(spark))
    return (
        nodes.where(F.col("obsolete"))
        .select(
            "id",
            F.size("replaced_by").alias("n_replaced"),
            F.size("alt_ids").alias("n_alt"),
        )
        .orderBy("id")
    )


def sql_obo_obsolete_nodes() -> str:
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    obs = set()
    repl = defaultdict(set)
    alt = defaultdict(set)
    for c in clauses:
        sha, ftype, fid, tag, v1 = c[0], c[3], c[3 + 1], c[3 + 4], c[3 + 5]
        if ftype == "Header" or not fid:
            continue
        key = (sha, fid)
        if tag == "is_obsolete" and v1 == "true":
            obs.add(key)
        elif tag == "replaced_by" and v1:
            repl[key].add(v1)
        elif tag == "alt_id" and v1:
            alt[key].add(v1)
    rows = sorted((fid, len(repl[k]), len(alt[k])) for k in obs for fid in [k[1]])
    return _values_sql(rows, ["id", "n_replaced", "n_alt"])


def q_obo_mention_dict(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-linking dictionary profile: surface forms per kind/scope."""
    from fastobo_py_spark.operators.linking import mention_dictionary

    d = mention_dictionary(_clauses(spark))
    return (
        d.groupBy("kind", "scope")
        .agg(F.count("*").alias("n_forms"), F.countDistinct("mention").alias("n_distinct"))
        .orderBy("kind", "scope")
    )


def sql_obo_mention_dict() -> str:
    import re as _re
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    def norm(s):
        s = _re.sub(r"\s+", " ", s.strip().lower())
        return _re.sub(r"^[\"'\(\[]+|[\"'\)\]\.,;:]+$", "", s)

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    seen = set()
    for c in clauses:
        sha, ftype, fid, tag = c[0], c[3], c[3 + 1], c[3 + 4]
        if ftype == "Header" or not fid:
            continue
        if tag == "name" and c[3 + 7]:
            m = norm(c[3 + 7])
            if m:
                seen.add((sha, m, fid, "name", None))
        elif tag == "synonym" and c[3 + 7]:
            m = norm(c[3 + 7])
            if m:
                seen.add((sha, m, fid, "synonym", c[3 + 11]))
    agg = defaultdict(lambda: [0, set()])
    for sha, m, fid, kind, scope in seen:
        a = agg[(kind, scope)]
        a[0] += 1
        a[1].add(m)
    rows = sorted((k, s, n, len(d)) for (k, s), (n, d) in agg.items())
    return _values_sql(rows, ["kind", "scope", "n_forms", "n_distinct"])


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "region_revenue": q_region_revenue,
    "orders_topk_window": q_orders_topk_window,
    "orders_with_returns": q_orders_with_returns,
    "customers_without_orders": q_customers_without_orders,
    "events_hourly": q_events_hourly,
    "events_sessionize": q_events_sessionize,
    "events_props_json": q_events_props_json,
    "text_stats": q_text_stats,
    "text_tokens": q_text_tokens,
    "quality_by_source": q_quality_by_lang,
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "corpus_keep_list": q_corpus_keep_list,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_ngram_jaccard": q_dedup_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "ann_bruteforce_topk": q_ann_bruteforce,
    "ann_lsh_topk": q_ann_lsh,
    "obo_edges_by_pred": q_obo_edges_by_pred,
    "obo_canonical_edges_pato": q_obo_canonical_edges_pato,
    "obo_frame_stats": q_obo_frame_stats,
    "obo_obsolete_nodes": q_obo_obsolete_nodes,
    "obo_mention_dict": q_obo_mention_dict,
}


def _static_oracle_sqls() -> dict[str, str]:
    return {
        "pricing_summary": SQL_PRICING,
        "top_revenue_orders": SQL_TOP_REVENUE,
        "region_revenue": SQL_REGION_REVENUE,
        "orders_topk_window": SQL_ORDERS_TOPK,
        "orders_with_returns": SQL_ORDERS_WITH_RETURNS,
        "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_props_json": SQL_EVENTS_PROPS,
        "text_stats": SQL_TEXT_STATS,
        "text_tokens": SQL_TEXT_TOKENS,
        "quality_by_source": SQL_QUALITY_BY_LANG,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_stream_exact": SQL_DEDUP_STREAM,
        "dedup_stream_minhash": SQL_DEDUP_MINHASH,
        "dedup_clusters": SQL_DEDUP_CLUSTERS,
        "corpus_keep_list": sql_corpus_keep_list(),
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
        "dedup_ngram_jaccard": SQL_DEDUP_JACCARD,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_simhash_pairs": SQL_DEDUP_SIMHASH_PAIRS,
        "dedup_embedding": SQL_DEDUP_EMBEDDING,
        "dedup_embedding_lsh": sql_dedup_embedding_lsh(),
        "ann_bruteforce_topk": SQL_ANN_BRUTEFORCE,
        "ann_lsh_topk": sql_ann_lsh(),
        "obo_edges_by_pred": sql_obo_edges_by_pred(),
        "obo_canonical_edges_pato": sql_obo_canonical_edges_pato(),
        "obo_frame_stats": sql_obo_frame_stats(),
        "obo_obsolete_nodes": sql_obo_obsolete_nodes(),
        "obo_mention_dict": sql_obo_mention_dict(),
    }


def q_obo_url_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """O6: URL→prefixed compaction through per-doc idspace declarations
    (doc.rs:219-234 semantics) over the pato-like docs."""
    from fastobo_py_spark.operators.idents import compact_with_idspaces
    from fastobo_py_spark.operators.triples import extract_edges

    cl = _clauses(spark).where(F.col("path").startswith("ontologies/pato"))
    urls = extract_edges(cl).where(F.col("obj").startswith("http://"))
    compacted = compact_with_idspaces(urls, "obj", cl)
    return (
        compacted.select(F.col("subj"), F.col("obj").alias("compacted"))
        .dropDuplicates()
        .orderBy("subj", "compacted")
    )


def sql_obo_url_compaction() -> str:
    import re as _re

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    rows = [r for r in generate_corpus(**_CORPUS_KW) if r["path"].startswith("ontologies/pato")]
    out = set()
    for r in rows:
        clauses = oracle.parse_document(r["content"])
        idspaces = {}
        edges = []
        for c in clauses:
            tag, fid = c[4], c[1]
            if c[0] == "Header" and tag == "idspace":
                idspaces[c[5]] = c[6]
            elif tag == "is_a" and c[5] and fid:
                edges.append((fid, c[5]))
        for subj, obj in edges:
            if obj.startswith("http://"):
                comp = obj
                for pfx, base in idspaces.items():
                    if obj.startswith(base):
                        comp = f"{pfx}:{obj[len(base):]}"
                        break
                else:
                    m = _re.match(r"^http://purl\.obolibrary\.org/obo/([A-Za-z0-9]+)_([A-Za-z0-9]+)$", obj)
                    if m:
                        comp = f"{m.group(1)}:{m.group(2)}"
                out.add((subj, comp))
    return _values_sql(sorted(out), ["subj", "compacted"])


def q_obo_frame_diff(spark: SparkSession, sf: str) -> DataFrame:
    """O15: version-diff audit — corpus vs corpus-with-one-family-dropped,
    summarized by change kind."""
    from fastobo_py_spark.operators.diff import frame_change_summary

    cl = _clauses(spark)
    new = cl.where(~F.col("path").startswith("ontologies/pato"))
    ch = frame_change_summary(cl, new)
    return ch.groupBy("change").agg(F.count("*").alias("n_frames")).orderBy("change")


def sql_obo_frame_diff() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    rows = generate_corpus(**_CORPUS_KW)
    clauses, _ = oracle.parse_rows(rows)
    import hashlib

    pato_shas = {
        hashlib.sha256(r["content"].encode()).hexdigest()
        for r in rows
        if r["path"].startswith("ontologies/pato")
    }
    all_ids = {c[3 + 1] for c in clauses if c[3] != "Header" and c[3 + 1]}
    removed_only = {
        c[3 + 1] for c in clauses if c[0] in pato_shas and c[3] != "Header" and c[3 + 1]
    } - {c[3 + 1] for c in clauses if c[0] not in pato_shas and c[3] != "Header" and c[3 + 1]}
    n_removed = len(removed_only)
    n_unchanged = len(all_ids) - n_removed
    out = []
    if n_removed:
        out.append(("removed", n_removed))
    out.append(("unchanged", n_unchanged))
    return _values_sql(sorted(out), ["change", "n_frames"])


# late registrations (defined below the base registry)
QUERIES["obo_url_compaction"] = q_obo_url_compaction
QUERIES["obo_frame_diff"] = q_obo_frame_diff


def q_obo_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Serializer round-trip audit: serialize every parsed doc back to
    canonical OBO, reparse, and compare clause counts — per family."""
    from fastobo_py_spark.obo.serializer import serialize_documents
    from fastobo_py_spark.operators.parse import parse_corpus, split_parsed

    cl = _clauses(spark)
    texts = serialize_documents(cl)
    reparsed_corpus = texts.select(
        F.lit("roundtrip").alias("repo"),
        F.col("doc_sha").alias("path"),  # carries the ORIGINAL sha forward
        F.lit("rt").alias("commit"),
        F.lit("OBO").alias("lang"),
        F.col("obo_text").alias("content"),
    )
    cl2, _ = split_parsed(parse_corpus(reparsed_corpus))
    before = cl.groupBy(F.col("doc_sha").alias("orig_sha")).agg(F.count("*").alias("n_before"))
    after = cl2.groupBy(F.col("path").alias("orig_sha")).agg(F.count("*").alias("n_after"))
    return (
        before.join(after, "orig_sha")
        .select(
            F.when(F.col("n_before") == F.col("n_after"), F.lit("identical")).otherwise(F.lit("mismatch")).alias(
                "status"
            )
        )
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("status")
    )


def sql_obo_roundtrip() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    n_parsed = len({c[0] for c in clauses})
    return _values_sql([("identical", n_parsed)], ["status", "n_docs"])


QUERIES["obo_serializer_roundtrip"] = q_obo_roundtrip


def q_obo_hub_degrees(spark: SparkSession, sf: str) -> DataFrame:
    """O18: salted two-phase in-degree — top 10 hub targets (go-like docs
    concentrate ~60% of is_a edges on 3 hubs per doc)."""
    from fastobo_py_spark.operators.materialize import hub_degrees
    from fastobo_py_spark.operators.triples import extract_edges

    e = (
        extract_edges(_clauses(spark))
        .where(F.col("pred") == "is_a")
        .dropDuplicates(["subj", "pred", "obj", "doc_sha"])
    )
    return hub_degrees(e).orderBy(F.col("in_degree").desc(), F.col("obj")).limit(10)


def sql_obo_hub_degrees() -> str:
    from collections import Counter

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=False, apply_macros=False)
    deg = Counter()
    seen = set()
    for s, p, o, _, sha in edges:
        if p == "is_a" and (s, p, o, sha) not in seen:
            seen.add((s, p, o, sha))
            deg[o] += 1
    top = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return _values_sql(top, ["obj", "in_degree"])


QUERIES["obo_hub_degrees"] = q_obo_hub_degrees


# ---------------------------------------------------------------------------
# Round-2 additions: oracle coverage for the formerly pytest-only operators
# (O12 frame dicts, O19 resume, graph-JSON meta round-trip, typed dates,
# missing-clause audit, ident validity).
# ---------------------------------------------------------------------------


def q_obo_creation_dates(spark: SparkSession, sf: str) -> DataFrame:
    """Typed dates on the node table: per creation_date shape, count and
    epoch-µs extrema (functions/dates.py applied by build_nodes)."""
    from fastobo_py_spark.functions.dates import creation_date_kind
    from fastobo_py_spark.operators.materialize import build_nodes

    nodes = build_nodes(_clauses(spark)).where(F.col("creation_date").isNotNull())
    return (
        nodes.groupBy(creation_date_kind(F.col("creation_date")).alias("kind"))
        .agg(
            F.count("*").alias("n"),
            F.min("creation_date_us").alias("min_us"),
            F.max("creation_date_us").alias("max_us"),
        )
        .orderBy("kind")
    )


def sql_obo_creation_dates() -> str:
    import re as _re
    from datetime import datetime, timezone

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    per_frame: dict = {}
    for c in clauses:
        if c[3] != "Header" and c[3 + 1] and c[3 + 4] == "creation_date":
            per_frame[(c[0], c[3 + 1])] = c[3 + 7]  # value_text; max() of 1 value per frame
    agg: dict = {}
    for raw in per_frame.values():
        if _re.match(r"^\d{4}-\d{2}-\d{2}$", raw):
            kind = "date"
        elif _re.match(r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?$", raw):
            kind = "datetime"
        else:
            kind = "datetime_tz"
        dt = datetime.fromisoformat(raw)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)  # session tz is UTC
        us = int(dt.timestamp()) * 1_000_000 + dt.microsecond
        n, lo, hi = agg.get(kind, (0, us, us))
        agg[kind] = (n + 1, min(lo, us), max(hi, us))
    rows = [(k, n, lo, hi) for k, (n, lo, hi) in sorted(agg.items())]
    return _values_sql(rows, ["kind", "n", "min_us", "max_us"])


def q_obo_frame_dicts(spark: SparkSession, sf: str) -> DataFrame:
    """O12: the dict-of-lists aggregation profiled per idspace —
    (idspace, n_frames, sum of distinct tags, sum of values)."""
    from fastobo_py_spark.operators.idents import edge_idspace
    from fastobo_py_spark.operators.materialize import frame_dicts

    fd = frame_dicts(_clauses(spark).where(F.col("frame_id") != ""))
    n_vals = F.aggregate(F.map_values("clauses"), F.lit(0), lambda acc, v: acc + F.size(v))
    return (
        fd.select(edge_idspace(F.col("frame_id")).alias("idspace"), F.size("clauses").alias("n_tags"), n_vals.alias("n_vals"))
        .groupBy("idspace")
        .agg(F.count("*").alias("n_frames"), F.sum("n_tags").alias("sum_tags"), F.sum("n_vals").alias("sum_vals"))
        .orderBy("idspace")
    )


def sql_obo_frame_dicts() -> str:
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    frames: dict = defaultdict(lambda: defaultdict(int))
    for c in clauses:
        if c[3] == "Header" or not c[3 + 1]:
            continue
        frames[(c[0], c[3 + 1])][c[3 + 4]] += 1
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for (sha, fid), tags in frames.items():
        if oracle._URL_RE.match(fid):
            space = "URL"
        elif ":" in fid:
            space = fid.split(":", 1)[0]
        else:
            space = "UNPREFIXED"
        a = agg[space]
        a[0] += 1
        a[1] += len(tags)
        a[2] += sum(tags.values())
    rows = [(s, a[0], a[1], a[2]) for s, a in sorted(agg.items())]
    return _values_sql(rows, ["idspace", "n_frames", "sum_tags", "sum_vals"])


def q_obo_missing_clauses(spark: SparkSession, sf: str) -> DataFrame:
    """Missing-clause cardinality audit (reference raises
    MissingClauseError, src/error.rs:106-110; here a metrics view):
    frames lacking name/def, counted per (frame_type, missing_tag)."""
    from fastobo_py_spark.operators.parse import missing_clause_violations

    v = missing_clause_violations(_clauses(spark), required=("name", "def"))
    return v.groupBy("frame_type", "missing_tag").agg(F.count("*").alias("n_frames")).orderBy(
        "frame_type", "missing_tag"
    )


def sql_obo_missing_clauses() -> str:
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    frames: dict = defaultdict(set)
    ftypes: dict = {}
    for c in clauses:
        if c[3] == "Header" or not c[3 + 1]:
            continue
        frames[(c[0], c[3 + 1])].add(c[3 + 4])
        ftypes[(c[0], c[3 + 1])] = c[3]
    agg: dict = defaultdict(int)
    for key, tags in frames.items():
        for req in ("name", "def"):
            if req not in tags:
                agg[(ftypes[key], req)] += 1
    rows = [(ft, tag, n) for (ft, tag), n in sorted(agg.items())]
    return _values_sql(rows, ["frame_type", "missing_tag", "n_frames"])


_GOLDEN_IDENTS = [
    "MS:1000031",
    "https://purl.obolibrary.org/obo/MS_1000031",
    "related_to",
    "definitely not an identifier",
]


def q_obo_ident_validity(spark: SparkSession, sf: str) -> DataFrame:
    """fastobo.id.is_valid parity (id.rs:65-93): validity × kind counts
    over every edge object in the corpus plus the doctest golden idents."""
    from fastobo_py_spark.operators.idents import ident_is_valid, ident_kind
    from fastobo_py_spark.operators.triples import extract_edges

    objs = (
        extract_edges(_clauses(spark))
        .dropDuplicates(["subj", "pred", "obj", "doc_sha"])
        .select(F.col("obj").alias("ident"))
    )
    golden = spark.createDataFrame([(s,) for s in _GOLDEN_IDENTS], "ident string")
    idents = objs.unionByName(golden)
    return (
        idents.groupBy(ident_kind(F.col("ident")).alias("kind"), ident_is_valid(F.col("ident")).alias("valid"))
        .agg(F.count("*").alias("n"))
        .orderBy("kind", "valid")
    )


def sql_obo_ident_validity() -> str:
    import re as _re
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=False, apply_macros=False)
    idents = [o for _, _, o, _, _ in edges] + _GOLDEN_IDENTS
    agg: dict = defaultdict(int)
    for s in idents:
        if oracle._URL_RE.match(s):
            kind = "url"
            valid = bool(_re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*://\S+$", s))
        elif ":" in s:
            kind = "prefixed"
            valid = bool(_re.match(r"^[^\s:]+:\S+$", s))
        else:
            kind = "unprefixed"
            valid = bool(s) and bool(_re.match(r"^\S+$", s))
        agg[(kind, valid)] += 1
    rows = [(k, v, n) for (k, v), n in sorted(agg.items())]
    return _values_sql(rows, ["kind", "valid", "n"])


def q_obo_graph_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """dump_graph → load_graph round-trip with node meta: one summary row
    proving definition/synonyms/xrefs/deprecated survive the JSON hop
    (reference parity: fastobo.dump_graph/load_graph, src/py/mod.rs:333-422)."""
    from fastobo_py_spark.operators.graphjson import dump_graph, load_graph
    from fastobo_py_spark.operators.materialize import build_nodes
    from fastobo_py_spark.operators.triples import extract_edges

    cl = _clauses(spark)
    nodes = build_nodes(cl)
    edges = (
        extract_edges(cl)
        .where(~F.col("pred").startswith("intersection_of:"))
        .dropDuplicates(["subj", "pred", "obj", "doc_sha"])
    )
    dumped = dump_graph(nodes, edges)
    n2, e2 = load_graph(spark, dumped)
    nagg = n2.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.when(F.col("definition").isNotNull(), 1).otherwise(0)).alias("n_defs"),
        F.sum(F.size("synonyms")).alias("n_synonyms"),
        F.sum(F.size("xrefs")).alias("n_xrefs"),
        F.sum(F.when(F.col("obsolete"), 1).otherwise(0)).alias("n_deprecated"),
    )
    eagg = e2.agg(F.count("*").alias("n_edges"), F.countDistinct("pred").alias("n_preds"))
    # YAML hop too (reference load_graph accepts JSON and YAML,
    # src/py/mod.rs:333-365): same node/edge totals must survive
    from fastobo_py_spark.operators.graphjson import dump_graph_yaml, load_graph_yaml

    n3, e3 = load_graph_yaml(spark, dump_graph_yaml(nodes, edges))
    yagg = n3.agg(F.count("*").alias("n_nodes_yaml")).crossJoin(
        e3.agg(F.count("*").alias("n_edges_yaml"))
    )
    return nagg.crossJoin(eagg).crossJoin(yagg)


def sql_obo_graph_roundtrip() -> str:
    import re as _re

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    rows = generate_corpus(**_CORPUS_KW)
    clauses, _ = oracle.parse_rows(rows)
    frames: dict = {}
    for c in clauses:
        if c[3] == "Header" or not c[3 + 1]:
            continue
        f = frames.setdefault((c[0], c[3 + 1]), {"def": 0, "syn": 0, "xref": 0, "obs": False})
        tag = c[3 + 4]
        if tag == "def" and c[3 + 7] is not None:
            f["def"] = 1
        elif tag == "synonym":
            f["syn"] += 1
        elif tag == "xref" and c[3 + 5]:
            f["xref"] += 1
        elif tag == "is_obsolete" and c[3 + 5] == "true":
            f["obs"] = True
    n_nodes = len(frames)
    n_defs = sum(f["def"] for f in frames.values())
    n_syn = sum(f["syn"] for f in frames.values())
    n_xref = sum(f["xref"] for f in frames.values())
    n_dep = sum(1 for f in frames.values() if f["obs"])

    purl = _re.compile(r"^http://purl\.obolibrary\.org/obo/([A-Za-z0-9]+)_([A-Za-z0-9]+)$")

    def compact(x: str) -> str:
        m = purl.match(x)
        return f"{m.group(1)}:{m.group(2)}" if m else x

    edges = oracle.build_edges(rows, canonicalize=False, apply_macros=False)
    kept = {
        (compact(s), compact(p) if p != "is_a" else p, compact(o), sha)
        for s, p, o, _, sha in edges
        if not p.startswith("intersection_of:")
    }
    n_edges = len(kept)
    n_preds = len({p for _, p, _, _ in kept})
    return _values_sql(
        [(n_nodes, n_defs, n_syn, n_xref, n_dep, n_edges, n_preds, n_nodes, n_edges)],
        [
            "n_nodes", "n_defs", "n_synonyms", "n_xrefs", "n_deprecated",
            "n_edges", "n_preds", "n_nodes_yaml", "n_edges_yaml",
        ],
    )


def q_obo_pipeline_resume(spark: SparkSession, sf: str) -> DataFrame:
    """O19: checkpointed-lineage resume as an oracle-checked behavior —
    run the full pipeline on half the corpus (deterministic md5(path)
    split), restart over the WHOLE corpus (manifest anti-join must keep
    only the remainder), restart once more (no-op). Edge totals across
    batches must equal a single-shot run — per-partition lineage loses
    and duplicates nothing."""
    import shutil
    import tempfile

    from fastobo_py_spark.plans.pipeline import read_manifest, run_pipeline

    corpus = _corpus_df(spark)
    out = tempfile.mkdtemp(prefix="kg_resume_q_")
    try:
        first = corpus.where(F.substring(F.md5(F.col("path")), 1, 1) < "8")
        m1 = run_pipeline(spark, first, out)
        m2 = run_pipeline(spark, corpus, out)
        m3 = run_pipeline(spark, corpus, out)
        manifest_docs = read_manifest(spark, out).select("doc_sha").distinct().count()
        rows = [
            ("batch1_docs", m1["docs_in_batch"]),
            ("batch2_docs", m2["docs_in_batch"]),
            ("batch3_docs", m3["docs_in_batch"]),
            ("edges_total", m1["edges"] + m2["edges"] + m3["edges"]),
            ("manifest_docs", manifest_docs),
        ]
        return spark.createDataFrame(rows, "metric string, value bigint").orderBy("metric")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def sql_obo_pipeline_resume() -> str:
    import hashlib as _hl

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    rows = generate_corpus(**_CORPUS_KW)
    n1 = sum(1 for r in rows if _hl.md5(r["path"].encode()).hexdigest()[0] < "8")
    n2 = len(rows) - n1
    edges_total = len(oracle.build_edges(rows, canonicalize=True))
    manifest_docs = len({_hl.sha256(r["content"].encode()).hexdigest() for r in rows})
    out = [
        ("batch1_docs", n1),
        ("batch2_docs", n2),
        ("batch3_docs", 0),
        ("edges_total", edges_total),
        ("manifest_docs", manifest_docs),
    ]
    return _values_sql(sorted(out), ["metric", "value"])


def q_obo_owl_axioms(spark: SparkSession, sf: str) -> DataFrame:
    """dump_owl parity (best-effort OBO→OWL2-DL mapping like the
    reference's experimental fastobo-owl path): axiom counts per kind,
    format-parametrized — the functional ('ofn') and OWL/XML ('owx')
    renderers must agree axiom for axiom (reference accepts both,
    src/py/mod.rs:464-511)."""
    from fastobo_py_spark.operators.owl import owl_axioms, owl_axioms_owx, owl_axioms_rdf

    cl = _clauses(spark)
    fn = (
        owl_axioms(cl)
        .groupBy(F.substring_index("axiom", "(", 1).alias("kind"))
        .agg(F.count("*").alias("n_axioms"))
    )
    owx = owl_axioms_owx(cl).groupBy("kind").agg(F.count("*").alias("n_axioms_owx"))
    rdf = owl_axioms_rdf(cl).groupBy("kind").agg(F.count("*").alias("n_axioms_rdf"))
    return fn.join(owx, "kind", "full_outer").join(rdf, "kind", "full_outer").orderBy("kind")


def sql_obo_owl_axioms() -> str:
    from collections import Counter

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    counts: Counter = Counter()
    for c in clauses:
        ftype, fid, tag = c[3], c[3 + 1], c[3 + 4]
        v1, v2, vt = c[3 + 5], c[3 + 6], c[3 + 7]
        if ftype == "Header" or not fid:
            continue
        if tag == "id":
            counts["Declaration"] += 1
        elif tag == "instance_of" and v1:
            counts["ClassAssertion"] += 1
        elif tag == "name" and vt is not None:
            counts["AnnotationAssertion"] += 1
        elif tag == "def" and vt is not None:
            counts["AnnotationAssertion"] += 1
        elif tag == "is_obsolete" and v1 == "true":
            counts["AnnotationAssertion"] += 1
        elif tag == "is_a" and v1:
            counts["SubObjectPropertyOf" if ftype == "Typedef" else "SubClassOf"] += 1
        elif tag == "relationship" and v1 and v2:
            counts["SubClassOf"] += 1
    rows = [(k, n, n, n) for k, n in sorted(counts.items())]
    return _values_sql(rows, ["kind", "n_axioms", "n_axioms_owx", "n_axioms_rdf"])


QUERIES.update(
    {
        "obo_owl_axioms": q_obo_owl_axioms,
        "obo_creation_dates": q_obo_creation_dates,
        "obo_frame_dicts": q_obo_frame_dicts,
        "obo_missing_clauses": q_obo_missing_clauses,
        "obo_ident_validity": q_obo_ident_validity,
        "obo_graph_roundtrip": q_obo_graph_roundtrip,
        "obo_pipeline_resume": q_obo_pipeline_resume,
    }
)
# Generated oracles run the pure-Python second implementation at call
# time — assembled in ONE place so queries() and oracle_sqls() can't
# drift apart (test_every_query_has_oracle pins the key sets).
_GENERATED_ORACLES = {
    "obo_url_compaction": sql_obo_url_compaction,
    "obo_frame_diff": sql_obo_frame_diff,
    "obo_serializer_roundtrip": sql_obo_roundtrip,
    "obo_hub_degrees": sql_obo_hub_degrees,
    "obo_owl_axioms": sql_obo_owl_axioms,
    "obo_creation_dates": sql_obo_creation_dates,
    "obo_frame_dicts": sql_obo_frame_dicts,
    "obo_missing_clauses": sql_obo_missing_clauses,
    "obo_ident_validity": sql_obo_ident_validity,
    "obo_graph_roundtrip": sql_obo_graph_roundtrip,
    "obo_pipeline_resume": sql_obo_pipeline_resume,
}


def oracle_sqls() -> dict[str, str]:
    out = _static_oracle_sqls()
    out.update({name: build() for name, build in _GENERATED_ORACLES.items()})
    return out


# ---------------------------------------------------------------------------
# Round 3: streaming-KG oracle row + obsolete-without-replacement audit
# ---------------------------------------------------------------------------


def q_obo_obsolete_unreplaced(spark: SparkSession, sf: str) -> DataFrame:
    """Obsolete-without-replacement audit (the reference's validation
    pattern, ``docs/examples/obsolete.ipynb`` cell 4): obsolete frames
    lacking a hard ``replaced_by`` redirect, with ``consider``-only
    advisories classed separately from fully dangling obsoletes."""
    from fastobo_py_spark.operators.materialize import build_nodes

    nodes = build_nodes(_clauses(spark))
    status = (
        F.when(F.size("replaced_by") > 0, F.lit("replaced"))
        .when(F.size("consider") > 0, F.lit("consider_only"))
        .otherwise(F.lit("unreplaced"))
    )
    return (
        nodes.where(F.col("obsolete"))
        .select("id", status.alias("status"))
        .where(F.col("status") != "replaced")
        .orderBy("id")
    )


def sql_obo_obsolete_unreplaced() -> str:
    from collections import defaultdict

    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    clauses, _ = oracle.parse_rows(generate_corpus(**_CORPUS_KW))
    obs = set()
    repl: dict = defaultdict(set)
    cons: dict = defaultdict(set)
    for c in clauses:
        sha, ftype, fid, tag, v1 = c[0], c[3], c[3 + 1], c[3 + 4], c[3 + 5]
        if ftype == "Header" or not fid:
            continue
        key = (sha, fid)
        if tag == "is_obsolete" and v1 == "true":
            obs.add(key)
        elif tag == "replaced_by" and v1:
            repl[key].add(v1)
        elif tag == "consider" and v1:
            cons[key].add(v1)
    rows = sorted(
        (k[1], "consider_only" if cons[k] else "unreplaced") for k in obs if not repl[k]
    )
    return _values_sql(rows, ["id", "status"])


def q_obo_stream_kg(spark: SparkSession, sf: str) -> DataFrame:
    """§2.1 ``fastobo.iter`` analogue, oracle-checked end to end: the
    streaming corpus→KG job (readStream → foreachBatch canonical chain,
    streaming/kg.py) drained with availableNow across MULTIPLE
    micro-batches; totals over the edge sink must equal the pure-Python
    oracle — i.e. the stream loses and duplicates nothing vs a batch run
    (reference: ``fastobo.iter``, ``src/iter.rs:174-250`` — the same
    frames, pull-based)."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.sources.corpus import corpus_to_parquet
    from fastobo_py_spark.streaming.kg import stream_build_kg

    base = tempfile.mkdtemp(prefix="stream_kg_q_")
    corpus_dir = os.path.join(base, "corpus")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    try:
        corpus_to_parquet(corpus_dir, n_files=8, **_CORPUS_KW)
        stream_build_kg(spark, corpus_dir, out, ckpt, max_files_per_trigger=3)
        edges = spark.read.parquet(os.path.join(out, "edges"))
        rows = [
            ("docs_with_edges", edges.select("doc_sha").distinct().count()),
            ("edges_total", edges.select("subj", "pred", "obj", "doc_sha").distinct().count()),
            ("n_preds", edges.select("pred").distinct().count()),
        ]
        return spark.createDataFrame(sorted(rows), "metric string, value bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_obo_stream_kg() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=True)
    dist = {(s, p, o, sha) for s, p, o, _, sha in edges}
    rows = [
        ("docs_with_edges", len({e[3] for e in dist})),
        ("edges_total", len(dist)),
        ("n_preds", len({e[1] for e in dist})),
    ]
    return _values_sql(sorted(rows), ["metric", "value"])


QUERIES.update(
    {
        "obo_obsolete_unreplaced": q_obo_obsolete_unreplaced,
        "obo_stream_kg": q_obo_stream_kg,
    }
)
_GENERATED_ORACLES.update(
    {
        "obo_obsolete_unreplaced": sql_obo_obsolete_unreplaced,
        "obo_stream_kg": sql_obo_stream_kg,
    }
)


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked on the codec-FREE part of the
    contract (payload_sha / n_bytes / frame sampling): the Arrow kernel,
    schema, and batching are the real production path — only the decode
    body is environment-stubbed (strict by default; Pillow used when
    importable). Per-kind census over the deterministic media table."""
    from fastobo_py_spark.operators.multimodal import extract_features, sample_frames, synth_media

    media = synth_media(spark, n=64)
    feats = extract_features(media, with_features=False)
    agg = feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.countDistinct("payload_sha").alias("n_distinct_payloads"),
    )
    frames = (
        sample_frames(media)
        .groupBy(F.lit("video").alias("kind"))
        .agg(F.count("*").alias("n_frames"))
    )
    return (
        agg.join(frames, "kind", "left")
        .select("kind", "n_media", "total_bytes", "n_distinct_payloads",
                F.coalesce("n_frames", F.lit(0)).alias("n_frames"))
        .orderBy("kind")
    )


def sql_multimodal_features() -> str:
    import hashlib as _hl
    from collections import defaultdict

    # independent re-derivation of synth_media(n=64, seed=42) + the
    # sample_frames sequence semantics (0 .. duration_ms-1 step 5000)
    kinds = ["image", "audio", "video"]
    per = defaultdict(lambda: [0, 0, set()])
    n_frames = 0
    for i in range(64):
        kind = kinds[i % 3]
        payload = _hl.sha256(f"42|{i}".encode()).digest() * (4 + i % 5)
        st = per[kind]
        st[0] += 1
        st[1] += len(payload)
        st[2].add(_hl.sha256(payload).hexdigest())
        if kind == "video":
            duration_ms = 1000 * (1 + i % 30)
            n_frames += (duration_ms - 1) // 5000 + 1
    rows = [
        (k, st[0], st[1], len(st[2]), n_frames if k == "video" else 0)
        for k, st in sorted(per.items())
    ]
    return _values_sql(rows, ["kind", "n_media", "total_bytes", "n_distinct_payloads", "n_frames"])


QUERIES.update({"multimodal_features": q_multimodal_features})
_GENERATED_ORACLES.update({"multimodal_features": sql_multimodal_features})


def q_dedup_stream_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming cross-batch dedup, oracle-checked on its batch-order-
    INVARIANT outputs: drained over multiple micro-batches, the stream
    must emit exactly one row per distinct content and account for every
    input row — the same census a batch GROUP BY computes (which doc_id
    survives per group is arrival-dependent and deliberately excluded)."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.streaming.dedup import stream_exact_dedup

    base = tempfile.mkdtemp(prefix="stream_dedup_q_")
    try:
        src = os.path.join(base, "docs")
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        docs.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_exact_dedup(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "out"))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(os.path.join(base, "out"))
        rows = [
            ("n_distinct", got.count()),
            ("n_docs", got.agg(F.sum("n_in_batch")).collect()[0][0]),
        ]
        return spark.createDataFrame(sorted(rows), "metric string, value bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_DEDUP_STREAM = """
SELECT * FROM (
  SELECT 'n_distinct' AS metric,
         CAST(count(DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))) AS BIGINT) AS value
  FROM documents
  UNION ALL
  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM documents
) ORDER BY metric
"""

QUERIES.update({"dedup_stream_exact": q_dedup_stream_exact})


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN (cell probing): the third point on the ANN
    quality/cost curve next to brute force (exact) and LSH buckets."""
    emb = load_table(spark, sf, "embeddings")
    return S.ivf_topk(emb, n_queries=20, k=5, n_cells=16, nprobe=4).orderBy("query_id", "rank")


def sql_ann_ivf(dim: int = 64, n_cells: int = 16, nprobe: int = 4, seed: int = 11) -> str:
    """DuckDB mirror: the SAME seeded anchors as SQL literals; cell
    assignment/probing by dot-product rank (ties broken by cell id, the
    UDF's stable-sort order)."""
    from fastobo_py_spark.operators.similarity import ivf_anchors

    a = ivf_anchors(dim, n_cells, seed)
    anchor_rows = ",\n".join(
        f"({c}, [{', '.join(repr(float(x)) for x in a[c])}]::DOUBLE[])" for c in range(n_cells)
    )
    return f"""
WITH anchors(cell, a) AS (VALUES
{anchor_rows}
),
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
sc AS (
  SELECT e.vec_id, anchors.cell, list_dot_product(e.v, anchors.a) AS s,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY list_dot_product(e.v, anchors.a) DESC, anchors.cell) AS rn
  FROM e, anchors
),
assign AS (SELECT vec_id, cell FROM sc WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cell FROM sc WHERE rn <= {nprobe} AND vec_id < 20),
scored AS (
  SELECT p.query_id, a2.vec_id AS neighbor_id,
         list_dot_product(eq.v, en.v) / (eq.nrm * en.nrm) AS cos
  FROM probes p
  JOIN assign a2 ON a2.cell = p.cell AND a2.vec_id <> p.query_id
  JOIN e eq ON eq.vec_id = p.query_id
  JOIN e en ON en.vec_id = a2.vec_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY query_id, rank
"""


QUERIES.update({"ann_ivf_topk": q_ann_ivf})
_GENERATED_ORACLES.update({"ann_ivf_topk": sql_ann_ivf})


def q_dedup_stream_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming MinHash+LSH near-dup candidates drained over
    micro-batches, deduped across bands — must hash-match the SAME
    DuckDB oracle as the batch ``dedup_minhash_lsh`` query: the stream
    loses nothing at batch boundaries and computes identical signatures."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.streaming.dedup import stream_minhash_pairs

    base = tempfile.mkdtemp(prefix="stream_mh_q_")
    try:
        src = os.path.join(base, "docs")
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        docs.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_minhash_pairs(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "out"))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("doc_a", "doc_b", "est_jaccard")
            .dropDuplicates(["doc_a", "doc_b"])
            .orderBy("doc_a", "doc_b")
        )
        # materialize before the temp dir vanishes
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES.update({"dedup_stream_minhash": q_dedup_stream_minhash})


def q_dedup_stream_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming hyperplane-LSH embedding near-dup drained over
    micro-batches, deduped across tables — hash-matches the SAME DuckDB
    oracle as the batch ``dedup_embedding_lsh`` query (identical seeded
    hyperplanes as SQL literals)."""
    import os
    import shutil
    import tempfile

    from fastobo_py_spark.streaming.dedup import stream_embedding_near_dup

    base = tempfile.mkdtemp(prefix="stream_emb_q_")
    try:
        src = os.path.join(base, "emb")
        emb = load_table(spark, sf, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        emb.repartition(4).write.parquet(src)
        stream = spark.readStream.schema("vec_id long, embedding array<double>").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_embedding_near_dup(stream, threshold=0.4, n_tables=4, n_planes=4)
            .writeStream.format("parquet")
            .option("path", os.path.join(base, "out"))
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(os.path.join(base, "out"))
            .select("vec_a", "vec_b")
            .dropDuplicates()
            .orderBy("vec_a", "vec_b")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES.update({"dedup_stream_embedding": q_dedup_stream_embedding})
_GENERATED_ORACLES.update({"dedup_stream_embedding": sql_dedup_embedding_lsh})


def q_obo_ancestors(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive is_a ancestor closure over the canonical KG — the
    classic downstream ontology query (reference users walk the AST in
    Python per doc; here it is a path-doubling DataFrame fixpoint). The
    DuckDB oracle recomputes the closure INDEPENDENTLY with a recursive
    CTE over the pure-Python oracle's edge list — a cross-engine check
    of the closure algorithm itself."""
    from fastobo_py_spark.operators.graph import transitive_ancestors
    from fastobo_py_spark.operators.idents import edge_idspace
    from fastobo_py_spark.plans.pipeline import canonical_edges

    cl = _clauses(spark)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    caches: list = []
    e = canonical_edges(cl.repartition(n, "doc_sha"), strategy="shuffle_hash", persisted_out=caches)
    anc = transitive_ancestors(e)
    out = (
        anc.select(edge_idspace(F.col("id")).alias("idspace"), "id")
        .groupBy("idspace")
        .agg(F.count("*").alias("n_pairs"), F.countDistinct("id").alias("n_ids"))
        .orderBy("idspace")
    )
    # the closure is checkpointed (materialized) inside transitive_ancestors,
    # so the chain caches can release now
    rows = out.collect()
    for c in caches:
        c.unpersist()
    return spark.createDataFrame(rows, out.schema)


def sql_obo_ancestors() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=True)
    base = sorted({(sha, s, o) for s, p, o, _, sha in edges if p == "is_a" and s != o})
    rows = ",\n".join(
        f"({_sql_quote(d)}, {_sql_quote(s)}, {_sql_quote(o)})" for d, s, o in base
    )
    return f"""
WITH RECURSIVE base(doc_sha, id, anc) AS (VALUES
{rows}
),
closure(doc_sha, id, anc) AS (
  SELECT * FROM base
  UNION
  SELECT c.doc_sha, c.id, b.anc
  FROM closure c JOIN base b ON b.doc_sha = c.doc_sha AND b.id = c.anc
  WHERE c.id <> b.anc
)
SELECT CASE WHEN regexp_matches(id, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN 'URL'
            WHEN contains(id, ':') THEN split_part(id, ':', 1)
            ELSE 'UNPREFIXED' END AS idspace,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT id) AS BIGINT) AS n_ids
FROM closure
GROUP BY 1
ORDER BY 1
"""


QUERIES.update({"obo_ancestors": q_obo_ancestors})
_GENERATED_ORACLES.update({"obo_ancestors": sql_obo_ancestors})


def q_obo_ancestors_seeded(spark: SparkSession, sf: str) -> DataFrame:
    """Seed-set ancestor query with min-depth: "ancestors of THESE terms"
    (the common interactive walk — reference users do exactly this over the
    AST, docs/examples/graph.ipynb). Seeds = is_a subjects whose id ends in
    '0' (a deterministic predicate both engines can evaluate). The DuckDB
    oracle recomputes the seeded walk independently with a depth-carrying
    recursive CTE and min(depth) — a cross-engine check of BFS min-depth
    semantics, not just reachability."""
    from fastobo_py_spark.operators.graph import ancestors_of
    from fastobo_py_spark.plans.pipeline import canonical_edges

    cl = _clauses(spark)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    caches: list = []
    e = canonical_edges(cl.repartition(n, "doc_sha"), strategy="shuffle_hash", persisted_out=caches)
    seeds = (
        e.where(F.col("pred") == "is_a")
        .select(F.col("subj").alias("id"))
        .where(F.col("id").endswith("0"))
        .dropDuplicates()
    )
    anc = ancestors_of(e, seeds).orderBy("doc_sha", "id", "ancestor")
    rows = anc.collect()
    for c in caches:
        c.unpersist()
    return spark.createDataFrame(rows, anc.schema)


def sql_obo_ancestors_seeded() -> str:
    from fastobo_py_spark import oracle
    from fastobo_py_spark.sources.corpus import generate_corpus

    edges = oracle.build_edges(generate_corpus(**_CORPUS_KW), canonicalize=True)
    base = sorted({(sha, s, o) for s, p, o, _, sha in edges if p == "is_a" and s != o})
    rows = ",\n".join(
        f"({_sql_quote(d)}, {_sql_quote(s)}, {_sql_quote(o)})" for d, s, o in base
    )
    return f"""
WITH RECURSIVE base(doc_sha, child, parent) AS (VALUES
{rows}
),
walk(doc_sha, id, anc, depth) AS (
  SELECT doc_sha, child, parent, 1 FROM base WHERE child LIKE '%0'
  UNION
  SELECT w.doc_sha, w.id, b.parent, w.depth + 1
  FROM walk w JOIN base b ON b.doc_sha = w.doc_sha AND b.child = w.anc
  WHERE w.id <> b.parent AND w.depth < 25
)
SELECT doc_sha, id, anc AS ancestor, CAST(min(depth) AS BIGINT) AS min_depth
FROM walk
GROUP BY doc_sha, id, anc
ORDER BY doc_sha, id, ancestor
"""


QUERIES.update({"obo_ancestors_seeded": q_obo_ancestors_seeded})
_GENERATED_ORACLES.update({"obo_ancestors_seeded": sql_obo_ancestors_seeded})


_PNG_DIM = 8


def q_multimodal_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode end-to-end, no Pillow required: valid PNGs (all
    four color types, every scanline filter cycled by the encoder) flow
    through the strict-mode Arrow kernel — features exist only if the
    vendored decoder recovered the exact pixel plane. Integer column sums
    are read back out of the float32 feature vector (sum ≤ 2040 « 2^24,
    so round() is exact) and checked against an oracle that re-derives
    luma/resize/sums straight from the pixel pattern, never touching the
    decoder."""
    from fastobo_py_spark.operators.multimodal import extract_features, synth_png_media

    media = synth_png_media(spark, n=12)
    feats = extract_features(media, dim=_PNG_DIM)  # strict default: real decode or die
    scale = F.lit(float(_PNG_DIM * 255))
    colsum = lambda k: F.round(F.element_at("features", k).cast("double") * scale).cast("bigint")
    return (
        feats.select(
            "media_id",
            "payload_sha",
            F.col("n_bytes").cast("bigint").alias("n_bytes"),
            colsum(1).alias("col_first_sum"),
            colsum(_PNG_DIM // 2).alias("col_mid_sum"),
            colsum(_PNG_DIM).alias("col_last_sum"),
            F.round(
                F.expr("aggregate(features, 0D, (acc, x) -> acc + x)") * scale
            ).cast("bigint").alias("total_sum"),
        )
        .orderBy("media_id")
    )


def sql_multimodal_real_decode() -> str:
    import hashlib as _hl

    from fastobo_py_spark.operators.multimodal import _synth_png_pixels
    from fastobo_py_spark.operators.png_codec import encode_png

    rows = []
    for i in range(12):
        w, h, ch, pix = _synth_png_pixels(i)
        payload = encode_png(w, h, ch, pix)
        # independent luma / nearest-resize / column-sum re-derivation
        # (shares only the INPUT pattern and the encoder with the engine;
        # the decode+unfilter under test is not reused here)
        if ch == 1:
            gray = list(pix)
        elif ch == 2:
            gray = list(pix[0::2])
        else:
            gray = [
                (299 * pix[j] + 587 * pix[j + 1] + 114 * pix[j + 2]) // 1000
                for j in range(0, len(pix), ch)
            ]
        grid = [
            [gray[((ty * h) // _PNG_DIM) * w + ((tx * w) // _PNG_DIM)] for tx in range(_PNG_DIM)]
            for ty in range(_PNG_DIM)
        ]
        sums = [sum(grid[ty][tx] for ty in range(_PNG_DIM)) for tx in range(_PNG_DIM)]
        rows.append(
            (
                i,
                _hl.sha256(payload).hexdigest(),
                len(payload),
                sums[0],
                sums[_PNG_DIM // 2 - 1],
                sums[_PNG_DIM - 1],
                sum(sums),
            )
        )
    return _values_sql(
        rows,
        ["media_id", "payload_sha", "n_bytes", "col_first_sum", "col_mid_sum", "col_last_sum", "total_sum"],
    )


QUERIES.update({"multimodal_real_decode": q_multimodal_real_decode})
_GENERATED_ORACLES.update({"multimodal_real_decode": sql_multimodal_real_decode})
