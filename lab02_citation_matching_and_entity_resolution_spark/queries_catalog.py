"""Driver-contract operator queries with DuckDB oracle SQL.

One entry per implemented operator class from SURVEY.md §2, expressed over the
driver's TPC-H-ish testdata (region nation customer supplier part orders
lineitem events documents embeddings).  Each entry is (spark_fn, oracle_sql):
the driver executes both at sf=0.01 and compares row count + schema +
order-insensitive value hash, so

  * every computed column is aliased IDENTICALLY on both sides,
  * doubles are rounded explicitly on both sides (engine-neutral),
  * all sampling/ranking uses md5-hash ordering (deterministic in both
    engines), never rand() (row-order dependent — SURVEY §7.4.4).

Registry shape: REGISTRY[name] = QuerySpec(spark_fn, sql, note).
``spark_fn(spark, sf_dir) -> DataFrame``.

The driver records at most 50 CORRECTNESS entries (round 1 witnessed exactly
the first 50 of 57 in insertion order), so the registry is curated to exactly
50: overlapping ops share one query (the note says which — e.g. "S1 + A1").
Since round 5 ALL 50 carry oracles: j6_greedy_one_to_one — sequential-in-block
greedy, long thought non-SQL-expressible — gained a DuckDB RECURSIVE-CTE
oracle (lockstep per-block acceptance carrying used-id arrays), verified
bit-exact against both the Spark applyInPandas operator and an independent
plain-Python greedy.  f1_f5_normalize_text carries a partial-domain oracle
(LaTeX-identity ASCII rows) since round 4.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # None => non-SQL-expressible; driver does rows-only check
    note: str = ""
    driver: bool = True  # False => suite-witnessed only (driver caps at 50)


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, sql: Optional[str], note: str = "", driver: bool = True):
    """Register a catalog query.

    ``driver=False`` entries get the SAME DuckDB-parity witness in the test
    suite (tests/test_oracle_parity.py iterates the full REGISTRY) but are
    excluded from ``__spark_entry__.queries()``: the driver records only the
    first 50 registered entries, so overflow rows would be silently dropped —
    excluding them explicitly keeps the driver's 50 green rows stable.
    """

    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, sql, note, driver)
        return fn

    return deco


# =========================================================================
# §2.1 Scans (S1/S2) — grouped scan, filtered scan with pushdown
# =========================================================================

@q(
    "s1_grouped_scan",
    """
    SELECT l_orderkey, COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    """,
    "S1 + A1: scan + group-by-key row counts (ref match_utils.py:156-174, :745) "
    "— A1 group_counts witnessed here (registry capped at 50 by the driver)",
)
def s1_grouped_scan(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        )
    )


@q(
    "s2_filtered_scan",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders WHERE o_orderstatus IN ('F', 'O') AND o_totalprice > 1000.0
    """,
    "S2: predicate-during-scan; Catalyst pushes filter to parquet (ref :177-194)",
)
def s2_filtered_scan(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus").isin("F", "O") & (F.col("o_totalprice") > 1000.0))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


# =========================================================================
# §2.2 Projections / filters (P1-P6)
# =========================================================================

@q(
    "p1_range_limit",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey >= 100 ORDER BY o_orderkey LIMIT 50
    """,
    "P1: range + ordered limit (ref match_utils.py:253-256)",
)
def p1_range_limit(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") >= 100)
        .orderBy("o_orderkey")
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@q(
    "p5_threshold_split",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS label
    FROM lineitem
    """,
    "P5 + P6: threshold predicate -> binary label (ref :622-623), with the "
    "projection pruned to the scan (P6; ReadSchema asserted in "
    "tests/test_physical_plans.py) — registry capped at 50 by the driver",
)
def p5_threshold_split(spark, sf_dir):
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("label"),
    )


# =========================================================================
# §2.3 Joins (J1-J7)
# =========================================================================

@q(
    "j1_blocked_all_pairs",
    """
    WITH d AS (SELECT doc_id, lang, source FROM documents)
    SELECT a.lang, a.source, a.doc_id AS left_id, b.doc_id AS right_id
    FROM d a JOIN d b ON a.lang = b.lang AND a.source = b.source
    WHERE a.doc_id < b.doc_id
    """,
    "J1: per-block cross product as self equi-join (ref :427-495)",
)
def j1_blocked_all_pairs(spark, sf_dir):
    d = T(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    a = d.select("lang", "source", F.col("doc_id").alias("left_id"))
    b = d.select("lang", "source", F.col("doc_id").alias("right_id"))
    return a.join(b, ["lang", "source"]).where(F.col("left_id") < F.col("right_id"))


@q(
    "j2_exact_key_join",
    """
    SELECT c.c_custkey, c.c_name, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    "J2: deterministic exact-key equi-join (ref :446-448)",
)
def j2_exact_key_join(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .join(
            T(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_name", "n_name")
    )


@q(
    "j3_broadcast_lookup",
    """
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    "J3: broadcast hash-map lookup join (ref :607-611)",
)
def j3_broadcast_lookup(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .join(F.broadcast(T(spark, sf_dir, "part")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_brand")
    )


@q(
    "j4_double_equi_join",
    """
    SELECT o.o_orderkey, c.c_name, n.n_name
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    "J4: chained equi-joins, Catalyst reorders (ref :289-312)",
)
def j4_double_equi_join(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .join(T(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(T(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", "c_name", "n_name")
    )


@q(
    "j5_partition_map_join",
    """
    WITH split_map AS (
      SELECT n_nationkey, CASE WHEN n_nationkey % 4 = 0 THEN 'test'
                               WHEN n_nationkey % 4 = 1 THEN 'val'
                               ELSE 'train' END AS partition
      FROM nation
    )
    SELECT c.c_custkey, m.partition
    FROM customer c JOIN split_map m ON c.c_nationkey = m.n_nationkey
    """,
    "J5: broadcast partition-label map join (ref :865-871)",
)
def j5_partition_map_join(spark, sf_dir):
    split_map = T(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 4 == 0, "test")
        .when(F.col("n_nationkey") % 4 == 1, "val")
        .otherwise("train")
        .alias("partition"),
    )
    return (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(split_map), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "partition")
    )


@q(
    "j7_anti_join",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    "J7 + SO2: anti-join semantics (ref :758-759); set difference (SO2) is "
    "the same contract on these keys — EXCEPT variant pinned in unit tests. "
    "Anti-joins against the 'F'-status order subset (not all orders) so the "
    "witness is non-vacuous: every customer has SOME order in the synthetic "
    "data, so the all-orders variant matched trivially at 0 rows",
)
def j7_anti_join(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .join(
            T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey")
    )


# =========================================================================
# §2.4 Aggregations (A1-A10)
# =========================================================================

@q(
    "a2_label_histogram",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    "A2: label histogram (ref :984-993)",
)
def a2_label_histogram(spark, sf_dir):
    return T(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "a4_topn_by_count",
    """
    SELECT p_brand, n FROM (
      SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand
    ) ORDER BY n DESC, p_brand LIMIT 5
    """,
    "A4: top-N by count with deterministic tie-break (ref parse_util.py:1851-1856)",
)
def a4_topn_by_count(spark, sf_dir):
    return (
        T(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(5)
    )


@q(
    "a5_sum_rollups",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "A5: sum/percent rollups (TPC-H Q1 shape; ref :762-764)",
)
def a5_sum_rollups(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "a6_doc_freq_idf",
    """
    WITH terms AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms
      WHERE term <> '' GROUP BY term
    )
    SELECT term, df,
           ROUND(LN((1.0 + (SELECT COUNT(*) FROM documents)) / (1.0 + df)) + 1.0, 6) AS idf
    FROM df
    """,
    "A6: TF-IDF corpus fit = explode -> doc-freq -> idf (ref :411-424, :561-581)",
)
def a6_doc_freq_idf(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    # n_docs as a broadcast scalar: docs.count() was an EXTRA full scan of
    # documents run eagerly at plan-build time; cast("double") matches
    # float(n) bit-for-bit so the rounded idf (and the oracle hash) is
    # unchanged (round-7; guide §5 — no driver-side data work)
    n_frame = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    terms = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    dfreq = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return dfreq.crossJoin(F.broadcast(n_frame)).select(
        "term",
        "df",
        F.round(
            F.log((F.lit(1.0) + F.col("_n_docs")) / (F.lit(1.0) + F.col("df"))) + 1.0, 6
        ).alias("idf"),
    )


@q(
    "a8_merge_dedup",
    """
    SELECT c_nationkey,
           MIN(c_name) AS first_name,
           ARG_MAX(c_name, c_acctbal) AS richest_name,
           ROUND(MAX(c_acctbal), 4) AS max_bal
    FROM customer GROUP BY c_nationkey
    """,
    "A8: merge-dedup agg: first non-null / longest-raw winner (ref parse_util.py:669-683)",
)
def a8_merge_dedup(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.min("c_name").alias("first_name"),
            F.expr("max_by(c_name, struct(c_acctbal, c_name))").alias("richest_name"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
    )


@q(
    "a9_confusion_matrix",
    """
    WITH scored AS (
      SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS label,
             CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS prediction
      FROM lineitem
    )
    SELECT label, prediction, COUNT(*) AS n FROM scored GROUP BY label, prediction
    """,
    "A9: confusion matrix as groupBy(label, prediction) (ref modeling_utils.py:307-315)",
)
def a9_confusion_matrix(spark, sf_dir):
    scored = T(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("label"),
        F.when(F.col("l_extendedprice") > 30000, 1).otherwise(0).alias("prediction"),
    )
    return scored.groupBy("label", "prediction").agg(F.count(F.lit(1)).alias("n"))


@q(
    "a10_mrr_at_5",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    SELECT ROUND(AVG(CASE WHEN rk <= 5 AND o_orderkey % 7 = 0
                          THEN 1.0 / rk ELSE 0.0 END), 6) AS mrr
    FROM ranked
    """,
    "A10/M7: MRR@5 = window rank -> reciprocal -> mean (ref modeling_utils.py:331-388)",
)
def a10_mrr_at_5(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    ranked = T(spark, sf_dir, "orders").withColumn("rk", F.row_number().over(w))
    return ranked.agg(
        F.round(
            F.avg(
                F.when(
                    (F.col("rk") <= 5) & (F.col("o_orderkey") % 7 == 0),
                    1.0 / F.col("rk"),
                ).otherwise(0.0)
            ),
            6,
        ).alias("mrr")
    )


# =========================================================================
# §2.5 Windows / top-k (W1-W7)
# =========================================================================

@q(
    "w1_rank_per_group",
    """
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_extendedprice DESC, l_linenumber) AS rk
    FROM lineitem
    """,
    "W1: per-group score sort (ref :494)",
)
def w1_rank_per_group(spark, sf_dir):
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rk")
    )


@q(
    "w3_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 5
    """,
    "W3: top-5 per group (ref modeling_utils.py:375-379)",
)
def w3_topk_per_group(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        T(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 5)
    )


@q(
    "w4_multikey_tiebreak",
    """
    SELECT event_id, user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value DESC, ts DESC, event_id) AS rk
    FROM events
    """,
    "W4: multi-key tie-break rank (ref :929-937)",
)
def w4_multikey_tiebreak(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.desc("ts"), F.asc("event_id")
    )
    return T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.row_number().over(w).alias("rk")
    )


@q(
    "w5_hard_negative_topk",
    """
    SELECT * FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rk
      FROM lineitem WHERE l_discount < 0.05
    ) WHERE rk <= 3
    """,
    "W5: hard-negative top-k below threshold (ref :644-655)",
)
def w5_hard_negative_topk(spark, sf_dir):
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        T(spark, sf_dir, "lineitem")
        .where(F.col("l_discount") < 0.05)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


@q(
    "w7_stable_ordered_concat",
    """
    SELECT user_id,
           STRING_AGG(event_type, '|' ORDER BY ts, event_id) AS event_seq,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    "W7/D2: stable-ordered per-group concatenation — the document-assembly shape (ref parse_util.py:1298-1321)",
)
def w7_stable_ordered_concat(spark, sf_dir):
    return (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "|",
                F.expr(
                    "transform(array_sort(collect_list(struct(ts, event_id, event_type)))"
                    ", s -> s.event_type)"
                ),
            ).alias("event_seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# =========================================================================
# §2.6 Set operations (SO1-SO5)
# =========================================================================

@q(
    "so1_union_distinct",
    """
    SELECT DISTINCT k FROM (
      SELECT o_custkey AS k FROM orders
      UNION ALL
      SELECT c_custkey AS k FROM customer
    )
    """,
    "SO1 + A3: union + distinct (ref :755, :258, :252) — the A3 distinct op "
    "is witnessed by this query's distinct stage (registry capped at 50)",
)
def so1_union_distinct(spark, sf_dir):
    a = T(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    b = T(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    return a.unionByName(b).distinct()


@q(
    "so3_token_set_ops",
    """
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tokens FROM documents
    )
    SELECT a.doc_id AS left_id, b.doc_id AS right_id,
           len(list_intersect(a.tokens, b.tokens)) AS n_shared
    FROM toks a JOIN toks b ON a.doc_id + 1 = b.doc_id
    """,
    "SO3: token set intersect on array columns (ref feature_engineering_utils.py:47-59)",
)
def so3_token_set_ops(spark, sf_dir):
    toks = T(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    a = toks.select(F.col("doc_id").alias("left_id"), F.col("tokens").alias("ta"))
    b = toks.select(F.col("doc_id").alias("right_id"), F.col("tokens").alias("tb"))
    return (
        a.join(b, a.left_id + 1 == b.right_id)
        .select(
            "left_id",
            "right_id",
            F.size(F.array_intersect("ta", "tb")).alias("n_shared"),
        )
    )


@q(
    "so4_dedup_first_seen",
    """
    SELECT lang, source, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_dupes
    FROM documents GROUP BY lang, source
    """,
    "SO4: dedup by normalized key, deterministic winner (ref parse_util.py:1441-1450)",
)
def so4_dedup_first_seen(spark, sf_dir):
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


# =========================================================================
# §2.7 Scalar functions (F6/F7/F12/F13/F26)
# =========================================================================

@q(
    "f6_norm_id",
    """
    SELECT event_id, LOWER(REGEXP_REPLACE(event_type, '\\W+', '', 'g')) AS norm_id
    FROM events
    """,
    "F6: norm_arxiv analog (ref match_utils.py:149-153)",
)
def f6_norm_id(spark, sf_dir):
    return T(spark, sf_dir, "events").select(
        "event_id",
        F.lower(F.regexp_replace("event_type", r"\W+", "")).alias("norm_id"),
    )


@q(
    "f7_f12_scalar_ids",
    """
    SELECT doc_id,
           COALESCE(CASE WHEN regexp_extract(text, '[0-9]{4}', 0) <> ''
                THEN CAST(regexp_extract(text, '[0-9]{4}', 0) AS INT) END, -1) AS year_like,
           SUBSTRING(md5(text), 1, 6) AS content_id
    FROM documents
    """,
    "F7 + F12: first-4-digit-group year parse (missing -> -1, engine-neutral "
    "non-null; ref feature_engineering_utils.py:12-22) and the stable short "
    "content-hash id (ref parse_util.py:1117-1119) — merged into one query "
    "because the driver caps the registry at 50 entries",
)
def f7_f12_scalar_ids(spark, sf_dir):
    from .functions.normalize import parse_year_col

    return T(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(parse_year_col("text"), F.lit(-1)).alias("year_like"),
        F.substring(F.md5("text"), 1, 6).alias("content_id"),
    )


@q(
    "f13_levenshtein_sim",
    """
    WITH pairs AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id,
             SUBSTRING(a.text, 1, 60) AS ta, SUBSTRING(b.text, 1, 60) AS tb
      FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
    )
    SELECT left_id, right_id,
           ROUND(CASE
             WHEN ta = tb AND LENGTH(ta) > 0 THEN 1.0
             WHEN ta = tb THEN 0.0
             WHEN LENGTH(ta) = 0 OR LENGTH(tb) = 0 THEN 0.0
             ELSE 1.0 - levenshtein(ta, tb) * 1.0 / GREATEST(LENGTH(ta), LENGTH(tb))
           END, 6) AS lev_sim
    FROM pairs
    """,
    "F13: normalized Levenshtein with the reference's edge rules (ref :25-44)",
)
def f13_levenshtein_sim(spark, sf_dir):
    from .operators.features import levenshtein_sim_col

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 60).alias("t")
    )
    a = d.select(F.col("doc_id").alias("left_id"), F.col("t").alias("ta"))
    b = d.select(F.col("doc_id").alias("right_id"), F.col("t").alias("tb"))
    return (
        a.join(b, a.left_id + 1 == b.right_id)
        .select(
            "left_id",
            "right_id",
            F.round(levenshtein_sim_col(F.col("ta"), F.col("tb")), 6).alias("lev_sim"),
        )
    )


@q(
    "f26_rule_score",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(LEAST(1.0,
             l_discount * 10
             + 0.2 * CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
             + 0.1 * CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END
             + CASE WHEN l_quantity >= 30 THEN 0.1 ELSE 0.0 END), 4) AS score
    FROM lineitem
    """,
    "F26: combined capped rule score, 4dp rounding (ref match_utils.py:450-489)",
)
def f26_rule_score(spark, sf_dir):
    raw = (
        F.col("l_discount") * 10
        + 0.2 * F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        + 0.1 * F.when(F.col("l_linestatus") == "F", 1).otherwise(0)
        + F.when(F.col("l_quantity") >= 30, 0.1).otherwise(0.0)
    )
    return T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.least(F.lit(1.0), raw), 4).alias("score"),
    )


# =========================================================================
# §2.9 Sampling / splits (M1-M3)
# =========================================================================

@q(
    "m1_skew_cap",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
    "M1: block-size skew cap via deterministic hash-ranked row_number "
    "(ref :592-595; md5 order replaces order-dependent random.sample)",
)
def m1_skew_cap(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.asc("o_orderkey")
    )
    return (
        T(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 3)
    )


@q(
    "m2_stratified_sample",
    """
    WITH labeled AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS label
      FROM lineitem
    )
    SELECT * FROM labeled
    WHERE label = 1
       OR (label = 0 AND SUBSTRING(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                                        CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0','1','2','3'))
    """,
    "M2: keep-all-positives + deterministic-hash negative sample (ref modeling_utils.py:109-153)",
)
def m2_stratified_sample(spark, sf_dir):
    labeled = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("label"),
    )
    digit = F.substring(
        F.md5(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        1,
    )
    return labeled.where(
        (F.col("label") == 1) | ((F.col("label") == 0) & digit.isin("0", "1", "2", "3"))
    )


@q(
    "m3_group_level_split",
    """
    SELECT o_custkey,
           CASE WHEN SUBSTRING(md5(CAST(o_custkey AS VARCHAR)), 1, 1) IN ('0','1')
                THEN 'test'
                WHEN SUBSTRING(md5(CAST(o_custkey AS VARCHAR)), 1, 1) IN ('2','3')
                THEN 'val' ELSE 'train' END AS partition,
           COUNT(*) AS n_rows
    FROM orders GROUP BY o_custkey
    """,
    "M3: leakage-free group-level split via group-key hash (ref :757-842)",
)
def m3_group_level_split(spark, sf_dir):
    h = F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 1)
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "o_custkey",
            F.when(h.isin("0", "1"), "test")
            .when(h.isin("2", "3"), "val")
            .otherwise("train")
            .alias("partition"),
            "n_rows",
        )
    )
