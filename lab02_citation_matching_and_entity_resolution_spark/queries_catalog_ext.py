"""Catalog batch 2: training-data pipeline operators with DuckDB oracles.

Deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash), similarity
search (brute-force cosine top-k; IVF variant rows-only), and text analysis
(language-ID, quality scoring, token counting, fingerprinting).  Registered
into the same REGISTRY as queries_catalog (importing this module is enough).

Engine-portability rules used here:
  * all integer hashes derive from md5 hex (identical bits in Spark & DuckDB):
    Spark  conv(substring(md5(x),1,15), 16, 10)::long
    DuckDB CAST('0x' || substr(md5(x),1,15) AS BIGINT)
  * embedding math is cast to double on the Spark side before dot products so
    both engines accumulate in float64; cosines rounded to 6dp BEFORE ranking.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import ann, dedup, textstats
from .queries_catalog import T, q

# =========================================================================
# Deduplication
# =========================================================================

q_dedup_exact_sql = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS group_size
FROM documents GROUP BY md5(text)
"""


@q("dedup_exact", q_dedup_exact_sql, "exact dedup: hash-groupBy, min-id keeper")
def dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(T(spark, sf_dir, "documents"))


q_dedup_ngram_sql = """
WITH cleaned AS (
  SELECT doc_id, lang, source, regexp_replace(lower(text), '\\s+', '', 'g') AS c
  FROM documents
),
sh_all AS (
  SELECT doc_id, lang, source,
         CASE WHEN length(c) >= 3
              THEN list_distinct(list_transform(range(1, length(c) - 1),
                                                i -> substr(c, CAST(i AS INT), 3)))
              ELSE [] END AS s
  FROM cleaned
),
sh AS (
  -- same md5-ranked block cap (2000) the Spark operator applies by default
  SELECT doc_id, lang, source, s FROM sh_all WHERE len(s) > 0
  QUALIFY row_number() OVER (
    PARTITION BY lang, source
    ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '#23120334')), doc_id
  ) <= 2000
)
SELECT left_id, right_id, jaccard FROM (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
         ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
               len(list_distinct(list_cat(a.s, b.s))), 6) AS jaccard
  FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source
  WHERE a.doc_id < b.doc_id AND len(a.s) > 0 AND len(b.s) > 0
)
WHERE jaccard >= 0.3
"""


@q("dedup_ngram_jaccard", q_dedup_ngram_sql,
   "char-3-gram Jaccard near-dup pairs within (lang, source) blocks; "
   "threshold 0.3 so the sf0.01 witness is non-trivial (~270 pairs vs 1 at "
   "0.5 — the synthetic corpus has no true near-dups, only family "
   "resemblance); oracle filters on the SAME 6dp-rounded value as the "
   "operator so boundary pairs agree bit-for-bit")
def dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        T(spark, sf_dir, "documents"), n=3, threshold=0.3
    )


def _duck_minhash_cte(n_hashes: int, shingle_n: int) -> str:
    mins = ",\n         ".join(
        "MIN(CAST(concat('0x', substr(md5(concat(sh, '#%d')), 1, 15)) AS BIGINT)) AS h%d"
        % (i, i)
        for i in range(n_hashes)
    )
    return f"""
WITH cleaned AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', '', 'g') AS c FROM documents
),
exploded AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
           range(1, length(c) - {shingle_n - 2}),
           i -> substr(c, CAST(i AS INT), {shingle_n})))) AS sh
  FROM cleaned WHERE length(c) >= {shingle_n}
),
sigs AS (
  SELECT doc_id,
         {mins}
  FROM exploded GROUP BY doc_id
)
"""


q_minhash_pairs_sql = _duck_minhash_cte(8, 4) + """
, banded_all AS (
  SELECT doc_id, 0 AS band_idx,
         md5(concat_ws('|', CAST(h0 AS VARCHAR), CAST(h1 AS VARCHAR))) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, 1, md5(concat_ws('|', CAST(h2 AS VARCHAR), CAST(h3 AS VARCHAR))) FROM sigs
  UNION ALL
  SELECT doc_id, 2, md5(concat_ws('|', CAST(h4 AS VARCHAR), CAST(h5 AS VARCHAR))) FROM sigs
  UNION ALL
  SELECT doc_id, 3, md5(concat_ws('|', CAST(h6 AS VARCHAR), CAST(h7 AS VARCHAR))) FROM sigs
),
banded AS (
  -- same md5-ranked band cap (1000) the Spark operator applies by default
  SELECT doc_id, band_idx, band_key FROM banded_all
  QUALIFY row_number() OVER (
    PARTITION BY band_idx, band_key
    ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '#23120334')), doc_id
  ) <= 1000
)
SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
"""


@q("dedup_minhash_band_pairs", q_minhash_pairs_sql,
   "banded MinHash-LSH candidate pairs (shingle->minhash->band->bucket join); "
   "the signature stage is computed in-path, so its bits are witnessed here "
   "too (separate signatures entry dropped for the driver's 50-entry cap)")
def dedup_minhash_band_pairs(spark, sf_dir):
    sigs = dedup.minhash_signatures(
        T(spark, sf_dir, "documents"), n_hashes=8, shingle_n=4
    )
    return dedup.minhash_band_pairs(sigs, n_hashes=8, bands=4)


def _duck_simhash_keyed_cte() -> str:
    """DuckDB CTE computing simhash64(hash_fn='md5') per doc as ``keyed``.

    The md5-derived 60-bit token hash gives identical bits in both engines
    (bits 60-63 are structurally zero, so summing 60 disjoint power-of-two
    terms equals the Spark bitwise-OR reassembly).
    """
    th = "CAST(concat('0x', substr(md5(concat(tok, '#0')), 1, 15)) AS BIGINT)"
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    sim_terms = "\n       + ".join(
        f"(CASE WHEN b{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(60)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '\\s+')) AS tok FROM documents
),
h AS (
  SELECT doc_id, {th} AS th FROM toks WHERE tok <> ''
),
sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM h GROUP BY doc_id
),
keyed AS (
  SELECT doc_id,
         {sim_terms} AS simhash
  FROM sums
)
"""


def _duck_simhash_banded_sql(max_hamming: int = 3, bands: int = 4, cap: int = 1000) -> str:
    """Banded near-pairs mirror of dedup.simhash_band_pairs (pigeonhole
    recall guarantee for hamming <= bands-1), same md5-ranked band cap."""
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1
    band_list = ", ".join(str(b) for b in range(bands))
    return _duck_simhash_keyed_cte() + f"""
, banded_all AS (
  SELECT doc_id, simhash, t.b AS band_idx,
         (simhash >> (t.b * {band_bits})) & {mask} AS band_key
  FROM keyed CROSS JOIN UNNEST([{band_list}]) AS t(b)
),
banded AS (
  SELECT doc_id, simhash, band_idx, band_key FROM banded_all
  QUALIFY row_number() OVER (
    PARTITION BY band_idx, band_key
    ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '#23120334')), doc_id
  ) <= {cap}
)
SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


@q("dedup_simhash_pairs", _duck_simhash_banded_sql(max_hamming=3, bands=4),
   "Banded SimHash64 near-pairs (r4: upgraded from the single-prefix probe, "
   "which measured ~12% recall at hamming<=8 — pigeonhole over 4 16-bit "
   "bands guarantees 100% recall for hamming<=3); md5-derived token bits "
   "reproduce the exact simhash values in DuckDB, band cap mirrored")
def dedup_simhash_pairs(spark, sf_dir):
    sim = dedup.simhash64(T(spark, sf_dir, "documents"), hash_fn="md5")
    return dedup.simhash_band_pairs(sim, max_hamming=3, bands=4)


q_embedding_near_sql = """
SELECT left_id, right_id, cosine FROM (
  SELECT a.vec_id AS left_id, b.vec_id AS right_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.label = b.label
  WHERE a.vec_id < b.vec_id
)
WHERE cosine >= 0.35
"""


@q("dedup_embedding_cosine", q_embedding_near_sql,
   "embedding-cosine near-dup pairs, blocked on label; threshold 0.35 so "
   "the sf0.01 witness is non-trivial (~26 pairs — the synthetic embeddings "
   "are near-orthogonal random vectors, so 0.6 matched vacuously at 0 "
   "rows); oracle filters on the SAME 6dp-rounded cosine as the operator")
def dedup_embedding_cosine(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return dedup.embedding_near_dup(
        emb, threshold=0.35, block_expr=F.col("label")
    )


# =========================================================================
# Similarity search (ANN)
# =========================================================================

q_ann_brute_sql = """
WITH queries AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cosine
  FROM embeddings e CROSS JOIN queries q
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rk
  FROM scored
)
SELECT query_id, vec_id, cosine, rk FROM ranked WHERE rk <= 10
"""


@q("ann_brute_force_topk", q_ann_brute_sql,
   "exact cosine top-10 per query (broadcast queries, stream items)")
def ann_brute_force_topk(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.brute_force_topk(emb, queries, k=10)


q_ann_ivf_sql = """
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY m, vec_id) - 1 AS INT) AS cell_id,
         v AS centroid
  FROM (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS m
        FROM emb ORDER BY m, vec_id LIMIT 8)
),
assign_items AS (
  SELECT vec_id, v, cell_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY ROUND(list_cosine_similarity(v, centroid), 6) DESC,
                                     cell_id) AS p
  FROM emb CROSS JOIN cents
),
it AS (SELECT vec_id, v, cell_id FROM assign_items WHERE p = 1),
qsrc AS (SELECT vec_id AS query_id, v FROM emb WHERE vec_id < 8),
assign_q AS (
  SELECT query_id, v, cell_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(list_cosine_similarity(v, centroid), 6) DESC,
                                     cell_id) AS p
  FROM qsrc CROSS JOIN cents
),
qs AS (SELECT query_id, v, cell_id FROM assign_q WHERE p <= 3),
scored AS (
  SELECT q.query_id, i.vec_id,
         ROUND(list_cosine_similarity(i.v, q.v), 6) AS cosine
  FROM it i JOIN qs q ON i.cell_id = q.cell_id
),
dedup AS (
  SELECT query_id, vec_id, MAX(cosine) AS cosine
  FROM scored GROUP BY query_id, vec_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rk
  FROM dedup
)
SELECT query_id, vec_id, cosine, rk FROM ranked WHERE rk <= 10
"""


@q("ann_ivf_topk", q_ann_ivf_sql,
   "IVF-blocked approximate top-k — deterministic md5-ordered centroid "
   "seeding (TakeOrdered, no global window) makes the whole path "
   "DuckDB-reproducible; round 1 was rows-only")
def ann_ivf_topk(spark, sf_dir):
    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.ivf_topk(emb, queries, k=10, n_cells=8, n_probe=3)


# =========================================================================
# Text analysis
# =========================================================================

def _duck_quality_sql() -> str:
    """DuckDB mirror of textstats.quality_score — every ratio and the
    composite, so the full operator is oracle-witnessed (round 1 had only the
    core ratios; the composite was rows-only)."""
    from .operators.textstats import _QUALITY_STOPWORDS_EN

    stop_list = ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS_EN)
    return f"""
WITH feat AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         len(string_split_regex(text, '\\s+')) AS n_tokens,
         CASE WHEN len(string_split_regex(text, '\\s+')) > 0
              THEN LENGTH(text) * 1.0 / len(string_split_regex(text, '\\s+'))
              ELSE 0.0 END AS mean_tok_len,
         CASE WHEN LENGTH(text) > 0
              THEN LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / LENGTH(text)
              ELSE 0.0 END AS alpha_ratio,
         CASE WHEN LENGTH(text) > 0
              THEN LENGTH(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / LENGTH(text)
              ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(string_split_regex(text, '\\s+')) > 0
              THEN len(list_intersect(list_distinct(string_split_regex(text, '\\s+')),
                                      [{stop_list}])) * 1.0
                   / LEAST(len(string_split_regex(text, '\\s+')), 10)
              ELSE 0.0 END AS stop_ratio
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(LEAST(1.0,
             0.4 * alpha_ratio
             + 0.3 * LEAST(1.0, stop_ratio)
             + 0.2 * (CASE WHEN mean_tok_len >= 3 AND mean_tok_len <= 12
                           THEN 1.0 ELSE 0.0 END)
             + 0.1 * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)), 6) AS quality
FROM feat
"""


@q("text_quality_score", _duck_quality_sql(),
   "quality scoring: length/alpha/punct/stopword ratios + composite score "
   "(full oracle; subsumes round 1's text_quality_core)")
def text_quality_score(spark, sf_dir):
    return textstats.quality_score(T(spark, sf_dir, "documents"))


q_token_counts_sql = """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]')) AS bpe_pieces
FROM documents
"""


@q("text_token_counts", q_token_counts_sql,
   "whitespace + BPE-ish piece token counting")
def text_token_counts(spark, sf_dir):
    return textstats.token_counts(T(spark, sf_dir, "documents"))


def _duck_langid_sql() -> str:
    """DuckDB mirror of textstats.language_id: 10-language weighted
    frequency-profile scores over token OCCURRENCES (integer weights ->
    bit-exact sums), first-max-wins guess in declaration order."""
    from .operators.textstats import _LANG_PROFILES

    langs = list(_LANG_PROFILES)

    def case_sum(profile: dict[str, int]) -> str:
        whens = " ".join(f"WHEN '{w}' THEN {wt}" for w, wt in profile.items())
        return (
            "CAST(coalesce(list_sum(list_transform(_toks, "
            f"t -> CASE t {whens} ELSE 0 END)), 0) AS BIGINT)"
        )

    score_cols = ",\n         ".join(
        f"{case_sum(p)} AS score_{la}" for la, p in _LANG_PROFILES.items()
    )
    best = "GREATEST(" + ", ".join(f"score_{la}" for la in langs) + ")"
    whens = "\n            ".join(
        f"WHEN score_{la} = {best} AND {best} > 0 THEN '{la}'" for la in langs
    )
    score_select = ", ".join(f"score_{la}" for la in langs)
    return f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(lower(coalesce(text, '')), '\\s+') AS _toks
  FROM documents
),
h AS (
  SELECT doc_id,
         {score_cols}
  FROM t
)
SELECT doc_id, {score_select},
       CASE {whens}
            ELSE 'und' END AS lang_guess
FROM h
"""


@q("text_language_id", _duck_langid_sql(),
   "10-language weighted frequency-profile language ID "
   "(full oracle: integer scores + guess)")
def text_language_id(spark, sf_dir):
    return textstats.language_id(T(spark, sf_dir, "documents"))


q_fingerprint_sql = """
WITH cleaned AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', '', 'g') AS c FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN length(c) >= 8
              THEN list_distinct(list_transform(range(1, length(c) - 6),
                                                i -> substr(c, CAST(i AS INT), 8)))
              ELSE [] END AS s
  FROM cleaned
),
hashed AS (
  SELECT doc_id,
         list_sort(list_transform(s,
           x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT))) AS hs
  FROM sh
)
SELECT doc_id,
       md5(array_to_string(list_transform(hs[1:8], x -> CAST(x AS VARCHAR)), ',')) AS fingerprint
FROM hashed
"""


@q("text_fingerprint", q_fingerprint_sql,
   "winnowing-style min-k shingle-hash document fingerprint")
def text_fingerprint(spark, sf_dir):
    return textstats.fingerprint(T(spark, sf_dir, "documents"), k=8)


# =========================================================================
# Catalog batch 3: remaining SURVEY §2 rows
# =========================================================================

q_a7_tfidf_cosine_sql = """
WITH terms AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> '' GROUP BY doc_id, term
),
idf AS (
  SELECT term,
         LN((1.0 + (SELECT COUNT(*) FROM documents)) / (1.0 + COUNT(DISTINCT doc_id))) + 1.0 AS idf
  FROM terms GROUP BY term
),
w AS (
  SELECT t.doc_id, t.term, t.tf * i.idf AS w FROM terms t JOIN idf i ON t.term = i.term
),
norms AS (
  SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
),
vec AS (
  SELECT w.doc_id, w.term, w.w / n.nrm AS wn FROM w JOIN norms n ON w.doc_id = n.doc_id
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       ROUND(SUM(a.wn * b.wn), 6) AS tfidf_cosine
FROM vec a JOIN vec b ON a.term = b.term AND a.doc_id + 1 = b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@q("a7_tfidf_pair_cosine", q_a7_tfidf_cosine_sql,
   "A7: sparse TF-IDF cosine as explode-join-sum (ref match_utils.py:422-424)")
def a7_tfidf_pair_cosine(spark, sf_dir):
    from .operators.tfidf import doc_tfidf_vectors

    docs = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("conv_id"),
        F.filter(F.split("text", " "), lambda t: t != "").alias("tokens"),
    )
    vec = doc_tfidf_vectors(docs)
    a = vec.select(F.col("conv_id").alias("left_id"), "term", F.col("w_norm").alias("lw"))
    b = vec.select(F.col("conv_id").alias("right_id"), "term", F.col("w_norm").alias("rw"))
    return (
        a.join(b, (a.term == b.term) & (a.left_id + 1 == b.right_id))
        .groupBy("left_id", "right_id")
        .agg(F.round(F.sum(F.col("lw") * F.col("rw")), 6).alias("tfidf_cosine"))
    )


q_f25_build_text_sql = """
SELECT doc_id,
       TRIM(CONCAT_WS(' ', lang, source, text,
                      CAST(n_chars AS VARCHAR))) AS built_text
FROM documents
"""


@q("f25_build_text", q_f25_build_text_sql,
   "F25: multi-signal document text builder via concat_ws (ref :334-375)")
def f25_build_text(spark, sf_dir):
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(
            F.concat_ws(
                " ", "lang", "source", "text", F.col("n_chars").cast("string")
            )
        ).alias("built_text"),
    )


q_d4_field_extract_sql = """
SELECT event_id,
       regexp_extract(props, '[0-9]{4}', 0) AS year_like,
       LOWER(regexp_extract(event_type, '^[a-zA-Z]+', 0)) AS kind,
       CASE WHEN props LIKE '%a%' THEN 1 ELSE 0 END AS has_a
FROM events
"""


@q("d4_field_extraction", q_d4_field_extract_sql,
   "D4: regex field-extraction battery from free text (ref parse_util.py:738-780)")
def d4_field_extraction(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r"[0-9]{4}", 0).alias("year_like"),
        F.lower(F.regexp_extract("event_type", r"^[a-zA-Z]+", 0)).alias("kind"),
        F.when(F.col("props").contains("a"), 1).otherwise(0).alias("has_a"),
    )


q_so5_ordered_dedup_sql = """
SELECT doc_id,
       array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
           AS tokens_sorted
FROM documents
"""


@q("so5_ordered_dedup", q_so5_ordered_dedup_sql,
   "SO5: order-preserving token dedup, witnessed as a joined scalar so the "
   "driver canonicalizer can hash it (ref parse_util.py:683). The array-typed "
   "variant is pinned in tests/test_setops.py.")
def so5_ordered_dedup(spark, sf_dir):
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(F.split("text", " "))), " "
        ).alias("tokens_sorted"),
    )


q_a6b_block_idf_sql = """
WITH flt AS (
  SELECT lang, source, doc_id, term FROM (
    SELECT lang, source, doc_id, UNNEST(string_split(text, ' ')) AS term
    FROM documents
  ) WHERE term <> ''
),
n_b AS (
  SELECT lang, source, COUNT(DISTINCT doc_id) AS _n
  FROM documents GROUP BY lang, source
),
dfreq AS (
  SELECT lang, source, term, COUNT(DISTINCT doc_id) AS df
  FROM flt GROUP BY lang, source, term
)
SELECT d.lang, d.source, d.term, d.df,
       ROUND(LN((n._n + 1.0) / (d.df + 1.0)) + 1.0, 6) AS idf
FROM dfreq d JOIN n_b n ON d.lang = n.lang AND d.source = n.source
"""


@q("a6b_tfidf_block_scope", q_a6b_block_idf_sql,
   "A6b: TF-IDF fit WITHIN each block — the reference's default "
   "TFIDF_SCOPE='paper' (ref match_utils.py:411-424); global fit is a6")
def a6b_tfidf_block_scope(spark, sf_dir):
    from .operators.tfidf import block_scope_idf

    docs = T(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("conv_id"),
        "lang",
        "source",
        F.filter(F.split("text", " "), lambda t: t != "").alias("tokens"),
    )
    idf = block_scope_idf(docs, ("lang", "source"))
    return idf.select(
        "lang", "source", "term", "df", F.round("idf", 6).alias("idf")
    )


# -------------------------------------------------------------------------
# J6 oracle: greedy 1:1 IS SQL-expressible after all — as a RECURSIVE CTE
# running the greedy loop in lockstep across blocks.  Each iteration carries
# one row per still-active block holding the accumulated used-left/used-right
# id arrays; the recursive term joins the candidate pairs back to that state,
# filters conflicts, and accepts the per-block best by the same total order
# the Spark operator uses ((-score, left_id, right_id), resolve.py:44).
# Blocks drop out when no candidate survives; every emitted row is one
# accepted pair.  Depth = max accepted pairs in any block (<=7 for lineitem
# per-orderkey blocks), so the oracle runs in seconds at sf0.01.  Verified
# bit-exact (including raw double scores) against an independent plain-Python
# greedy on the same input — with tests/test_resolve_cluster.py's
# twice-implemented witness, J6 is now THREE-way agreeing.
# -------------------------------------------------------------------------

q_j6_sql = r"""
WITH RECURSIVE pairs AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS block_key,
         'p' || CAST(l_partkey AS VARCHAR) AS left_id,
         's' || CAST(l_suppkey AS VARCHAR) AS right_id,
         l_discount * 10 AS score
  FROM lineitem
  WHERE l_discount * 10 >= 0.2
),
sel AS (
  SELECT block_key, left_id, right_id, score,
         [left_id] AS used_l, [right_id] AS used_r
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY block_key ORDER BY score DESC, left_id, right_id) AS rn
    FROM pairs
  ) WHERE rn = 1
  UNION ALL
  SELECT block_key, left_id, right_id, score,
         list_append(used_l, left_id) AS used_l,
         list_append(used_r, right_id) AS used_r
  FROM (
    SELECT p.block_key, p.left_id, p.right_id, p.score, s.used_l, s.used_r,
           row_number() OVER (
               PARTITION BY p.block_key
               ORDER BY p.score DESC, p.left_id, p.right_id) AS rn
    FROM pairs p JOIN sel s ON p.block_key = s.block_key
    WHERE NOT list_contains(s.used_l, p.left_id)
      AND NOT list_contains(s.used_r, p.right_id)
  ) WHERE rn = 1
)
SELECT block_key, left_id, right_id, score FROM sel
"""


@q("j6_greedy_one_to_one", q_j6_sql,
   "J6: greedy 1:1 assignment per block (sequential-in-block semantics, "
   "applyInPandas; oracled since r5 via a DuckDB recursive CTE that runs "
   "the greedy loop in lockstep across blocks)")
def j6_greedy_one_to_one(spark, sf_dir):
    from .operators.resolve import greedy_one_to_one

    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("block_key"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("left_id"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("right_id"),
        (F.col("l_discount") * 10).alias("score"),
    )
    return greedy_one_to_one(li, threshold=0.2)


# Partial-domain oracle for the F1-F5 normalizer chain: on printable-ASCII
# rows containing none of \ % { } $ [ ] (so every LaTeX stage F1-F4 is an
# identity), no 'keywords:' (the sentence-stitch rules), and not the
# reference's dead-code line-136 needle, normalize_text collapses to
# lower -> delete-ASCII-punct-except-:/  -> whitespace-collapse -> trim —
# exactly expressible in DuckDB.  The SPARK side still runs the real
# full-chain pandas UDF over the SAME domain filter, so this witnesses the
# production normalizer bit-for-bit on the restricted domain (at sf0.01 the
# whole documents table is in-domain: 500/500 rows).  Full-unicode NFKD
# behavior stays pinned by the 21 golden tests in tests/test_normalize.py.
_F1F5_PUNCT_SQL = """!"#$%&''()*+,-.;<=>?@[\\]^_`{|}~"""

q_f1f5_sql = r"""
WITH base AS (
  SELECT doc_id, text FROM documents
  WHERE regexp_matches(text, '^[\x20-\x7E\t\n]*$')
    AND NOT regexp_matches(text, '[\\%{}$\[\]]')
    AND NOT regexp_matches(text, '(?i)keywords:')
    AND NOT contains(text, ''').replace(')
)
SELECT doc_id,
       trim(regexp_replace(translate(lower(text), 'PUNCT', ''),
                           '\s+', ' ', 'g')) AS text_norm
FROM base
""".replace("'PUNCT'", "'" + _F1F5_PUNCT_SQL + "'")


@q("f1_f5_normalize_text", q_f1f5_sql,
   "F1-F5: canonical normalizer chain (full pandas-UDF engine on the Spark "
   "side) with a PARTIAL-DOMAIN oracle: rows where the LaTeX stages are "
   "identity and ASCII makes NFKD a no-op; full-unicode behavior pinned by "
   "golden tests")
def f1_f5_normalize_text(spark, sf_dir):
    from .functions.normalize import normalize_text_udf

    # \r is EXCLUDED from the domain (not folded): the kernel deletes it
    # (normalize.py:142 'foo\rbar'->'foobar') while SQL \s+ would space it
    domain = (
        F.col("text").rlike(r"^[\x20-\x7E\t\n]*$")
        & ~F.col("text").rlike(r"[\\%{}$\[\]]")
        & ~F.col("text").rlike(r"(?i)keywords:")
        & ~F.col("text").contains("').replace(")
    )
    return (
        T(spark, sf_dir, "documents")
        .where(domain)
        .select("doc_id", normalize_text_udf()(F.col("text")).alias("text_norm"))
    )


# =========================================================================
# Catalog batch 4: round-5 additions — the two formerly-excluded feature
# functions (SURVEY §2.7 F18/F23), witnessed end-to-end with DuckDB oracles.
# The documents corpus carries no digits and no author arrays, so both
# queries first BUILD the inputs deterministically from documents columns
# (text + n_chars + doc_id decade for F18; two-token pseudo-authors from the
# leading text tokens for F23) and then apply the real operator columns.
# =========================================================================

q_f18_digit_overlap_sql = r"""
WITH built AS (
  SELECT doc_id,
         concat_ws(' ', text, CAST(n_chars AS VARCHAR),
                   CAST(CAST(floor(doc_id / 10) AS BIGINT) AS VARCHAR)) AS t
  FROM documents
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       len(list_intersect(list_distinct(regexp_extract_all(a.t, '\d+')),
                          list_distinct(regexp_extract_all(b.t, '\d+')))) AS digit_overlap
FROM built a JOIN built b ON a.doc_id + 1 = b.doc_id
"""


@q("f18_digit_overlap", q_f18_digit_overlap_sql,
   "F18: shared numeric-token count between adjacent docs' built texts "
   "(ref feature_engineering_utils.py:92-96; computed-but-never-emitted "
   "in the reference, so it stays out of FEATURE_COLS)",
   driver=False)
def f18_digit_overlap(spark, sf_dir):
    from .operators.features import digit_overlap_col

    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            "text",
            F.col("n_chars").cast("string"),
            F.floor(F.col("doc_id") / 10).cast("long").cast("string"),
        ).alias("t"),
    )
    a = docs.select(F.col("doc_id").alias("left_id"), F.col("t").alias("ta"))
    b = docs.select(F.col("doc_id").alias("right_id"), F.col("t").alias("tb"))
    return a.join(b, a.left_id + 1 == b.right_id).select(
        "left_id",
        "right_id",
        digit_overlap_col(F.col("ta"), F.col("tb")).alias("digit_overlap"),
    )


q_f23_firstname_match_sql = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
fn AS (
  SELECT doc_id, list_filter([tk[1], tk[3]], x -> x IS NOT NULL) AS f
  FROM toks
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       CAST(CASE WHEN len(a.f) = 0 OR len(b.f) = 0 THEN 0.0
                 WHEN len(list_intersect(a.f, b.f)) > 0 THEN 1.0
                 ELSE 0.0 END AS DOUBLE) AS firstname_match
FROM fn a JOIN fn b ON a.doc_id + 1 = b.doc_id
"""


@q("f23_firstname_match", q_f23_firstname_match_sql,
   "F23: any-shared-author-FIRST-name flag over two-token pseudo-authors "
   "built from the leading text tokens (ref feature_engineering_utils.py:"
   "145-155; listed in the reference's FEATURE_COLS but never emitted — "
   "latent upstream bug, SURVEY §5.4 — so it stays out of FEATURE_COLS)",
   driver=False)
def f23_firstname_match(spark, sf_dir):
    from .operators.features import author_firstname_match_col

    toks = T(spark, sf_dir, "documents").select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("tk")
    )
    # two-token pseudo-authors: "tok0 tok1" and "tok2 tok3" (missing tokens
    # degrade to shorter authors; all-missing degrades to '' and is dropped,
    # exercising the either-empty -> 0.0 rule)
    authors = toks.select(
        "doc_id",
        F.filter(
            F.array(
                F.concat_ws(" ", F.get("tk", 0), F.get("tk", 1)),
                F.concat_ws(" ", F.get("tk", 2), F.get("tk", 3)),
            ),
            lambda x: x != "",
        ).alias("authors"),
    )
    a = authors.select(F.col("doc_id").alias("left_id"), F.col("authors").alias("aa"))
    b = authors.select(F.col("doc_id").alias("right_id"), F.col("authors").alias("ab"))
    return a.join(b, a.left_id + 1 == b.right_id).select(
        "left_id",
        "right_id",
        author_firstname_match_col(F.col("aa"), F.col("ab")).alias("firstname_match"),
    )


q_f21_f22_author_set_flags_sql = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
auth AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
              ELSE list_filter(
                     [concat_ws(' ', tk[1], tk[2]), concat_ws(' ', tk[3], tk[4])],
                     x -> x <> '')
         END AS a
  FROM toks
),
ln AS (
  SELECT doc_id, a,
         list_transform(a, x -> string_split(x, ' ')[-1]) AS last_names
  FROM auth
)
SELECT l.doc_id AS left_id, r.doc_id AS right_id,
       CASE WHEN len(list_distinct(l.a)) = 0 OR len(list_distinct(r.a)) = 0
            THEN 0.0
            ELSE CAST(len(list_intersect(list_distinct(l.a), list_distinct(r.a))) AS DOUBLE)
                 / len(list_distinct(list_concat(l.a, r.a)))
       END AS author_overlap,
       CASE WHEN len(list_distinct(l.last_names)) = 0
              OR len(list_distinct(r.last_names)) = 0 THEN 0.0
            WHEN len(list_intersect(list_distinct(l.last_names),
                                    list_distinct(r.last_names))) > 0 THEN 1.0
            ELSE 0.0
       END AS lastname_match
FROM ln l JOIN ln r ON l.doc_id + 1 = r.doc_id
"""


@q("f21_f22_author_set_flags", q_f21_f22_author_set_flags_sql,
   "F21+F22: either-empty-zero author-set jaccard (ref author_overlap "
   "convention, feature_engineering_utils.py:120-133) and any-shared-LAST-"
   "name flag (ref :135-143) over two-token pseudo-authors built from the "
   "leading text tokens; doc_id % 7 == 0 rows get an EMPTY author set so "
   "the either-empty -> 0.0 rule is exercised on real pairs",
   driver=False)
def f21_f22_author_set_flags(spark, sf_dir):
    from .operators.features import any_shared_col, either_empty_jaccard_col

    toks = T(spark, sf_dir, "documents").select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("tk")
    )
    authors = toks.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
        ).otherwise(
            F.filter(
                F.array(
                    F.concat_ws(" ", F.get("tk", 0), F.get("tk", 1)),
                    F.concat_ws(" ", F.get("tk", 2), F.get("tk", 3)),
                ),
                lambda x: x != "",
            )
        ).alias("a"),
    )
    ln = authors.select(
        "doc_id",
        "a",
        F.transform("a", lambda x: F.element_at(F.split(x, " "), -1)).alias(
            "last_names"
        ),
    )
    l = ln.select(
        F.col("doc_id").alias("left_id"),
        F.col("a").alias("la"),
        F.col("last_names").alias("lln"),
    )
    r = ln.select(
        F.col("doc_id").alias("right_id"),
        F.col("a").alias("ra"),
        F.col("last_names").alias("rln"),
    )
    return l.join(r, l.left_id + 1 == r.right_id).select(
        "left_id",
        "right_id",
        either_empty_jaccard_col(F.col("la"), F.col("ra")).alias("author_overlap"),
        any_shared_col(F.col("lln"), F.col("rln")).alias("lastname_match"),
    )


q_d5_token_filter_sql = """
WITH built AS (
  SELECT doc_id, concat_ws(' ', 'the', text, 'of', 'x') AS t
  FROM documents
)
SELECT doc_id, len(f) AS n_kept, array_to_string(f, ' ') AS kept_text
FROM (
  SELECT doc_id,
         list_filter(
           list_filter(string_split(t, ' '), x -> x <> ''),
           tok -> tok IS NOT NULL AND length(tok) > 1
                  AND NOT list_contains(
                        ['a','an','the','and','of','in','for','on','to',
                         'with','by','at','from','as'], tok)
         ) AS f
  FROM built
)
"""


@q("d5_token_filter", q_d5_token_filter_sql,
   "D5/F10-F11: title-token post-processing — drop stopwords and single-"
   "char tokens (ref _filter_title_tokens, parse_util.py:257-261).  The "
   "built text injects 'the'/'of'/'x' so every row demonstrably drops "
   "tokens (453/500 sf0.01 docs also carry natural stopwords)",
   driver=False)
def d5_token_filter(spark, sf_dir):
    from .operators.assemble import token_filter_expr

    built = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(" ", F.lit("the"), "text", F.lit("of"), F.lit("x")).alias("t"),
    )
    toks = built.select(
        "doc_id", F.filter(F.split("t", " "), lambda x: x != "").alias("tk")
    )
    filt = toks.select("doc_id", token_filter_expr("tk").alias("f"))
    return filt.select(
        "doc_id",
        F.size("f").alias("n_kept"),
        F.concat_ws(" ", "f").alias("kept_text"),
    )


# =========================================================================
# Catalog batch 5: round-5 LLM-pipeline stages — PII scrub, repetition
# quality stats, benchmark decontamination.  All driver=False (the driver
# registry is capped at its curated 50); the suite applies the identical
# DuckDB parity gate.  PII regexes live in textstats.PII_PATTERNS and are
# inlined here verbatim — kept in the RE2-compatible subset so both engines
# run the byte-identical pattern.
# =========================================================================

q_text_pii_scrub_sql = r"""
WITH built AS (
  SELECT doc_id,
         concat_ws(' ', text, 'contact',
                   concat('u', CAST(doc_id AS VARCHAR), '@example.com'),
                   'ip', concat('10.0.0.', CAST(doc_id % 256 AS VARCHAR)),
                   'call', concat('+1-555-123-4',
                                  lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'))) AS t
  FROM documents
),
s1 AS (SELECT doc_id, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM built),
s2 AS (SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
         regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
  FROM s1),
s3 AS (SELECT doc_id, n_email, n_ip,
         len(regexp_extract_all(t2, '\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}')) AS n_phone,
         regexp_replace(t2, '\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}', '<PHONE>', 'g') AS text_scrubbed
  FROM s2)
SELECT doc_id, text_scrubbed, n_email, n_ip, n_phone FROM s3
"""


@q("text_pii_scrub", q_text_pii_scrub_sql,
   "PII redaction over every doc (email/IPv4/phone, typed placeholders, "
   "ordered so a span is counted+redacted exactly once); the corpus carries "
   "no PII so the built text injects one of each deterministically",
   driver=False)
def text_pii_scrub(spark, sf_dir):
    built = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            "text",
            F.lit("contact"),
            F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            F.lit("ip"),
            F.concat(F.lit("10.0.0."), (F.col("doc_id") % 256).cast("string")),
            F.lit("call"),
            F.concat(
                F.lit("+1-555-123-4"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            ),
        ).alias("t"),
    )
    return textstats.pii_scrub(built, text_col="t")


q_text_repetition_stats_sql = r"""
WITH built AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN text
                      ELSE concat(text, chr(10), text, chr(10), substr(text, 1, 40)) END AS t
  FROM documents
),
base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)), l -> l <> '') AS lines,
         list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS words
  FROM built
),
gr AS (
  SELECT doc_id, lines, words,
         CASE WHEN len(words) >= 3
              THEN [array_to_string(words[i:i+2], ' ') for i in generate_series(1, len(words)-2)]
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM base
),
scalar AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         CASE WHEN len(lines) > 0 THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines) ELSE 0.0 END AS dup_line_frac,
         CASE WHEN len(grams) > 0 THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)/len(grams) ELSE 0.0 END AS dup_ngram_frac,
         words
  FROM gr
),
wtbl AS (SELECT doc_id, unnest(words) AS w FROM scalar),
top AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS n_words
  FROM (SELECT doc_id, w, count(*) AS c FROM wtbl GROUP BY 1, 2) GROUP BY doc_id
)
SELECT s.doc_id, s.n_lines, s.dup_line_frac, s.dup_ngram_frac,
       COALESCE(t.n_words, 0) AS n_words,
       COALESCE(CAST(t.top_c AS DOUBLE)/t.n_words, 0.0) AS top_word_frac
FROM scalar s LEFT JOIN top t ON s.doc_id = t.doc_id
"""


@q("text_repetition_stats", q_text_repetition_stats_sql,
   "Gopher/C4-style repetition quality signals (dup-line fraction, dup "
   "word-3-gram fraction, top-word share); 2/3 of built docs get duplicated "
   "lines injected so every signal is exercised",
   driver=False)
def text_repetition_stats(spark, sf_dir):
    built = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .otherwise(
            F.concat(
                "text", F.lit("\n"), "text", F.lit("\n"), F.substring("text", 1, 40)
            )
        )
        .alias("t"),
    )
    return textstats.repetition_stats(built, text_col="t", ngram_n=3)


q_text_decontaminate_sql = r"""
WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
bench AS (SELECT text FROM documents WHERE doc_id % 50 = 0),
tg AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= 3 THEN [array_to_string(w[i:i+2], ' ') for i in generate_series(1, len(w)-2)]
         ELSE CAST([] AS VARCHAR[]) END)) AS g
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM train)
),
bg AS (
  SELECT DISTINCT unnest(list_distinct(
    CASE WHEN len(w) >= 3 THEN [array_to_string(w[i:i+2], ' ') for i in generate_series(1, len(w)-2)]
         ELSE CAST([] AS VARCHAR[]) END)) AS g
  FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM bench)
)
SELECT tg.doc_id, count(*) AS n_hits, min(tg.g) AS sample_ngram
FROM tg JOIN bg ON tg.g = bg.g GROUP BY tg.doc_id
"""


@q("text_decontaminate", q_text_decontaminate_sql,
   "Benchmark decontamination: train docs (doc_id%50<>0) sharing any word "
   "3-gram with the held-out slice (doc_id%50=0) — 257 contaminated docs at "
   "sf0.01; production default is the standard 13-gram rule, n=3 here so "
   "the witness is non-trivial on the small-vocabulary synthetic corpus",
   driver=False)
def text_decontaminate(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 50 == 0).select("text")
    return textstats.decontaminate(train, bench, n=3)


q_pack_sequences_sql = """
WITH base AS (
  SELECT doc_id, n_chars AS n_tokens,
         CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#7')), 1, 15)) AS BIGINT) % 8 AS shard,
         md5(concat(CAST(doc_id AS VARCHAR), '#rank7')) AS r
  FROM documents
),
win AS (
  SELECT doc_id, n_tokens, shard,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY r, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
)
SELECT doc_id, n_tokens, shard,
       cum - n_tokens AS start_offset,
       CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id,
       (n_tokens > 0 AND floor((cum - 1) / 2000.0) <> floor((cum - n_tokens) / 2000.0)) AS straddles,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE CAST(floor((cum - 1) / 2000.0) - floor((cum - n_tokens) / 2000.0) + 1 AS BIGINT)
       END AS n_packs_spanned
FROM win
"""


@q("pack_sequences", q_pack_sequences_sql,
   "Concat-and-chunk sequence packing (LLM training assembly): md5-sharded "
   "streams, per-shard window cumsum, pack = floor(start/budget) with a "
   "straddle flag; budget=2000 'tokens' (n_chars as the weight), 8 shards "
   "— every hash md5-derived so the packing is engine-exact",
   driver=False)
def pack_sequences_q(spark, sf_dir):
    from .operators.packing import pack_sequences

    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    return pack_sequences(docs, budget=2000, n_shards=8)


q_mix_sample_sql = """
WITH q(source, quota) AS (VALUES ('src1', 12), ('src6', 10), ('src18', 8)),
r AS (
  SELECT d.doc_id, d.source, q.quota,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY md5(concat(CAST(d.doc_id AS VARCHAR), '#mix11')), d.doc_id
         ) AS rn
  FROM documents d JOIN q USING (source)
)
SELECT doc_id, source FROM r WHERE rn <= quota
"""


@q("mix_sample", q_mix_sample_sql,
   "Domain-mix quota sampling: md5-ranked deterministic top-k per stratum "
   "with largest-remainder quotas ({src1: 0.4, src6: 0.35, src18: 0.25} of "
   "30 -> 12/10/8); the oracle inlines the same quotas the Python "
   "apportionment computes",
   driver=False)
def mix_sample_q(spark, sf_dir):
    from .operators.mixing import mix_sample

    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    return mix_sample(docs, {"src1": 0.4, "src6": 0.35, "src18": 0.25}, 30)


q_incremental_band_pairs_sql = _duck_minhash_cte(8, 4) + """
, banded_all AS (
  SELECT doc_id, 0 AS band_idx,
         md5(concat_ws('|', CAST(h0 AS VARCHAR), CAST(h1 AS VARCHAR))) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, 1, md5(concat_ws('|', CAST(h2 AS VARCHAR), CAST(h3 AS VARCHAR))) FROM sigs
  UNION ALL
  SELECT doc_id, 2, md5(concat_ws('|', CAST(h4 AS VARCHAR), CAST(h5 AS VARCHAR))) FROM sigs
  UNION ALL
  SELECT doc_id, 3, md5(concat_ws('|', CAST(h6 AS VARCHAR), CAST(h7 AS VARCHAR))) FROM sigs
),
new_keyed AS (
  SELECT doc_id, band_idx, band_key FROM banded_all WHERE doc_id % 5 = 0
  QUALIFY row_number() OVER (
    PARTITION BY band_idx, band_key
    ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '#23120334')), doc_id
  ) <= 1000
),
corp_keyed AS (
  SELECT doc_id, band_idx, band_key FROM banded_all WHERE doc_id % 5 <> 0
  QUALIFY row_number() OVER (
    PARTITION BY band_idx, band_key
    ORDER BY md5(concat(CAST(doc_id AS VARCHAR), '#23120334')), doc_id
  ) <= 1000
)
SELECT DISTINCT n.doc_id AS left_id, c.doc_id AS right_id
FROM new_keyed n JOIN corp_keyed c
  ON n.band_idx = c.band_idx AND n.band_key = c.band_key
WHERE n.doc_id <> c.doc_id
"""


@q("dedup_incremental_band_pairs", q_incremental_band_pairs_sql,
   "Incremental dedup: the doc_id%5==0 slice plays the NEW batch, banded and "
   "joined against the persisted minhash_band_index of the remaining corpus "
   "(never re-shingled); both sides band-capped with the shared md5 rank",
   driver=False)
def dedup_incremental_band_pairs(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    corpus_sigs = dedup.minhash_signatures(
        docs.where(F.col("doc_id") % 5 != 0), n_hashes=8, shingle_n=4
    )
    index = dedup.minhash_band_index(corpus_sigs, n_hashes=8, bands=4)
    new_sigs = dedup.minhash_signatures(
        docs.where(F.col("doc_id") % 5 == 0), n_hashes=8, shingle_n=4
    )
    return dedup.incremental_band_pairs(new_sigs, index, n_hashes=8, bands=4)


# =========================================================================
# Catalog batch 6: gap-based sessionization over the events stream
# (operators/sessions.py; streaming analogue in streaming/live_stats.py).
# driver=False (driver registry capped at its curated 50); the suite runs
# the identical DuckDB parity gate.
# =========================================================================

q_sess_assign_sql = """
WITH b AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts,
       CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx,
       concat(CAST(user_id AS VARCHAR), '#',
              CAST(CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS VARCHAR)) AS session_id
FROM b
"""


@q("sess_gap_assign", q_sess_assign_sql,
   "Gap-based sessionization of the events stream: per-user lag window, "
   "boundary when the pause exceeds 6h (strictly), running-sum session "
   "index — one hash shuffle on user_id, no global sort",
   driver=False)
def sess_gap_assign(spark, sf_dir):
    from .operators.sessions import sessionize

    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sessionize(
        ev, key_col="user_id", ts_col="ts", gap_seconds=21600,
        tiebreak_cols=("event_id",),
    )


q_sess_stats_sql = """
WITH b AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM b
)
SELECT user_id,
       concat(CAST(user_id AS VARCHAR), '#', CAST(session_idx AS VARCHAR)) AS session_id,
       session_idx,
       count(*) AS n_events,
       min(ts) AS started_at,
       max(ts) AS ended_at,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_sec
FROM s
GROUP BY user_id, session_idx
"""


@q("sess_session_stats", q_sess_stats_sql,
   "Per-session rollup of the sessionized events (bounds, count, duration): "
   "map-side-combinable groupBy on the session key",
   driver=False)
def sess_session_stats(spark, sf_dir):
    from .operators.sessions import session_stats, sessionize

    ev = T(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sess = sessionize(
        ev, key_col="user_id", ts_col="ts", gap_seconds=21600,
        tiebreak_cols=("event_id",),
    )
    return session_stats(sess)


# NULL-ts parity witness (round-5 verdict #6): deterministically NULL out a
# slice of timestamps, then sessionize.  Spark's ASC default is NULLS FIRST;
# DuckDB's is NULLS LAST, so the oracle window spells NULLS FIRST explicitly
# — this converts the previously documented engine difference into a parity
# gate: every NULL-ts row sessions alone, ordered first within its key.
q_sess_null_ts_sql = """
WITH ev AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 97 = 0 THEN NULL ELSE ts END AS ts
  FROM events
),
b AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS boundary
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id)
)
SELECT event_id, user_id, ts,
       CAST(sum(boundary) OVER (PARTITION BY user_id
                                ORDER BY ts ASC NULLS FIRST, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx,
       concat(CAST(user_id AS VARCHAR), '#',
              CAST(CAST(sum(boundary) OVER (PARTITION BY user_id
                                            ORDER BY ts ASC NULLS FIRST, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS VARCHAR)) AS session_id
FROM b
"""


@q("sess_gap_assign_null_ts", q_sess_null_ts_sql,
   "Sessionization with NULL timestamps present (event_id%97==0 slice nulled): "
   "each NULL-ts row sessions alone and orders first within its key — the "
   "NULLS FIRST oracle pins the engine's NULL ordering",
   driver=False)
def sess_gap_assign_null_ts(spark, sf_dir):
    from .operators.sessions import sessionize

    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 97 == 0, F.lit(None)).otherwise(F.col("ts")).alias("ts"),
    )
    return sessionize(
        ev, key_col="user_id", ts_col="ts", gap_seconds=21600,
        tiebreak_cols=("event_id",),
    )


q_c4_line_filter_sql = r"""
WITH built AS (
  SELECT doc_id,
         concat(text, chr(10),
                concat('Document ', CAST(doc_id AS VARCHAR),
                       ' stays perfectly readable today.'), chr(10),
                'Enable javascript to view this page.', chr(10),
                'Click here to continue reading', chr(10),
                'config { verbose: true }.', chr(10),
                'Too short.') AS t
  FROM documents
),
lined AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
                     l -> l <> '') AS lines
  FROM built
),
kept AS (
  SELECT doc_id, lines,
         list_filter(lines, l ->
             len(list_filter(string_split_regex(l, '\s+'), w -> w <> '')) >= 3
             AND NOT contains(lower(l), 'javascript')
             AND NOT contains(lower(l), 'lorem ipsum')
             AND NOT contains(lower(l), '{')
             AND regexp_matches(l, '[.!?]["'')\]]?$')) AS keep
  FROM lined
)
SELECT k.doc_id,
       array_to_string(k.keep, chr(10)) AS text_clean,
       len(k.keep) AS n_lines_kept,
       len(k.lines) - len(k.keep) AS n_lines_dropped,
       contains(lower(b.t), '{') AS doc_drop_curly,
       contains(lower(b.t), 'lorem ipsum') AS doc_drop_lorem
FROM kept k JOIN built b ON k.doc_id = b.doc_id
"""


@q("text_c4_line_filter", q_c4_line_filter_sql,
   "C4-style boilerplate line filter (>=3 words, no javascript/lorem "
   "ipsum/brace, terminal punctuation); the built text injects one line per "
   "drop rule plus a keeper so every predicate fires on every doc",
   driver=False)
def text_c4_line_filter(spark, sf_dir):
    built = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit("\n"),
            F.concat(F.lit("Document "), F.col("doc_id").cast("string"),
                     F.lit(" stays perfectly readable today.")), F.lit("\n"),
            F.lit("Enable javascript to view this page."), F.lit("\n"),
            F.lit("Click here to continue reading"), F.lit("\n"),
            F.lit("config { verbose: true }."), F.lit("\n"),
            F.lit("Too short."),
        ).alias("t"),
    )
    return textstats.c4_line_filter(built, text_col="t")


# -------------------------------------------------------------------------
# Cross-corpus duplicate spans (Lee et al. 2022 exact-substring dedup)
# -------------------------------------------------------------------------
# Shared CTE chain: 5-token windows at stride 1, md5-hashed (identical hex
# in both engines), duplicated windows flagged with the globally FIRST
# occurrence (ordered by doc_id, start) exempted — keep_first policy —
# then gaps-and-islands merges flagged windows into maximal spans.
_DUP_SPAN_CTES = """
tok AS (
  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks FROM documents
),
win AS (
  SELECT doc_id, toks,
         CAST(unnest(range(1, greatest(len(toks) - 5, 0) + 2)) AS INT) AS start
  FROM tok WHERE len(toks) >= 5
),
hw AS (
  SELECT doc_id, start,
         md5(array_to_string(toks[start:start+4], ' ')) AS h
  FROM win
),
hw2 AS (
  SELECT doc_id, start,
         COUNT(*) OVER (PARTITION BY h) AS n_occ,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
  FROM hw
),
flagged AS (
  SELECT doc_id, start, start + 4 AS fin FROM hw2 WHERE n_occ >= 2 AND rn > 1
),
isl AS (
  SELECT doc_id, start, fin,
         CASE WHEN start > COALESCE(MAX(fin) OVER (
                  PARTITION BY doc_id ORDER BY start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM flagged
),
isl2 AS (
  SELECT doc_id, start, fin,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, MIN(start) AS span_start, MAX(fin) AS span_end,
         COUNT(*) AS n_windows
  FROM isl2 GROUP BY doc_id, island
)
"""

q_duplicate_spans_sql = f"""
WITH {_DUP_SPAN_CTES}
SELECT doc_id, span_start, span_end, n_windows FROM spans
"""


@q("text_duplicate_spans", q_duplicate_spans_sql,
   "cross-corpus duplicate token-window spans (Lee et al. 2022 "
   "exact-substring dedup, keep-first policy): 5-token md5 windows, "
   "corpus-wide occurrence count, gaps-and-islands span merge; w=5 chosen "
   "so the 31-word synthetic vocabulary witnesses ~1.1k duplicated windows "
   "non-degenerately", driver=False)
def text_duplicate_spans(spark, sf_dir):
    return dedup.duplicate_window_spans(
        T(spark, sf_dir, "documents"), window_tokens=5
    )


q_strip_duplicate_spans_sql = f"""
WITH {_DUP_SPAN_CTES},
tok_i AS (
  SELECT doc_id, unnest(toks) AS t,
         CAST(unnest(range(1, len(toks) + 1)) AS INT) AS i
  FROM tok
),
kept AS (
  SELECT ti.doc_id, ti.t, ti.i FROM tok_i ti
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = ti.doc_id
                      AND ti.i BETWEEN s.span_start AND s.span_end)
),
clean AS (
  SELECT doc_id, COALESCE(string_agg(t, ' ' ORDER BY i), '') AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(c.text, '') AS text, d.lang, d.source, d.n_chars,
       len(regexp_split_to_array(d.text, '\\s+')) - COALESCE(c.n_kept, 0)
           AS n_tokens_removed
FROM documents d LEFT JOIN clean c USING (doc_id)
"""


@q("text_strip_duplicate_spans", q_strip_duplicate_spans_sql,
   "span-stripped corpus: every repeated 5-token window's non-first "
   "occurrence removed (tokens re-joined with single spaces); documents "
   "with no spans pass through with n_tokens_removed=0", driver=False)
def text_strip_duplicate_spans(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    spans = dedup.duplicate_window_spans(docs, window_tokens=5)
    return dedup.strip_duplicate_spans(docs, spans)
