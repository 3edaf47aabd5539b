"""Text analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex pieces), and
document fingerprinting (shingle rolling hash).  All native column
expressions — these run over every document at corpus scale, so they must
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword seeds for the n-gram/stopword-hit heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para", "que", "en"],
}


def _hits(tokens_col: F.Column, words: list[str]) -> F.Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(tokens_col, arr))


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Best-stopword-hit language guess; 'und' (undetermined) when no hits."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    df = docs.select(F.col(id_col), toks.alias("_toks"))
    hit_cols = [
        _hits(F.col("_toks"), words).alias(f"hits_{lang}")
        for lang, words in _LANG_STOPWORDS.items()
    ]
    df = df.select(id_col, *hit_cols)
    langs = list(_LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{la}") for la in langs])
    guess = F.lit("und")
    # first language achieving the max wins (deterministic order)
    for la in reversed(langs):
        guess = F.when(
            (F.col(f"hits_{la}") == best) & (best > 0), F.lit(la)
        ).otherwise(guess)
    return df.select(id_col, *[f"hits_{la}" for la in langs], guess.alias("lang_guess"))


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a [0,1] composite score."""
    text = F.col(text_col)
    n_chars = F.length(text)
    tokens = F.split(text, r"\s+")
    n_tokens = F.size(tokens)
    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_arr = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(tokens), stop_arr))
    stop_ratio = F.when(n_tokens > 0, stop_hits / F.least(n_tokens, F.lit(10))).otherwise(0.0)
    composite = F.round(
        F.least(
            F.lit(1.0),
            0.4 * alpha_ratio
            + 0.3 * F.least(F.lit(1.0), stop_ratio)
            + 0.2 * F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 1.0).otherwise(0.0)
            + 0.1 * F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0),
        ),
        6,
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        composite.alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens and BPE-ish piece count (word chunks + punctuation
    pieces + digit runs — a cheap proxy for subword token budgeting)."""
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    pieces = F.size(
        F.expr(
            rf"regexp_extract_all({text_col}, '[A-Za-z]{{1,4}}|[0-9]{{1,3}}|[^A-Za-z0-9\\s]', 0)"
        )
    )
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        pieces.alias("bpe_pieces"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min-k md5 hashes of 8-gram
    shingles, concatenated — stable content signature for clustering."""
    from .blocking import shingle_expr

    sh = shingle_expr(text_col, 8)
    # md5-derived 60-bit ints: identical in DuckDB (engine-portable oracle)
    hashed = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    )
    mink = F.slice(F.array_sort(hashed), 1, k)
    return docs.select(
        F.col(id_col),
        F.md5(F.concat_ws(",", F.transform(mink, lambda x: x.cast("string")))).alias(
            "fingerprint"
        ),
    )
