"""Text analysis operators for training-data pipelines.

Language ID (char-class n-gram heuristic), quality scoring, token
counting, and document fingerprinting — all as pure column expressions
(regexp + array ops, whole-stage codegen), no UDFs. Each is reproducible
in ANSI SQL, so the driver's DuckDB oracle checks values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")

_CJK = "[一-龥]"
_LATIN = "[A-Za-z]"
_IDENT = "[A-Za-z_][A-Za-z0-9_]*"
_NUM = "[0-9]+"
_SUBWORD = "[A-Za-z]{1,4}"  # BPE-ish greedy <=4-letter chunks


def _count_matches(col: F.Column, pattern: str) -> F.Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def lang_id(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_cjk, n_latin, lang_guess) — char-class frequency heuristic."""
    n_cjk = _count_matches(F.col(text_col), _CJK)
    n_latin = _count_matches(F.col(text_col), _LATIN)
    guess = (
        F.when(n_cjk > n_latin, F.lit("cjk"))
        .when(n_latin > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )
    return documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_cjk.cast("long").alias("n_cjk"),
        n_latin.cast("long").alias("n_latin"),
        guess.alias("lang_guess"),
    )


def quality_score(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_words, avg_word_len, stop_ratio, quality).

    quality = ln(1+n_words) · (1 − stop_ratio) — a simple monotone score
    rewarding length and penalizing stopword density; rounded to 6 dp.
    """
    ws = F.split(F.col(text_col), " ")
    n_words = F.size(ws).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    stops = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS))).cast("double")
    stop_ratio = stops / n_words.cast("double")
    avg_wl = (n_chars - (n_words - 1)).cast("double") / n_words.cast("double")
    quality = F.log(F.lit(1.0) + n_words.cast("double")) * (F.lit(1.0) - stop_ratio)
    return documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(avg_wl, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ws_tokens, n_idents, n_numbers, n_subwords)."""
    ws = F.split(F.col(text_col), " ")
    return documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.filter(ws, lambda w: w != "")).cast("long").alias("n_ws_tokens"),
        _count_matches(F.col(text_col), _IDENT).cast("long").alias("n_idents"),
        _count_matches(F.col(text_col), _NUM).cast("long").alias("n_numbers"),
        _count_matches(F.col(text_col), _SUBWORD).cast("long").alias("n_subwords"),
    )


def fingerprint(
    documents: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fingerprint) — MinHash(k=1) over word n-gram shingles:
    the lexicographic min of md5(shingle). Docs with < n words fall back
    to md5 of the whole text."""
    from .dedup import word_shingles

    sh = word_shingles(documents, n=n, text_col=text_col, id_col=id_col)
    fp = sh.groupBy("doc_id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))
    base = documents.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("_fallback"),
    )
    return base.join(fp, "doc_id", "left").select(
        "doc_id", F.coalesce("fingerprint", "_fallback").alias("fingerprint")
    )
