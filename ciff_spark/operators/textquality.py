"""Text-analysis operators over ``documents``: quality scoring, heuristic
language-ID, token counting, document fingerprinting. All JVM built-ins
(regex/length/arithmetic) — no Python in the row path — with DuckDB oracle
twins built from the same pinned fragments."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ciff_spark.functions.tokenizer import TOKEN_PATTERN, tokenize_expr, tokenize_sql
from ciff_spark.sources.testdata import load

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# tiny per-language marker lists for the n-gram/stopword heuristic language ID
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "et", "de"),
}
_LANG_ORDER = ("en", "de", "es", "fr")  # deterministic tie-break order


def _in_list_ratio_col(words: tuple[str, ...]):
    toks = tokenize_expr("text")
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def _in_list_ratio_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"round(len(list_filter({tokenize_sql('text')}, t -> t IN ({lst}))) * 1.0 / "
        f"greatest(len({tokenize_sql('text')}), 1), 6)"
    )


# ---------------------------------------------------------------------------
# quality score
# ---------------------------------------------------------------------------

def tq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = tokenize_expr("text")
    return docs.select(
        F.col("doc_id"),
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("alnum_ratio"),
        F.round(
            F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", ""))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("mean_token_len"),
        _in_list_ratio_col(STOPWORDS).alias("stopword_ratio"),
    )


TQ_QUALITY_SQL = f"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len({tokenize_sql('text')})::BIGINT AS n_tokens,
       round(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) * 1.0 /
             greatest(length(text), 1), 6) AS alnum_ratio,
       round(length(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) * 1.0 /
             greatest(len({tokenize_sql('text')}), 1), 6) AS mean_token_len,
       {_in_list_ratio_sql(STOPWORDS)} AS stopword_ratio
FROM documents
"""


# ---------------------------------------------------------------------------
# heuristic language ID (marker-word ratios, deterministic tie-break)
# ---------------------------------------------------------------------------

def tq_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        *[_in_list_ratio_col(LANG_MARKERS[lg]).alias(f"s_{lg}") for lg in _LANG_ORDER],
    )
    # first language (in _LANG_ORDER) achieving the max wins — pinned tie-break
    cases = "CASE "
    for lg in _LANG_ORDER:
        others = [f"s_{o}" for o in _LANG_ORDER if o != lg]
        cases += f"WHEN s_{lg} >= greatest({', '.join(others)}) AND s_{lg} > 0 THEN '{lg}' "
    cases += "ELSE 'und' END"
    return scored.withColumn("pred_lang", F.expr(cases)).select(
        "doc_id", "lang", "pred_lang", "s_en", "s_de", "s_es", "s_fr"
    )


def _langid_sql() -> str:
    score_cols = ", ".join(
        f"{_in_list_ratio_sql(LANG_MARKERS[lg])} AS s_{lg}" for lg in _LANG_ORDER
    )
    cases = "CASE "
    for lg in _LANG_ORDER:
        others = ", ".join(f"s_{o}" for o in _LANG_ORDER if o != lg)
        cases += f"WHEN s_{lg} >= greatest({others}) AND s_{lg} > 0 THEN '{lg}' "
    cases += "ELSE 'und' END"
    return f"""
WITH scored AS (SELECT doc_id, lang, {score_cols} FROM documents)
SELECT doc_id, lang, {cases} AS pred_lang, s_en, s_de, s_es, s_fr FROM scored
"""


# ---------------------------------------------------------------------------
# token counting: regex tokens, whitespace tokens, BPE-ish estimate
# ---------------------------------------------------------------------------

def tq_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokenize_expr("text")).alias("n_regex_tokens"),
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("n_ws_tokens"),
        F.ceil(F.length("text") / F.lit(4)).cast("long").alias("est_bpe_tokens"),
    )


TQ_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len({tokenize_sql('text')})::BIGINT AS n_regex_tokens,
       len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------------------------
# fingerprint: md5 of whitespace-normalized lowercase text
# ---------------------------------------------------------------------------

def tq_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), "\\s+", " ")).alias("fingerprint"),
    )


TQ_FINGERPRINT_SQL = (
    "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint "
    "FROM documents"
)


QUERIES: dict[str, tuple] = {
    "tq_quality": (tq_quality, TQ_QUALITY_SQL),
    "tq_langid": (tq_langid, _langid_sql()),
    "tq_token_count": (tq_token_count, TQ_TOKEN_COUNT_SQL),
    "tq_fingerprint": (tq_fingerprint, TQ_FINGERPRINT_SQL),
}
