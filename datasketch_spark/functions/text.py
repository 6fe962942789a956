"""Training-data text analysis ops — all native Spark SQL expressions
(JVM-side, whole-stage codegen; no Python in the hot path).

These are the large-scale-pipeline additions on top of the reference's
sketch operators (SURVEY.md 2.4 context): token counting, quality scoring,
language-ID heuristic, document fingerprinting. Each has an exact ANSI-SQL
twin in __spark_entry__.oracle_sql for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language stopword marker lists for the n-gram/stopword language-ID
# heuristic. Deterministic, tiny, and mirrored verbatim in the SQL oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "en", "por", "como"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]  # deterministic tie-break order


def words_col(text: Column | str) -> Column:
    """Whitespace tokenization (regex split, trimmed). Empty text -> []."""
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != F.lit(""))


def token_count_col(text: Column | str) -> Column:
    return F.size(words_col(text))


def distinct_words_col(text: Column | str) -> Column:
    return F.array_distinct(words_col(text))


def punct_count_col(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(r"\p{Punct}"))


def quality_features(text_col: str = "text") -> list[Column]:
    """Length / punctuation / stopword-ratio quality signals, rounded for
    cross-engine comparison."""
    words = words_col(text_col)
    n_tokens = F.size(words)
    n_chars = F.length(F.col(text_col))
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(words), F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]]))
    )
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0), 4
        ).alias("chars_per_token"),
        F.round(
            F.when(
                n_chars > 0, punct_count_col(text_col).cast("double") / n_chars
            ).otherwise(0.0),
            4,
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tokens > 0, stop_hits.cast("double") / 10.0).otherwise(0.0), 4
        ).alias("stopword_coverage"),
    ]


def langid_col(text_col: str = "text") -> Column:
    """Stopword-marker language ID: argmax of per-language distinct-stopword
    hits, ties broken by LANG_PRIORITY order, no hits -> 'und'."""
    words = F.array_distinct(words_col(text_col))
    scores = {
        lang: F.size(
            F.array_intersect(words, F.array(*[F.lit(w) for w in sw]))
        )
        for lang, sw in LANG_STOPWORDS.items()
    }
    best = None
    for lang in reversed(LANG_PRIORITY):
        s = scores[lang]
        if best is None:
            best = F.when(s > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            higher = [scores[o] for o in LANG_PRIORITY[: LANG_PRIORITY.index(lang)]]
            cond = (s > 0)
            for h in higher:
                cond = cond & (s > h)
            later = LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1 :]
            for o in later:
                cond = cond & (s >= scores[o])
            best = F.when(cond, F.lit(lang)).otherwise(best)
    return best


def fingerprint_col(text_col: str = "text") -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    return F.md5(
        F.array_join(words_col(F.lower(F.col(text_col))), " ")
    )


def char_ngrams_col(text: Column | str, n: int = 3) -> Column:
    """All character n-grams as an array (for n-gram Jaccard)."""
    t = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(t, i, n))
