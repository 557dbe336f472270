"""Text-analysis column functions for LLM-data-pipeline processing.

All pure Spark SQL expressions (JVM codegen, no Python UDFs), each with
an exactly-equivalent ANSI/DuckDB formulation used by the correctness
oracle. Token model: lowercase, split on single spaces, drop empties —
deliberately simple so both engines agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small English stopword list (deterministic, embedded so the oracle
# can inline the same set).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "be", "with", "as", "at", "by", "it", "this",
]


def tokens(text: Column | str) -> Column:
    """Non-empty whitespace tokens of the lowercased text."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(text), " "), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.length(text)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowering."""
    text = F.col(text) if isinstance(text, str) else text
    low = F.lower(text)
    stripped = F.regexp_replace(low, "[a-z0-9 ]", "")
    return F.when(F.length(low) > 0,
                  F.length(stripped) / F.length(low)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0),
                        lambda acc, x: acc + x)
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length,
    low punctuation noise, presence (but not dominance) of stopwords.

    score = 0.4·min(1, n_tokens/100) + 0.3·(1 − punct_ratio)
          + 0.3·(1 − |stopword_ratio − 0.4|)
    """
    t = F.least(F.lit(1.0), token_count(text).cast("double") / F.lit(100.0))
    p = F.lit(1.0) - punct_ratio(text)
    s = F.lit(1.0) - F.abs(stopword_ratio(text) - F.lit(0.4))
    return F.lit(0.4) * t + F.lit(0.3) * p + F.lit(0.3) * s


def lang_id_en_score(text: Column | str) -> Column:
    """N-gram-free language-ID heuristic: stopword hit-rate as an
    English likelihood proxy (the real corpus carries a `lang` column;
    this scores agreement with it)."""
    return stopword_ratio(text)


# Char-bigram profiles (public frequency lists) for the n-gram lang-ID
# heuristic. Tiny on purpose: they live as plan literals on every
# executor — no lookup table, no shuffle.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "er", "te", "qu"],
    "es": ["de", "la", "os", "en", "es", "ar", "el", "ra", "as", "ci"],
    "de": ["er", "en", "ch", "de", "ei", "te", "ie", "ge", "un", "sc"],
    "zh": ["zh", "ng", "sh", "xi", "ia", "uo", "ua", "ao", "ji", "qi"],
}
LANGS = list(LANG_PROFILES)


def char_bigrams(text: Column | str) -> Column:
    """All character bigrams of the lowercased text, in order."""
    text = F.col(text) if isinstance(text, str) else text
    low = F.lower(text)
    return F.when(
        F.length(low) >= 2,
        F.transform(F.sequence(F.lit(1), F.length(low) - 1),
                    lambda i: low.substr(i, F.lit(2))),
    ).otherwise(F.array().cast("array<string>"))


def lang_score_of(bigrams: Column, lang: str) -> Column:
    """Fraction of the given bigram array found in `lang`'s profile.
    Take a PRECOMPUTED bigram column — recomputing the transform per
    language multiplies the row cost by |LANGS| (it showed up as the
    slowest bench query before this split)."""
    prof = F.array(*[F.lit(b) for b in LANG_PROFILES[lang]])
    hits = F.size(F.filter(bigrams, lambda x: F.array_contains(prof, x)))
    return F.when(F.size(bigrams) > 0,
                  hits.cast("double") / F.size(bigrams)).otherwise(F.lit(0.0))


def lang_score(text: Column | str, lang: str) -> Column:
    """Convenience over `lang_score_of` (single-language use)."""
    return lang_score_of(char_bigrams(text), lang)


def lang_scores_text(text: Column | str) -> Column:
    """All |LANGS| profile scores straight from the text, no bigram
    array: occurrences of profile bigram `b` among the text's
    overlapping char bigrams = (len − len(replace(text, b, '')))/2,
    valid because every profile bigram has two DISTINCT characters (so
    overlapping occurrences cannot share a character and the
    non-overlapping replace count is exact). Identical values to
    `lang_score_of` over `char_bigrams`, at ~string-scan cost."""
    text = F.col(text) if isinstance(text, str) else text
    low = F.lower(text)
    n_bg = F.length(low) - 1
    scores = []
    for g in LANGS:
        prof = LANG_PROFILES[g]
        assert all(b[0] != b[1] for b in prof), g
        removed = sum(
            (F.length(low) - F.length(F.replace(low, F.lit(b)))) for b in prof
        )
        scores.append(
            F.when(n_bg > 0,
                   (removed / F.lit(2)).cast("double") / n_bg)
            .otherwise(F.lit(0.0)))
    return F.array(*scores)


def lang_predict_of(bigrams: Column) -> Column:
    """argmax-profile language from a precomputed bigram column,
    first-wins on ties in LANGS order."""
    scores = F.array(*[lang_score_of(bigrams, g) for g in LANGS])
    best = F.array_max(scores)
    idx = F.array_position(scores, best)
    return F.element_at(F.array(*[F.lit(g) for g in LANGS]), idx.cast("int"))


def lang_predict(text: Column | str) -> Column:
    """Convenience over `lang_predict_of`."""
    return lang_predict_of(char_bigrams(text))


def word_ngrams(text: Column | str, n: int) -> Column:
    """Word n-gram shingles joined by single spaces."""
    toks = tokens(text)
    k = F.size(toks) - F.lit(n - 1)
    return F.when(k > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def portable_hash60(c: Column | str) -> Column:
    """Deterministic 60-bit string hash identical across Spark and
    DuckDB: first 15 hex chars of md5, parsed base-16.

    DuckDB equivalent:
      list_reduce(list_transform(regexp_split_to_array(
        substr(md5(s),1,15), ''), c -> strpos('0123456789abcdef', c)-1),
        (a,b) -> a*16+b)
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def content_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: 60-bit hash of the normalized token stream
    (whitespace-canonicalized content hash for exact dedup)."""
    return portable_hash60(F.concat_ws(" ", tokens(text)))
