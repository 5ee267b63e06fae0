"""Text analysis operators for a training-data pipeline.

Language-ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting — all JVM-side built-in expressions (no UDFs), so
they run inside whole-stage codegen over a 100 TB corpus with only the final
aggregations shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._spread import spread

import string

# every char Java's default \s or [A-Za-z0-9] matches — the delete set for
# the translate()-based "other char" counts
_ALNUM_WS = string.ascii_letters + string.digits + " \t\n\x0b\f\r"

# Tiny public stopword marker sets per language (deterministic heuristic —
# the point is the operator shape, not linguistic accuracy).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    ``n_tokens``: non-empty whitespace-separated tokens.
    ``n_subwords``: alnum runs + punctuation marks — a cheap proxy for BPE
    token count that needs no vocabulary.

    Counting never materializes a token ARRAY: a non-empty whitespace token
    IS a maximal ``\\S+`` run and an alnum run IS a ``[A-Za-z0-9]+`` match
    (``regexp_count``), and the punctuation-mark count is
    ``length(translate(text, <alnum+ws>, ''))`` — a per-char table lookup.
    The single-char-class regex forms were measured an order of magnitude
    slower here (one regex match per character); Java's default ``\\s`` is
    exactly the six chars enumerated in ``_ALNUM_WS``, so the translate
    count equals the old ``regexp_replace('[A-Za-z0-9\\s]', '')`` length
    char for char (asserted by the unchanged oracle).
    """
    t = F.col(text_col)
    subwords = F.regexp_count(t, F.lit(r"[A-Za-z0-9]+")) + F.length(
        F.translate(t, _ALNUM_WS, "")
    )
    # spread before the per-row regex work: a small single-file (single
    # row-group) scan otherwise pins the whole count to one task; no-op at
    # real scale (see _spread)
    return spread(df).select(
        id_col,
        F.regexp_count(t, F.lit(r"\S+")).cast("long").alias("n_tokens"),
        subwords.cast("long").alias("n_subwords"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document quality: length, word stats, symbol/stopword ratios.

    The standard pre-training filters (C4/Gopher-style): mean word length,
    alpha ratio, punctuation density, stopword presence — combined into one
    [0,1] score.  All ratios rounded to 6 dp so the score is reproducible
    bit-for-bit across engines.
    """
    t = F.col(text_col)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != F.lit(""))
    n_words = F.size(words)
    n_chars = F.length(t)
    # member-char counts via translate() delete (per-char table lookup)
    # instead of regex: length - length(text minus those chars)
    alpha_chars = n_chars - F.length(F.translate(t, string.ascii_letters, ""))
    punct_chars = n_chars - F.length(F.translate(t, ".,;:!?", "")) + F.lit(0)
    stop_hits = F.size(
        F.filter(
            words,
            lambda x: x.isin([w for ws in LANG_MARKERS.values() for w in ws]),
        )
    )
    mean_word_len = F.round(n_chars.cast("double") / F.greatest(n_words, F.lit(1)), 6)
    alpha_ratio = F.round(
        alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 6
    )
    punct_ratio = F.round(
        punct_chars.cast("double") / F.greatest(n_chars, F.lit(1)), 6
    )
    stop_ratio = F.round(
        stop_hits.cast("double") / F.greatest(n_words, F.lit(1)), 6
    )
    # simple convex score: long-enough, alphabetic, not punctuation-soup
    score = F.round(
        F.least(n_words.cast("double") / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
        + alpha_ratio * F.lit(0.4)
        + F.greatest(F.lit(1.0) - punct_ratio * F.lit(10.0), F.lit(0.0)) * F.lit(0.2),
        6,
    )
    return spread(df).select(
        id_col,
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def lang_guess(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-vote language guess with deterministic tie-break.

    Counts marker-word hits per language; the guess is the language with the
    most hits, ties broken by language code ascending, zero hits → 'und'.
    """
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )

    def _hits(markers: list[str]):
        # NB: the filter lambda must take exactly one arg — pyspark treats a
        # two-arg lambda as (element, index)
        return F.size(F.filter(words, lambda x: x.isin(markers)))

    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hit_cols.append(
            F.struct(_hits(markers).alias("hits"), F.lit(lang).alias("lang"))
        )
    # max by (hits desc, lang asc): sort the struct array and take the best
    best = F.array_sort(
        F.array(*hit_cols),
        lambda a, b: F.when(a["hits"] > b["hits"], -1)
        .when(a["hits"] < b["hits"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    guess = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return spread(df).select(
        id_col, guess.alias("lang_guess"), best["hits"].cast("long").alias("hits")
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    (portable across engines) plus a 64-bit xxhash for cheap joins."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return spread(df).select(
        id_col,
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )
