"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2.9 extension surface; BASELINE.json north-star).

All pure JVM-side column expressions (codegen'd, no UDFs): token counting,
quality scoring, stopword-based language ID, document fingerprinting. Each
has an exact ANSI twin used by the DuckDB oracles in ``plans.extensions``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the heuristic language identifier.
#: Frozen so oracle SQL can embed them literally.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "ein", "ist", "nicht", "mit"),
    "es": ("el", "la", "los", "y", "de", "un", "una", "es"),
}

#: Deterministic preference order for argmax ties.
LANG_ORDER: tuple[str, ...] = ("en", "fr", "de", "es")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (documents table text is pre-normalized lowercase)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def distinct_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / tokens — a standard quality signal
    (boilerplate and spam skew low)."""
    toks = tokens_col(text)
    return F.round(
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
    )


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    lex = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col(text), lambda t: F.array_contains(lex, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword density — classic fluency/quality heuristic (C4-style corpus
    filters keep docs with healthy stopword ratios)."""
    return F.round(
        stopword_hits(text, STOPWORDS[lang]).cast("double") / token_count(text), 6
    )


def lang_id(text: Column) -> Column:
    """Argmax-stopword-hits language guess, deterministic tie order
    en > fr > de > es."""
    hits = {lang: stopword_hits(text, STOPWORDS[lang]) for lang in LANG_ORDER}
    expr = F.lit(LANG_ORDER[-1])
    # Build the when-chain back to front so earlier languages win ties.
    for i in range(len(LANG_ORDER) - 2, -1, -1):
        lang = LANG_ORDER[i]
        cond = None
        for other in LANG_ORDER[i + 1 :]:
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column, n_tokens: int = 2) -> Column:
    """Prefix-token document fingerprint: md5 of the first ``n_tokens``
    whitespace tokens. A cheap rolling-hash stand-in for near-dup blocking;
    identical in DuckDB (md5 + list_slice + array_to_string)."""
    prefix = F.concat_ws(" ", F.slice(tokens_col(text), 1, n_tokens))
    return F.md5(prefix)
