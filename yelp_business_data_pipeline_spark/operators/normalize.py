"""Unicode text normalization (SURVEY.md §2.9 — corpus-cleaning stage; no
reference counterpart, first-class LLM-pipeline surface).

Web-scraped corpora mix composed/decomposed Unicode forms, fullwidth
variants, zero-width characters and control bytes; dedup and tokenization
both need one canonical form first (fingerprints of "café" in NFC vs NFD
differ byte-wise while rendering identically). Stages, cheapest-first:

- :func:`clean_control_chars` — pure JVM ``regexp_replace`` (codegen'd, no
  UDF): strips C0/C1 controls (except tab/newline), zero-width characters
  and BOMs, collapses whitespace runs. Runs first so the Python stage sees
  less garbage — and it is the only stage most ASCII corpora need.
- :func:`normalize_unicode` — NFC/NFKC via a scalar ``pandas_udf``
  (`unicodedata` is C-accelerated CPython; Arrow batches in/out, no
  row-at-a-time pickling). Spark has no JVM normalizer builtin, so this is
  the sanctioned Pandas-UDF case: a transform the builtins genuinely
  cannot express.
- :func:`fold_accents` — NFKD + combining-mark strip (búsqueda→busqueda),
  the standard matching/blocking key for record linkage on names.

All three are narrow (row-local, shuffle-free) and compose::

    df.withColumn("text", clean_control_chars(F.col("text")))
      .withColumn("text", normalize_unicode(F.col("text"), "NFKC"))
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: Control chars deleted outright (keep \t \n; VT/FF/CR are SEPARATORS,
#: handled below), zero-width + BOM + soft hyphen.
_CTRL_PATTERN = "[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F\\u200B-\\u200D\\u2060\\uFEFF\\u00AD]"
#: Vertical tab / form feed / carriage return: line-break-class controls —
#: deleting them would MERGE the words they separate ('foo\rbar' ->
#: 'foobar'); they become spaces first, then collapse normally.
_SEPARATOR_CTRL_PATTERN = "[\\x0B\\x0C\\x0D]"


def clean_control_chars(text: Column, collapse_ws: bool = True) -> Column:
    """Strip control/zero-width characters; optionally collapse runs of
    whitespace to single spaces and trim. Pure JVM expressions.
    Separator-class controls (CR, form feed, vertical tab) map to spaces
    rather than vanishing, so CR-only line endings and page breaks keep
    the word boundary they encode."""
    out = F.regexp_replace(text, _SEPARATOR_CTRL_PATTERN, " ")
    out = F.regexp_replace(out, _CTRL_PATTERN, "")
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, "[ \\t\\n]+", " "))
    return out


def _make_normalizer(form: str):
    # NOT cached: a pandas_udf binds to the ACTIVE session at creation, so
    # a cross-session cache would hand out UDFs referencing a stopped
    # session; per-call creation costs microseconds and is always correct.
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize(form, t) if t is not None else None)

    return _norm


def normalize_unicode(text: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column to ``form`` (NFC/NFD/NFKC/NFKD).

    NFKC additionally folds compatibility variants (fullwidth latin,
    ligatures, superscripts) — the usual choice before tokenization."""
    return _make_normalizer(form)(text)


def _make_fold():
    # pandas_udf parses its DDL type against the ACTIVE session, so the udf
    # must be created lazily — a module-level decorator would fail to import
    # before any SparkSession exists.
    @pandas_udf("string")
    def _fold(s: pd.Series) -> pd.Series:
        def f(t: str | None) -> str | None:
            if t is None:
                return None
            return "".join(
                c for c in unicodedata.normalize("NFKD", t) if not unicodedata.combining(c)
            )

        return s.map(f)

    return _fold


def fold_accents(text: Column) -> Column:
    """Accent/diacritic folding: NFKD-decompose then drop combining marks.
    The canonical blocking key for names ("Núñez" -> "Nunez" matches
    "Nunez"); lossy by design — keep the original column alongside."""
    return _make_fold()(text)
