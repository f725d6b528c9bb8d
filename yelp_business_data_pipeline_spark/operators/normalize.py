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


#: Telltale lead characters of UTF-8-decoded-as-Latin-1/cp1252 text
#: ("mojibake"): the valid UTF-8 lead bytes are exactly 0xC2-0xF4, and
#: cp1252 agrees with latin-1 over that whole range, so EVERY misdecoded
#: multi-byte sequence starts with a char in this single contiguous
#: class — Latin accents, CJK (0xE4-0xE9 leads), Cyrillic/Hebrew/Arabic
#: (0xD0-0xDB) alike. Used as a cheap per-row gate so clean (ASCII)
#: rows never pay the codec work.
_MOJIBAKE_TELLTALE = "[\u00c2-\u00f4]"

_MOJIBAKE_RE = None  # compiled lazily at module scope (workers import once)


def _moji_pat():
    global _MOJIBAKE_RE
    if _MOJIBAKE_RE is None:
        import re

        _MOJIBAKE_RE = re.compile(_MOJIBAKE_TELLTALE)
    return _MOJIBAKE_RE


def _fix_mojibake_str(t, max_passes: int = 3):
    """From-scratch ftfy-core: invert UTF-8-bytes-decoded-as-cp1252 (the
    dominant web mojibake), iterating for double-encoded text, with a
    STRICT roundtrip as the acceptance rule — if re-encoding through
    cp1252 (latin-1 fallback for the five cp1252 holes) or the UTF-8
    decode fails, the text is returned unchanged. Deterministic, no
    fuzzy scoring.

    Pass exhaustion (text garbled MORE than ``max_passes`` times —
    vanishingly rare at 3) returns the ORIGINAL input, never a
    partially-unwrapped intermediate: the no-partial-fixes rule is what
    keeps the operator idempotent in every case."""
    if t is None:
        return None
    pat = _moji_pat()
    orig = t
    for _ in range(max_passes):
        if not pat.search(t):
            return t
        try:
            b = t.encode("cp1252")
        except UnicodeEncodeError:
            try:
                b = t.encode("latin-1")
            except UnicodeEncodeError:
                return t
        try:
            fixed = b.decode("utf-8")
        except UnicodeDecodeError:
            return t
        if fixed == t:
            return t
        t = fixed
    # pass budget exhausted: t is only acceptable if it is a FIXED POINT
    # (one more strict roundtrip would fail or change nothing) — clean
    # accented text sits in the telltale class (0xE9 is a telltale char
    # AND a real e-acute), so the regex can't answer this; the roundtrip
    # can. Mid-ladder (another pass would still unwrap) -> refuse the
    # partial fix, return the original input (idempotency).
    try:
        b = t.encode("cp1252")
    except UnicodeEncodeError:
        try:
            b = t.encode("latin-1")
        except UnicodeEncodeError:
            return t
    try:
        fixed = b.decode("utf-8")
    except UnicodeDecodeError:
        return t
    return t if fixed == t else orig


def _make_mojibake_fixer():
    # session-bound for the same reason as the other pandas_udfs here
    @pandas_udf("string")
    def _fix(s: pd.Series) -> pd.Series:
        # vectorized gate: only telltale-bearing rows pay a Python call
        # into the codec path — on the dominant ASCII corpus the whole
        # batch reduces to one C-speed str.contains scan
        mask = s.str.contains(_MOJIBAKE_TELLTALE, regex=True, na=False)
        if not mask.any():
            return s
        out = s.copy()
        out[mask] = s[mask].map(_fix_mojibake_str)
        return out

    return _fix


def fix_mojibake(text: Column) -> Column:
    """Repair the classic web-crawl encoding corruption: UTF-8 bytes that
    were decoded as Latin-1/cp1252 somewhere upstream ("caf\u00c3\u00a9"
    for "caf\u00e9") — the core transform of the public ftfy tool,
    reduced to its deterministic strict-roundtrip case.

    Semantics (documented boundaries, pinned in pytest):

    - repair applies ONLY when the text carries a mojibake telltale lead
      char AND the full cp1252(/latin-1)->UTF-8 roundtrip succeeds
      STRICTLY — no replacement characters, no partial fixes; anything
      else returns unchanged. Genuine text that happens to contain a
      telltale but is not valid re-encoded UTF-8 survives intact;
    - double-encoded text (garbled twice) repairs in the same call
      (bounded iteration, stable-point stop) — the operator is
      idempotent: ``fix(fix(x)) == fix(x)``;
    - ASCII is untouched by construction (no telltales), so the Arrow
      kernel's per-row regex gate keeps the common case C-speed cheap.

    Codec work is genuinely outside SQL builtins — the sanctioned
    Pandas-UDF case (the `normalize_unicode` rule). Row-local,
    shuffle-free. Spark's own ``decode(encode(x, 'ISO-8859-1'), 'UTF-8')``
    is the JVM-side UNVALIDATED equivalent (it emits replacement chars on
    genuine text instead of leaving it alone) — used by the panel to
    SYNTHESIZE mojibake in-plan, never to repair."""
    return _make_mojibake_fixer()(text)
