"""URL canonicalization — the crawl frontier's dedup key.

Web pipelines dedup by URL before they ever fetch (the frontier and the
re-crawl ledger are URL-keyed; content dedup — operators/dedup.py,
incdedup.py — runs after extraction). This module gives that key a
deterministic canonical form with PURE JVM expressions (no UDF, stays in
WholeStageCodegen, pushdown-friendly), and every regex is class-based so
the same pattern means the same thing under Java regex (Spark) and RE2
(DuckDB) — the BPE_ISH_PATTERN portability rule. That is what makes the
exact DuckDB twin (URL_CANONICAL_ORACLE in plans/extensions.py, rotation
queue) possible.

Canonical form (RFC 3986 normalization reduced to its deterministic,
engine-portable core):

- scheme and host lowercase; trailing dots stripped from the host
- fragment dropped; default ports dropped (http:80, https:443)
- empty path becomes ``/``; runs of ``/`` collapse to one
- query params split on ``&``, empty segments and tracking params
  (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``) dropped, the rest
  SORTED (codepoint order) and rejoined — param order never splits a
  dedup group
- strings without a ``scheme://`` prefix canonicalize to NULL — a
  countable, loud absence, never a silently passed-through non-URL

Documented boundaries (stated, not silent): duplicate params are kept
(dropping them changes semantics for multi-value params), percent-encoding
is preserved byte-for-byte (case-folding ``%2f``→``%2F`` needs a callback
replace, not available as a portable SQL expression),
``registrable_domain`` (the bare Column expression) is a last-two-labels
heuristic — :func:`with_registrable_domain` with a user-supplied
public-suffix-list table (r10) runs the full publicsuffix.org algorithm
as broadcast joins, and the heuristic stays the no-table default —
and IPv6 bracket-literal authorities (``http://[2001:db8::1]/``)
canonicalize to NULL — the loud non-URL path — rather than risk the
first-colon host rule collapsing distinct IPv6 hosts into one frontier
entry (see ``_bracketed_authority``).

No reference counterpart (the reference starts from Yelp JSON ids);
public recipes: RFC 3986 §6, the SafeBrowsing/crawler canonicalization
folklore, tracking-param lists from public crawler configs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking params dropped during canonicalization. Class-based regex —
#: identical under Java regex and RE2 (anchored, no lookaround). Param
#: NAMES match case-insensitively via explicit classes (``?UTM_SOURCE=``
#: is the same tracker as ``?utm_source=``; neither engine needs an (?i)
#: flag this way) — param VALUES stay byte-exact, they are data.
TRACKING_PARAM_RE = (
    "^([uU][tT][mM]_[a-zA-Z0-9_]*"
    "|[gG][cC][lL][iI][dD]"
    "|[fF][bB][cC][lL][iI][dD]"
    "|[mM][sS][cC][lL][kK][iI][dD])="
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"

#: scheme -> default port (dropped when explicit)
DEFAULT_PORTS = {"http": "80", "https": "443"}


def _after_scheme(u: Column) -> Column:
    return F.regexp_replace(F.trim(u), _SCHEME_RE, "")


def url_scheme(u: Column) -> Column:
    """Lowercased scheme, '' when the string has no ``scheme://``.

    Every component helper trims its input first (scraped hrefs carry
    padding routinely) so ``url_host('  http://a.com')`` and
    ``canonical_url`` agree — the anchored scheme regex would otherwise
    silently NULL the host while the canonical form survived."""
    return F.lower(F.regexp_extract(F.trim(u), _SCHEME_RE, 1))


def _authority(u: Column) -> Column:
    return F.regexp_extract(_after_scheme(u), "^([^/?#]*)", 1)


def _bracketed_authority(u: Column) -> Column:
    """IPv6 literal authorities (``http://[2001:db8::1]/``) — the
    first-colon host extraction would truncate them, collapsing DISTINCT
    IPv6 hosts into one canonical form and silently dropping real pages
    at frontier dedup. Bracketed authorities therefore take the loud
    non-URL path (host and canonical NULL — countable, never collapsed;
    frontier_dedup's NULL policy keeps or quarantines them). A
    deployment crawling IPv6-literal hosts adds a bracket-aware host
    rule; documented boundary, not silent corruption."""
    return F.contains(_authority(u), F.lit("["))


def url_host(u: Column) -> Column:
    """Lowercased host (no port, no userinfo, trailing dots stripped);
    NULL when there is no scheme or the authority is an IPv6 bracket
    literal (see _bracketed_authority). Userinfo (``user:pw@host``) is
    rare and hostile-input-shaped; strip anything through the last ``@``
    in the authority — class-based, portable."""
    no_user = F.regexp_replace(_authority(u), "^.*@", "")
    host = F.lower(F.regexp_extract(no_user, "^([^:]*)", 1))
    host = F.regexp_replace(host, "[.]+$", "")
    return F.when((url_scheme(u) != "") & ~_bracketed_authority(u), host)


def url_port_part(u: Column) -> Column:
    """``:port`` suffix to keep in the canonical form — '' when absent or
    when it is the scheme's default."""
    authority = F.regexp_extract(_after_scheme(u), "^([^/?#]*)", 1)
    no_user = F.regexp_replace(authority, "^.*@", "")
    port = F.regexp_extract(no_user, ":([0-9]+)$", 1)
    scheme = url_scheme(u)
    is_default = F.lit(False)
    for sch, p in DEFAULT_PORTS.items():
        is_default = is_default | ((scheme == sch) & (port == p))
    return F.when((port == "") | is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )


def url_path(u: Column) -> Column:
    """Path with ``//`` runs collapsed and '' promoted to '/'. Fragment is
    cut first so a ``#`` cannot smuggle path bytes."""
    no_frag = F.regexp_replace(_after_scheme(u), "#.*$", "")
    tail = F.regexp_replace(no_frag, "^[^/?#]*", "")  # drop authority
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query_part(u: Column) -> Column:
    """``?k=v&...`` with tracking/empty params dropped and the remainder
    sorted; '' when nothing survives."""
    no_frag = F.regexp_replace(_after_scheme(u), "#.*$", "")
    query = F.regexp_extract(no_frag, "[?](.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    joined = F.array_join(F.array_sort(params), "&")
    return F.when(joined == "", F.lit("")).otherwise(F.concat(F.lit("?"), joined))


def canonical_url(u: Column) -> Column:
    """The canonical form (module docstring); NULL for non-URL strings and
    NULL inputs. Component helpers trim internally (see url_scheme)."""
    return F.when(
        (url_scheme(u) != "") & ~_bracketed_authority(u),
        F.concat(
            url_scheme(u),
            F.lit("://"),
            url_host(u),
            url_port_part(u),
            url_path(u),
            url_query_part(u),
        ),
    )


def registrable_domain(host: Column) -> Column:
    """Last-two-labels heuristic (``a.b.example.com`` -> ``example.com``).
    Correct for generic TLDs; two-level public suffixes (``.co.uk``) need
    the public-suffix table — :func:`with_registrable_domain` with a PSL
    frame is the full-rule path; this expression stays the no-table
    default (and the two agree wherever the matched public suffix is one
    label)."""
    return F.regexp_extract(host, "([^.]+[.][^.]+)$", 1)


def with_registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "registrable_domain",
    psl: DataFrame | None = None,
    suffix_col: str = "suffix",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Registrable domain per the publicsuffix.org algorithm when a PSL
    table is supplied; the last-two-labels heuristic otherwise.

    ``psl``: one string column ``suffix_col`` holding the list's rules
    verbatim — plain suffixes (``com``, ``co.uk``), wildcard rules
    (``*.ck``), and exception rules (``!www.ck``). The list is PUBLIC
    data (publicsuffix.org); this engine ships no copy — deployments
    pass the table they already vendor.

    Spark-first shape (the 100-TB check): the PSL is ~10k tiny rows, so
    rule matching is ``max_suffix_labels`` BROADCAST left joins — one per
    candidate suffix length, each probing the host's last-``j`` labels
    against the aggregated rule table map-side. The corpus never
    shuffles, never explodes (no row multiplication), and the whole
    match is JVM expressions + broadcast hash joins. The one exchange in
    the plan is the groupBy folding the TINY rule table itself.

    Longest-match / wildcard / exception semantics (publicsuffix.org):
    exceptions beat wildcards beat shorter rules; a wildcard ``*.X``
    makes every direct child of ``X`` a public suffix; no match at all
    falls back to the implicit ``*`` rule (last label is the suffix —
    exactly the heuristic). A host that IS a public suffix (``co.uk``)
    gets NULL — it names no registrant, and counting it as a domain is
    the frontier-stats bug this path exists to fix. NULL/unknown hosts
    stay NULL. Raise ``max_suffix_labels`` if your PSL snapshot carries
    longer rules than its default covers (the current public list tops
    out at 4 dotted labels; the guard below raises loudly rather than
    silently mis-grouping)."""
    host = F.col(host_col)
    if psl is None:
        return df.withColumn(
            out_col, F.when(host.isNotNull(), registrable_domain(host))
        )

    # Fold the rule list into (suffix -> which rule kinds name it). The
    # groupBy is over the ~10k-row PSL, not the corpus. Wildcards are
    # keyed by their TAIL (the part after '*.') — a wildcard match is
    # "the last j labels equal the tail and a j+1-th label exists".
    rules = psl.select(
        F.when(
            F.col(suffix_col).startswith("!"), F.expr(f"substring({suffix_col}, 2)")
        )
        .when(
            F.col(suffix_col).startswith("*."),
            F.expr(f"substring({suffix_col}, 3)"),
        )
        .otherwise(F.col(suffix_col))
        .alias("_sfx"),
        F.col(suffix_col).startswith("!").alias("_is_exc"),
        F.col(suffix_col).startswith("*.").alias("_is_wild"),
    ).groupBy("_sfx").agg(
        F.max(
            (~F.col("_is_exc") & ~F.col("_is_wild")).cast("boolean")
        ).alias("_exact"),
        F.max("_is_wild").alias("_wild"),
        F.max("_is_exc").alias("_exc"),
    )
    n_over = rules.filter(
        F.size(F.split(F.col("_sfx"), "[.]")) > max_suffix_labels
    ).count()
    if n_over:
        raise ValueError(
            f"with_registrable_domain: {n_over} PSL rules have more than "
            f"max_suffix_labels={max_suffix_labels} labels — raise the "
            "parameter or those rules silently never match"
        )

    labels = F.split(host, "[.]")
    n = F.size(labels)
    out = df.withColumn("_rd_n", n)
    # candidate suffix of length j = the host's last j labels
    for j in range(1, max_suffix_labels + 1):
        sfx_j = F.when(
            F.col("_rd_n") >= j,
            F.array_join(F.slice(F.split(host, "[.]"), -j, j), "."),
        )
        r = rules.select(
            F.col("_sfx").alias(f"_rd_sfx{j}"),
            F.col("_exact").alias(f"_rd_exact{j}"),
            F.col("_wild").alias(f"_rd_wild{j}"),
            F.col("_exc").alias(f"_rd_exc{j}"),
        )
        out = out.withColumn(f"_rd_cand{j}", sfx_j).join(
            F.broadcast(r),
            F.col(f"_rd_cand{j}") == F.col(f"_rd_sfx{j}"),
            "left",
        )
    # public-suffix length: exceptions dominate (ps = j - 1), else the
    # longest of exact-at-j (ps = j) and wildcard-tail-at-j (ps = j + 1,
    # only when that j+1-th label exists), else the implicit '*' (ps = 1)
    exc_ps = F.greatest(
        *[
            F.when(F.coalesce(F.col(f"_rd_exc{j}"), F.lit(False)), F.lit(j - 1))
            for j in range(1, max_suffix_labels + 1)
        ]
    )
    rule_ps = F.greatest(
        F.lit(1),
        *[
            F.when(F.coalesce(F.col(f"_rd_exact{j}"), F.lit(False)), F.lit(j))
            for j in range(1, max_suffix_labels + 1)
        ],
        *[
            F.when(
                F.coalesce(F.col(f"_rd_wild{j}"), F.lit(False))
                & (F.col("_rd_n") >= j + 1),
                F.lit(j + 1),
            )
            for j in range(1, max_suffix_labels + 1)
        ],
    )
    ps_len = F.coalesce(exc_ps, rule_ps)
    # registrable = the last ps_len+1 labels; NULL when the host IS a
    # public suffix (n == ps_len) or shorter
    reg = F.when(
        host.isNotNull() & (F.col("_rd_n") > ps_len),
        F.array_join(
            F.slice(
                F.split(host, "[.]"),
                (ps_len + F.lit(1)) * F.lit(-1),
                ps_len + F.lit(1),
            ),
            ".",
        ),
    )
    drop = ["_rd_n"] + [
        c
        for j in range(1, max_suffix_labels + 1)
        for c in (f"_rd_cand{j}", f"_rd_sfx{j}", f"_rd_exact{j}", f"_rd_wild{j}", f"_rd_exc{j}")
    ]
    return out.withColumn(out_col, reg).drop(*drop)


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Column-level convenience: add the canonical form (NULL = not a URL).
    Frontier dedup is then exact dedup on ``out_col`` (operators/dedup.py)
    or a cross-snapshot incdedup store keyed by it."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def frontier_dedup(
    df: DataFrame,
    url_col: str = "url",
    order_by: list[Column] | None = None,
    *,
    canonical_col: str = "canonical_url",
    keep_non_urls: bool = False,
) -> DataFrame:
    """Crawl-frontier dedup: canonicalize, keep ONE row per canonical form
    (first under ``order_by`` — discovery time, priority, id — the
    ``exact_dedup`` determinism contract; default: the url string itself).

    NULL canonicals (non-URL rows) are never a dedup group — collapsing
    every unparseable string into one survivor would silently drop
    frontier entries. Default policy drops them (an unfetchable frontier
    row is noise); ``keep_non_urls=True`` passes them all through for
    quarantine-style handling. Cross-SNAPSHOT frontier dedup is the same
    key through the incremental store (operators/incdedup.py keyed by
    ``canonical_col``) — this function is the within-batch stage."""
    from .dedup import exact_dedup

    out = canonicalize_urls(df, url_col, canonical_col)
    urls = out.filter(F.col(canonical_col).isNotNull())
    deduped = exact_dedup(
        urls, [canonical_col], order_by if order_by is not None else [F.col(url_col)]
    )
    if keep_non_urls:
        return deduped.unionByName(out.filter(F.col(canonical_col).isNull()))
    return deduped
