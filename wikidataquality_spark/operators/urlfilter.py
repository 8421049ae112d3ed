"""Domain-blocklist URL filtering (the UT1/adult-category-list stage).

Web-text pipelines drop whole domains before looking at a single body byte
(UT1 blacklists in RefinedWeb/FineWeb, spam/parked-domain lists): the input
is a list of REGISTRABLE domains and the rule is suffix semantics —
`example.com` blocks `a.b.example.com`. The naive spelling is a
LIKE-'%'-theta-join (a nested loop over corpus × blocklist); this module
never builds one:

  1. each doc's host explodes into its parent-domain chain
     (`a.b.example.com` → [a.b.example.com, b.example.com, example.com]) —
     BOUNDED rows/doc (hosts have ≲10 labels; the bare TLD is excluded so a
     pathological "com" list entry cannot blank the corpus);
  2. the chain equi-joins the broadcast blocklist (category lists are ≤10⁶
     rows — trivially broadcastable; only HITS survive into the distinct);
  3. hits re-attach with a left join: scrub-not-drop flags, every row
     survives.

NULL/unparseable host → `blocked` NULL ("unverifiable", the
contamination_marks convention): a NULL is not silently clean, the caller
decides whether unverifiable means drop (fail closed) or keep.

Reference analogue: ConflictsWithChecker's blocklist ethos
(ref≈includes/ConstraintCheck/Checker/ConflictsWithChecker.php:~30-90)
applied to the URL authority instead of statement values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikidataquality_spark.operators.dedup import host_of

MAX_LABELS = 10  # bound the per-doc chain; hosts deeper than this are spam anyway


def domain_chain(url_col: str | Column = "url") -> Column:
    """Array of the host's parent domains, most-specific first, bare TLD
    excluded; NULL for NULL/unparseable hosts. Pure codegen.

    The depth cap keeps the SHORT end of the chain (suffixes of ≤
    MAX_LABELS labels): blocklists name registrable domains, so the
    registrable suffix must survive no matter how deep the host is — a cap
    from the long end let a 12-label spam chain walk past its own blocked
    domain (r04 review). Trailing FQDN dots — ALL of them, not one — are
    stripped first for the same reason ('example.com.' is the classic
    evasion spelling and 'example.com..' its multi-dot variant; both arms
    of the urlfilter stage share this normalization, r04 session review)."""
    host = F.regexp_replace(F.lower(host_of(url_col)), r"\.+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # suffix i covers labels[i..n) and has n-i labels: keep 2 ≤ n-i ≤ MAX
    idx = F.sequence(F.greatest(n - MAX_LABELS, F.lit(0)), n - 2)
    return F.when(
        host.isNotNull() & (n >= 2),
        F.transform(idx, lambda i: F.array_join(F.slice(labels, i + 1, n - i), ".")),
    ).otherwise(
        # single-label hosts (intranet names) still match themselves
        F.when(host.isNotNull(), F.array(host))
    )


def domain_blocklist_marks(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """(id, matched_domain, blocked) per id. blocked is TRUE when any
    parent domain of the url's host appears in `blocklist` (lowercased),
    FALSE for a parseable-but-unlisted host, NULL for an unparseable/NULL
    host OR a NULL id (a NULL id cannot be re-attached through the join
    key, so its verdict is UNVERIFIABLE — never a silent clean FALSE; the
    contamination_marks convention, r04 review). matched_domain is the
    MOST SPECIFIC hit (deterministic: longest match, ties impossible
    within one chain).

    Precondition: ids unique (the operator is id-keyed; duplicate ids
    share one verdict and a left join against this output multiplies —
    same contract as operators/boilerplate.py)."""
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("_bl_domain")).distinct()
    )
    chains = docs.select(
        F.col(id_col), domain_chain(F.col(url_col)).alias("_chain")
    )
    # most specific hit = LONGEST matched suffix (within one chain suffix
    # lengths strictly decrease, so max_by(length) is unambiguous); only
    # hits enter the aggregation, so its state is bounded by blocked docs
    hits = (
        chains.select(id_col, F.explode("_chain").alias("_bl_domain"))
        .join(bl, "_bl_domain")
        .groupBy(id_col)
        .agg(F.expr("max_by(_bl_domain, length(_bl_domain))").alias("matched_domain"))
    )
    known = F.col("_chain").isNotNull() & F.col(id_col).isNotNull()
    return (
        chains.join(hits, id_col, "left")
        .select(
            id_col,
            F.when(known, F.col("matched_domain")).alias("matched_domain"),
            F.when(known, F.col("matched_domain").isNotNull()).alias("blocked"),
        )
    )


def path_blocklist_marks(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    host_col: str = "host",
    prefix_col: str = "path_prefix",
) -> DataFrame:
    """robots.txt-style path filtering: (id, matched_prefix, path_blocked)
    per id, where `rules` is a (host, path_prefix) Disallow table — the
    dominant robots rule form, and the granularity the domain blocklist
    can't express (block /private/ on a host you otherwise keep; a
    'Disallow: /' row blocks the whole host).

    Semantics (deliberately the robots subset curation pipelines honor):
      - EXACT host match — robots is per-host, never suffix (rules for
        example.com say nothing about sub.example.com); hosts are
        lowercased and FQDN trailing dots stripped on BOTH sides, closing
        the 'b.example.' evasion spelling exactly as domain_chain does;
      - literal prefix on the PATH ONLY (parse_url PATH excludes query
        string and fragment — '/search?q=' style rules can never match
        and must be normalized upstream), so mid-segment prefixes work
        ('/priv' blocks '/private'); no wildcards/Allow precedence —
        documented out of scope;
      - EMPTY prefixes are dropped: a bare 'Disallow:' line means
        allow-everything in robots.txt, while startswith('') is true for
        every path — keeping them would invert the rule into block-all;
      - matched_prefix is the LONGEST (most specific) hit;
      - NULL id / unparseable host / NULL path → NULL verdict
        (unverifiable, the domain_blocklist_marks convention).

    Plan shape: broadcast equi-join on host with the startswith predicate
    riding the SAME BroadcastHashJoin (never a nested loop); per-host
    fanout is bounded by that host's rule count, and only hits enter the
    max_by aggregation. Same unique-id precondition as
    domain_blocklist_marks."""
    url = F.col(url_col)
    path = F.try_parse_url(url, F.lit("PATH"))
    # parse_url yields '' for a bare authority — robots semantics treat
    # that as the root path
    path = F.when(path == "", F.lit("/")).otherwise(path)
    norm_host = lambda c: F.regexp_replace(F.lower(c), r"\.+$", "")  # noqa: E731
    d = docs.select(
        F.col(id_col),
        norm_host(host_of(url)).alias("_h"),
        path.alias("_p"),
    )
    r = F.broadcast(
        rules.filter(F.length(prefix_col) > 0)
        .select(
            norm_host(F.col(host_col)).alias("_h"),
            F.col(prefix_col).alias("_pref"),
        )
        .distinct()
    )
    hits = (
        d.join(r, "_h")
        .filter(F.col("_p").startswith(F.col("_pref")))
        .groupBy(id_col)
        .agg(F.expr("max_by(_pref, length(_pref))").alias("matched_prefix"))
    )
    known = F.col("_h").isNotNull() & F.col("_p").isNotNull() & F.col(id_col).isNotNull()
    return d.join(hits, id_col, "left").select(
        id_col,
        F.when(known, F.col("matched_prefix")).alias("matched_prefix"),
        F.when(known, F.col("matched_prefix").isNotNull()).alias("path_blocked"),
    )
