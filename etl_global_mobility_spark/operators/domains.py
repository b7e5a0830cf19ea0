"""Domain-level curation — the C4/RefinedWeb-shaped policy layer a web
pretraining pipeline runs between ingest and quality filtering: parse
URLs into host/registrable-domain parts, drop blocklisted domains, cap
any one domain's contribution, and report per-domain corpus shares.

Every operator here is join-free on the corpus side: URL parsing and
blocklist matching are pure map-only column expressions (the blocklist
rides into the plan as a bounded literal array — policy lists are
thousands of entries, not corpus-sized), the cap is one shuffle on the
domain key with a map-side-pruned group limit, and the report is one
hash aggregation whose output ∝ distinct domains. That is the plan
shape that survives 100 TB: nothing in this module grows with corpus
size except the single keyed aggregation Spark already does with
map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_global_mobility_spark.operators.parallelism import driver_rows_df
from etl_global_mobility_spark.operators.text import _bind

#: Multi-label public suffixes the registrable-domain rule recognizes.
#: A DELIBERATE approximation of the Public Suffix List (the real PSL
#: is ~9k entries and updates monthly; production loads it as a config
#: artifact into this same literal-set mechanism). Under the
#: approximation, hosts under an unlisted multi-part suffix resolve to
#: their last two labels — wrong only for the PSL tail, and uniformly
#: so across engines.
MULTI_PART_SUFFIXES = (
    "co.uk",
    "org.uk",
    "gov.uk",
    "ac.uk",
    "co.jp",
    "com.au",
    "com.br",
    "co.in",
)


def save_suffix_list(spark, suffixes, path: str) -> None:
    """Persist a public-suffix list as a parquet + JSON-manifest config
    artifact (same pattern as save_classifier_weights /
    save_bpe_merges): production fetches the real PSL
    (publicsuffix.org, ~9k multi-part entries) once, persists it here,
    and every curation job loads it into the SAME literal-set
    mechanism :data:`MULTI_PART_SUFFIXES` approximates. KB-sized,
    any-engine-readable, and the manifest routes through the Hadoop-FS
    wrapper so remote paths (s3://, hdfs://) keep manifest and parquet
    together."""
    import json

    from etl_global_mobility_spark.sinks.writer import _fs

    entries = sorted({s.strip().lower() for s in suffixes if s and s.strip()})
    if not entries:
        raise ValueError("empty suffix list: refusing a useless artifact")
    bad = [s for s in entries if "." not in s or s.startswith(".")]
    if bad:
        raise ValueError(
            f"suffix entries must be dotted multi-part suffixes: {bad[:5]}"
        )
    fs = _fs(spark, path)
    fs.mkdirs(path)
    base = path.rstrip("/")
    driver_rows_df(
        spark, [(s,) for s in entries], "suffix string"
    ).write.mode("overwrite").parquet(f"{base}/suffixes")
    fs.write_text(
        f"{base}/_psl_manifest.json",
        json.dumps({"n_suffixes": len(entries)}),
    )


def load_suffix_list(spark, path: str) -> tuple[str, ...]:
    """Load a suffix-list artifact saved by :func:`save_suffix_list`,
    validated against its manifest — ready to pass as the
    ``suffixes=`` override of :func:`registrable_domain` /
    :func:`extract_url_parts`. The collect is bounded by construction
    (a PSL is ~9k rows — a config artifact, not data)."""
    import json

    from etl_global_mobility_spark.sinks.writer import _fs

    base = path.rstrip("/")
    manifest = json.loads(
        _fs(spark, path).read_text(f"{base}/_psl_manifest.json")
    )
    entries = tuple(
        sorted(r.suffix for r in spark.read.parquet(f"{base}/suffixes").collect())
    )
    if len(entries) != manifest["n_suffixes"]:
        raise ValueError(
            f"suffix artifact at {path} disagrees with its manifest: "
            f"{len(entries)} rows vs {manifest['n_suffixes']} declared"
        )
    return entries


def url_host(url: str | Column) -> Column:
    """Hostname of a URL (no scheme, port, path, query, or fragment) —
    Spark's JVM-side ``try_parse_url(url, 'HOST')``: NULL for
    unparseable values rather than an error (curation inputs are
    dirty, and plain ``parse_url`` THROWS under ANSI mode — the
    default since Spark 4 — which would kill a 100 TB scan on its
    first malformed row)."""
    col = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(col, F.lit("HOST"))


def registrable_domain(
    host: str | Column, suffixes: tuple[str, ...] | None = None
) -> Column:
    """Registrable domain (eTLD+1) of a hostname: the last two labels,
    or the last three when the last two form a listed multi-part
    public suffix (``suffixes``, defaulting to the
    :data:`MULTI_PART_SUFFIXES` approximation — load the real PSL via
    :func:`load_suffix_list` and pass it here) — so
    ``www.news.example.co.uk`` → ``example.co.uk`` while
    ``cdn.example.com`` → ``example.com``. Pure codegen expression
    (anchored regex extracts + a literal set membership).

    Hosts with NO registrable-domain structure keep their own identity
    instead of collapsing into a shared sentinel (which would let
    cap_per_domain/domain_report lump unrelated hosts into one
    stratum): single-label hosts (``localhost``) and IPv4 literals
    (``10.0.1.5`` — the last-two-octet "domain" of an IP is
    meaningless) return the host itself; a trailing root dot
    (``example.com.``) is stripped before matching; NULL stays NULL.
    """
    raw = F.col(host) if isinstance(host, str) else host
    col = F.regexp_replace(raw, r"\.+$", "")
    last2 = F.regexp_extract(col, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(col, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    listed = tuple(suffixes) if suffixes is not None else MULTI_PART_SUFFIXES
    return (
        F.when(col.rlike(r"^[0-9.]+$"), col)  # IPv4 literal
        .when(last2 == "", col)  # single-label host
        .when(last2.isin(*listed) & (last3 != ""), last3)
        .otherwise(last2)
    )


def host_suffix_chain(host: str | Column) -> Column:
    """All dot-suffixes of a hostname as an array —
    ``a.b.example.com`` → ``[a.b.example.com, b.example.com,
    example.com, com]``. Bounded by label count (hostnames cap at 127
    labels; real ones at ~5), so the array is a constant-size map-side
    value — the equi-matchable form of "host is under domain D" that
    replaces a non-equi ``endswith`` join with an
    :func:`pyspark.sql.functions.arrays_overlap` literal test or a
    hash join on exploded suffixes."""
    col = F.col(host) if isinstance(host, str) else host
    return _bind(
        F.split(col, r"\."),
        lambda labels: F.transform(
            F.sequence(F.lit(1), F.size(labels)),
            lambda i: F.array_join(
                F.slice(labels, i, F.size(labels) - i + 1), "."
            ),
        ),
    )


def extract_url_parts(
    df: DataFrame,
    url_col: str = "url",
    suffixes: tuple[str, ...] | None = None,
) -> DataFrame:
    """Append ``host``, ``domain`` (registrable), ``tld``, and ``path``
    columns parsed from ``url_col`` — the map-only projection every
    domain-policy stage downstream keys on. Zero shuffles; at 100 TB
    this is a scan-width question, not a compute one."""
    host = url_host(F.col(url_col))
    return (
        df.withColumn("host", host)
        .withColumn("domain", registrable_domain(F.col("host"), suffixes))
        .withColumn("tld", F.regexp_extract(F.col("host"), r"\.([^.]+)$", 1))
        .withColumn("path", F.try_parse_url(F.col(url_col), F.lit("PATH")))
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocked: list[str],
    url_col: str = "url",
    invert: bool = False,
) -> DataFrame:
    """Drop every document whose URL host equals a blocklist entry OR
    sits under one (``cdn.bad.example.com`` is blocked by
    ``bad.example.com``) — subdomain semantics via
    :func:`host_suffix_chain` ∩ blocklist, evaluated as a map-only
    ``arrays_overlap`` against a literal array. No join, no shuffle,
    no broadcast exchange: the policy list is plan-side by
    construction (a blocklist is thousands of entries; a list that
    needs a distributed join is a *labels table*, not a blocklist).
    ``invert=True`` returns the blocked rows instead (audit mode).
    """
    if not blocked:
        raise ValueError("empty blocklist: refusing a filter that drops nothing")
    # Unparseable/NULL hosts yield a NULL predicate, which filter()
    # silently DROPS in both polarities — coalesce to false so dirty
    # rows match no blocklist entry (kept in keep mode, excluded from
    # the invert-mode audit), keeping keep + blocked == input.
    hit = F.coalesce(
        F.arrays_overlap(
            host_suffix_chain(url_host(F.col(url_col))),
            F.lit(list(blocked)).cast("array<string>"),
        ),
        F.lit(False),
    )
    return df.filter(hit if invert else ~hit)


#: Query parameters stripped by URL canonicalization: click/campaign
#: trackers that vary per visit without changing the page. ``utm_*``
#: is matched as a prefix.
TRACKING_PARAMS = ("ref", "fbclid", "gclid", "mc_cid", "mc_eid")


def normalize_url(url: str | Column) -> Column:
    """Canonical form of a URL for URL-level dedup (the C4 move:
    one crawl page, one document): lowercase scheme+host, strip the
    scheme's default port (:443/https, :80/http), strip trailing
    slashes from the path, drop the fragment, drop tracking query
    parameters (``utm_*`` prefix + :data:`TRACKING_PARAMS`), and SORT
    the surviving parameters so ``?b=2&a=1`` and ``?a=1&b=2`` meet.
    Pure codegen (anchored regex extracts + array ops on the split
    query string) — zero shuffles, and every step is RE2-safe so the
    DuckDB oracle reproduces it byte-for-byte.

    URLs with no recognizable ``scheme://`` prefix pass through
    UNCHANGED (and NULL stays NULL): collapsing every unparseable
    value to a shared canonical sentinel would make :func:`url_dedup`
    silently merge unrelated documents — dirty rows keep their own
    identity instead."""
    col = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(
        F.regexp_extract(
            col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    # The '?' must precede any '#': an unanchored `\?` would treat a
    # '?' INSIDE the fragment as the query start, so an SPA
    # hash-routing URL like 'https://app.com/p#/route?tab=1' would
    # wrongly canonicalize to 'https://app.com/p?tab=1' instead of
    # 'https://app.com/p'.
    params = F.filter(
        F.split(F.regexp_extract(col, r"^[^?#]*\?([^#]*)", 1), "&"),
        lambda p: (F.length(p) > 0)
        & ~F.substring_index(p, "=", 1).startswith("utm_")
        & ~F.substring_index(p, "=", 1).isin(*TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.when(scheme == "", col).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        )
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level dedup: canonicalize URLs (:func:`normalize_url`),
    keep ONE document per canonical URL — the longest text wins (most
    complete extraction of the same page), ties break to the lowest
    id — and report how many duplicates each survivor absorbed. This
    is C4's first dedup pass (crawls re-fetch the same page through
    tracking-param/port/case variants long before any content
    similarity runs), and it costs one shuffle on the canonical key:
    cheaper by orders of magnitude than content near-dup, which then
    only has to handle the SAME-content-DIFFERENT-url tail.

    Scale shape: map-only canonicalization → ONE mergeable
    aggregation — ``groupBy(canonical key).agg(max_by(row, (length,
    -id)), count-1)``. ``max_by`` combines map-side (partial
    aggregation), so a pathologically hot canonical URL — a page
    duplicated 10^7 times in a crawl is exactly the case this
    operator exists for — reduces to one candidate row PER MAP
    PARTITION before the shuffle, never a single-task sort. (The
    previous shape, row_number + count over a keyed window, shuffled
    every duplicate of the hot URL to one task; the count defeated
    WindowGroupLimit's map-side top-1 pruning.)

    NULL-url documents never merge: the aggregation keys on a
    NULL-safe per-row key (groupBy would group NULLs TOGETHER, which
    would collapse every url-less document into one survivor), so each
    keeps itself with ``canonical_url`` NULL and ``n_dups`` 0."""
    data_cols = list(df.columns)
    with_key = df.withColumn(
        "canonical_url", normalize_url(F.col(url_col))
    ).withColumn(
        "_cu_key",
        F.coalesce(
            F.col("canonical_url"),
            F.concat(F.lit("__null-url__:"), F.col(id_col).cast("string")),
        ),
    )
    # max of (length, -id) struct == longest text, ties to LOWEST id —
    # identical keep-best rule as ORDER BY length DESC, id ASC limit 1.
    best = with_key.groupBy("_cu_key").agg(
        F.max_by(
            F.struct(*data_cols, "canonical_url"),
            F.struct(
                F.length(F.col(text_col)).alias("_len"),
                (-F.col(id_col)).alias("_neg_id"),
            ),
        ).alias("_best"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dups"),
    )
    return best.select("_best.*", "n_dups")


def cap_per_domain(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: int = 3,
) -> DataFrame:
    """At most ``max_docs`` documents per registrable domain, chosen
    by deterministic md5 order — the "no single domain dominates the
    mix" cap (C4 kept heavily-crawled domains from swamping the
    corpus the same way). Delegates to
    :func:`operators.splits.cap_per_stratum` keyed on the parsed
    domain: one shuffle, group limit pruned map-side."""
    from etl_global_mobility_spark.operators.splits import cap_per_stratum

    with_domain = df.withColumn(
        "domain", registrable_domain(url_host(F.col(url_col)))
    )
    return cap_per_stratum(
        with_domain, "domain", max_docs, id_col=id_col, seed=seed
    )


def domain_report(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain corpus accounting: document count, exact token sum,
    and each domain's share of corpus documents and tokens — the
    report a curation run publishes before and after domain policy so
    the mix shift is auditable.

    Scale shape: ONE hash aggregation keyed on domain (map-side
    combined, output ∝ distinct domains) plus a broadcast of the
    1-row corpus totals for the share division — never an
    unpartitioned window."""
    from etl_global_mobility_spark.operators.text import token_count

    per_domain = (
        df.select(
            registrable_domain(url_host(F.col(url_col))).alias("domain"),
            token_count(F.col(text_col)).alias("_tok"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("sum_tokens"),
        )
    )
    totals = per_domain.agg(
        F.sum("n_docs").alias("_total_docs"),
        F.sum("sum_tokens").alias("_total_tokens"),
    )
    return (
        per_domain.crossJoin(F.broadcast(totals))  # 1-row totals frame
        .select(
            "domain",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs").cast("double") / F.col("_total_docs")).alias(
                "doc_share"
            ),
            # a corpus whose docs are ALL token-less has no token mass
            # to share: NULL (ANSI would throw on the 0/0; DuckDB's
            # x/0 yields the same NULL). _total_docs >= 1 always.
            F.when(
                F.col("_total_tokens") > 0,
                F.col("sum_tokens").cast("double") / F.col("_total_tokens"),
            ).alias("token_share"),
        )
    )
