"""Web-crawl curation expressions: URL canonicalization and HTML text
extraction — the two normalization steps every crawl-derived training
corpus runs before dedup/quality (CCNet/RefinedWeb/RedPajama-style
pipelines), absent from the reference (its ingest is Kafka JSON;
covid19-patient-analyzer PatientEventProcessor.java consumes structured
events) and added under the beyond-reference LLM-pipeline mandate.

Everything here is a COLUMN EXPRESSION over built-in functions (regexp /
split / higher-order array ops) — JVM-side, codegen-friendly, map-only, no
Python in the hot path. At 100 TB these run inside the first corpus scan
at wire speed; the only shuffle any consumer pays is its own (e.g. the
canonical-key groupBy in URL dedup).

Canonicalization spec (``canonical_url``), chosen to be the
order-preserving, widely-agreed subset of RFC 3986 normalization plus the
de-facto tracking-parameter strip:

- trim surrounding whitespace; drop the fragment (``#...``);
- scheme and host lowercased;
- default ports removed (``:80`` for http, ``:443`` for https; other
  ports kept);
- empty path becomes ``/``; trailing slashes stripped (but the root path
  stays ``/``);
- query parameters: tracking keys removed (``utm_*``, ``gclid``,
  ``fbclid``, ``msclkid``), empty fragments dropped, REMAINING ORDER
  PRESERVED (sorting would merge semantically different URLs whose
  servers are order-sensitive); an emptied query drops its ``?``.

The spec is deliberately engine-portable: the DuckDB oracles in
plans/q_curation.py implement it independently from the same prose, so
the driver differential cross-checks two implementations of the spec
rather than one implementation against itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query-string keys that never identify content (analytics/click tracking)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid)="

#: scheme prefix of a URL (RFC 3986 scheme grammar), used by every parser here
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def _sq(pat: str) -> str:
    """Single-quoted SQL string literal of ``pat`` — backslashes doubled so
    the parser's escape processing yields the original regex text."""
    return "'" + pat.replace("\\", "\\\\").replace("'", "\\'") + "'"


# ---------------------------------------------------------------------------
# SQL-text builders (r14): the URL/robots expressions below run to dozens of
# nodes, and building them through F.* calls costs one ~1 ms py4j round-trip
# per node (guide §7.3 — plan construction is driver work; measured ~1.5 s
# per frontier_policy_pipeline call). Each builder renders the SAME
# expression as the Column form and F.expr parses it once. The Column forms
# are kept for ad-hoc Column operands; tests pin both paths equal on the
# golden URL corpus, and every registry query uses the SQL path end-to-end
# against its DuckDB oracle. Repeated sub-fragments mirror the Column form
# exactly: reusing a python Column variable also duplicates the subtree.
# ---------------------------------------------------------------------------


def canonical_url_sql(u: str) -> str:
    """SQL text of ``canonical_url`` over the SQL fragment ``u``
    (a column name or any expression text)."""
    u0 = f"split(trim({u}), '#')[0]"
    scheme_cap_re = _sq(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")
    scheme = f"lower(regexp_extract({u0}, {scheme_cap_re}, 1))"
    scheme_re = _sq(_SCHEME_RE)
    rest = f"regexp_replace({u0}, {scheme_re}, '')"
    hp0 = f"lower(regexp_replace(regexp_extract({rest}, '^([^/?]*)', 1), '^.*@', ''))"
    hostport = (
        f"CASE WHEN {scheme} = 'https' AND endswith({hp0}, ':443') "
        f"THEN regexp_replace({hp0}, ':443$', '') "
        f"WHEN {scheme} = 'http' AND endswith({hp0}, ':80') "
        f"THEN regexp_replace({hp0}, ':80$', '') ELSE {hp0} END"
    )
    path_q = f"regexp_replace({rest}, '^[^/?]*', '')"
    path0 = f"regexp_replace(regexp_extract({path_q}, '^([^?]*)', 1), '/+$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query_re = _sq(r"\?(.*)$")
    query = f"regexp_extract({path_q}, {query_re}, 1)"
    tracking_re = _sq(TRACKING_PARAM_RE)
    kept = (
        f"filter(split({query}, '&'), "
        f"p -> p != '' AND NOT (p RLIKE {tracking_re}))"
    )
    qnorm = f"array_join({kept}, '&')"
    return (
        f"CASE WHEN ({u}) IS NULL THEN CAST(NULL AS STRING) ELSE concat({scheme}, "
        f"CASE WHEN {scheme} = '' THEN '' ELSE '://' END, {hostport}, {path}, "
        f"CASE WHEN {qnorm} = '' THEN '' ELSE concat('?', {qnorm}) END) END"
    )


def host_of_sql(u: str) -> str:
    """SQL text of ``host_of`` over the SQL fragment ``u``."""
    scheme_re = _sq(_SCHEME_RE)
    rest = f"regexp_replace(trim({u}), {scheme_re}, '')"
    auth = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    host = f"regexp_replace({auth}, '^.*@', '')"
    return f"lower(regexp_extract({host}, '^([^:]*)', 1))"


def path_of_sql(u: str) -> str:
    """SQL text of ``path_of`` over the SQL fragment ``u``."""
    scheme_re = _sq(_SCHEME_RE)
    path_re = _sq(r"^[^/?#]*(/[^?#]*)?")
    rest = f"regexp_replace(trim({u}), {scheme_re}, '')"
    path = f"regexp_extract({rest}, {path_re}, 1)"
    return f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"


def domain_suffixes_sql(u: str, max_labels: int = 6) -> str:
    """SQL text of ``domain_suffixes`` over the SQL fragment ``u``."""
    dot_re = _sq(r"\.")
    labels = f"split({host_of_sql(u)}, {dot_re})"
    return (
        f"transform(sequence(1, least(size({labels}), {int(max_labels)})), "
        f"k -> array_join(slice({labels}, size({labels}) - k + 1, k), '.'))"
    )


def canonical_url(url: "Column | str") -> Column:
    """Canonical form of a URL column per the module-docstring spec.
    Malformed inputs (no ``scheme://``) canonicalize on a best-effort
    basis (treated as scheme-less host+path); NULL stays NULL.

    Pass a SQL fragment string (column name / expression text) to build
    the whole expression in ONE parse — the hot-path form every registry
    query uses; a Column operand keeps the F.*-built twin (tests pin the
    two paths equal on the golden URL corpus)."""
    if isinstance(url, str):
        return F.expr(canonical_url_sql(url))
    u = F.split(F.trim(url), "#").getItem(0)  # fragment off first
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    # RFC 3986 userinfo never names a different resource — and keeping it
    # would let 'https://x@bad.com/' dodge host-keyed policy (see host_of)
    hostport = F.lower(
        F.regexp_replace(F.regexp_extract(rest, r"^([^/?]*)", 1), r"^.*@", "")
    )
    hostport = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, ":443$", ""),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, ":80$", ""),
    ).otherwise(hostport)
    # strip the host to get path+query: host chars are exactly the leading
    # non-/? run, so one anchored regexp removes them
    path_q = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(path_q, r"^([^?]*)", 1)
    query = F.regexp_extract(path_q, r"\?(.*)$", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(kept, "&")
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.when(scheme == "", F.lit("")).otherwise(F.lit("://")),
            hostport,
            path,
            F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
        )
    )


def html_link_count(html: Column) -> Column:
    """Number of anchor openings — the numerator of the link-density
    boilerplate heuristic (nav/footer-heavy pages score high)."""
    return F.regexp_count(html, F.lit(r"(?i)<a[\s>]")).cast("long")


def strip_html(html: Column) -> Column:
    """Visible text of an HTML column: comments and ``<script>``/``<style>``
    subtrees removed wholesale (the whole ``<head>`` too — title/meta are
    not visible body text), every remaining tag stripped, the five
    universal entities decoded (&amp; last, so ``&amp;lt;`` stays a literal
    ``&lt;``), whitespace runs collapsed, ends trimmed. Regex-based by
    design: at crawl scale this is the wire-speed pre-filter; a DOM parse
    belongs behind it, on the surviving fraction, not in the first pass."""
    t = F.regexp_replace(html, r"(?is)<head[\s>].*?</head>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def html_paragraphs(html: Column) -> Column:
    """Visible text of an HTML column as an ``array<string>`` of BLOCK
    paragraphs — the block-aware twin of ``strip_html`` (which collapses
    the whole page to one line and so cannot feed paragraph-level cleanup).
    Same subtree removals (head/comments/script/style), but closing
    block-level tags (``</p> </h1>..</h6> </li> </div> </blockquote>
    </tr>``) and ``<br>`` become paragraph breaks BEFORE the generic tag
    strip; the break sentinel is a non-whitespace control char so the
    whitespace collapse cannot eat it. Within each paragraph the same
    entity decode + whitespace collapse + trim as ``strip_html``; empty
    paragraphs (pure-markup blocks) are dropped. Map-only built-ins —
    this is the crawl pipeline's extraction step feeding
    ``normalize_typography``/``dedup_paragraphs`` per paragraph."""
    t = F.regexp_replace(html, r"(?is)<head[\s>].*?</head>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(
        t, r"(?i)</(p|h[1-6]|li|div|blockquote|tr)\s*>|<br\s*/?>", "\u0001"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"\s+", " ")
    return F.filter(
        F.transform(F.split(t, "\u0001"), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def host_of(url: "Column | str") -> Column:
    """Lowercased host of a URL column (userinfo and port stripped) — the
    join key of domain-policy filters. Scheme-less inputs best-effort like
    ``canonical_url``. A str operand is a SQL fragment built in one parse
    (see ``canonical_url``).

    The RFC 3986 userinfo component (``user:pass@host``) MUST be stripped
    here: a blocklist gate that keys on the raw authority fails OPEN for
    ``https://x@bad.com/`` (the classic blocklist-bypass vector). Greedy
    ``^.*@`` within the authority matches to the LAST ``@`` — the WHATWG
    URL parsing of a userinfo that itself contains unencoded ``@``."""
    if isinstance(url, str):
        return F.expr(host_of_sql(url))
    rest = F.regexp_replace(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.regexp_replace(auth, r"^.*@", "")
    return F.lower(F.regexp_extract(host, r"^([^:]*)", 1))


def domain_suffixes(url: "Column | str", max_labels: int = 6) -> Column:
    """Array of registrable-suffix candidates of a URL's host, shortest
    first: for ``a.b.example.com`` → ``[com, example.com, b.example.com,
    a.b.example.com]`` (capped at ``max_labels`` labels). A blocklist entry
    blocks a URL iff it equals ONE of these — label-boundary suffix
    semantics, so ``example.com`` blocks every subdomain but never
    ``notexample.com``. Pure array expressions over one split: the filter
    join explodes ≤ ``max_labels`` short strings per URL, hash-joinable
    against a broadcast blocklist — the 100 TB shape (a regex-per-entry
    scan would be |blocklist|×|corpus|)."""
    if isinstance(url, str):
        return F.expr(domain_suffixes_sql(url, max_labels))
    labels = F.split(host_of(url), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_labels))),
        lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Rows whose URL host matches NO blocklist entry on a label boundary —
    the reusable crawl-policy gate behind ``domain_blocklist_filter``
    (userinfo-bearing URLs included: ``host_of`` strips ``user:pass@``
    before suffix expansion, closing the ADVICE r09 bypass).

    Shape for 100 TB: the distinct URL set explodes into ≤ ``max_labels``
    short suffix candidates, hash SEMI-joins the broadcast blocklist, and
    the blocked-URL set anti-joins back on URL equality (two identical
    URLs share one verdict, so URL is a sound row key — no synthesized
    ids). Never a regex-per-entry scan (|blocklist|×|corpus|)."""
    u, s = F.col("_fbd_url"), F.col("_fbd_sfx")
    cand = (
        df.select(F.col(url_col).alias("_fbd_url"))
        .distinct()
        .select(u, F.explode(domain_suffixes("_fbd_url")).alias("_fbd_sfx"))
    )
    blocked = (
        cand.join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("_fbd_sfx"))),
            "_fbd_sfx",
            "left_semi",
        )
        .select(u)
        .distinct()
    )
    return df.join(
        blocked.withColumnRenamed("_fbd_url", url_col), url_col, "left_anti"
    )


def path_of(url: "Column | str") -> Column:
    """The path component of a URL (query/fragment stripped, empty → ``/``)
    — the matching key of robots.txt rules. Case preserved (robots paths
    are case-sensitive per the RFC 9309 match semantics). A str operand is
    a SQL fragment built in one parse (see ``canonical_url``)."""
    if isinstance(url, str):
        return F.expr(path_of_sql(url))
    rest = F.regexp_replace(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    path = F.regexp_extract(rest, r"^[^/?#]*(/[^?#]*)?", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)


def robots_rules(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into ``(host, agent, directive, path)`` rule
    rows — fully declarative (split / posexplode / regexp / window), no
    Python in the parse path.

    Grammar subset (RFC 9309 §2): ``User-agent`` lines open a group
    (consecutive UA lines stack — every stacked agent owns the group's
    rules); ``Allow``/``Disallow`` lines attach to the CURRENT group;
    ``#`` comments and blank lines are ignored; an empty-path
    ``Disallow:`` asserts nothing (no rule emitted). Wildcards (``*``,
    ``$``) are NOT interpreted — paths match as plain prefixes
    (documented subset; the pre-wildcard original semantics).

    Scale: one posexplode of line arrays (robots bodies are KB-bounded by
    convention, so fan-out per host is bounded), two windows partitioned
    by host ordered by line position — per-host work, no global sort. The
    output rule table is dimension-sized (rules-per-host × hosts) and
    broadcastable into the URL-side gate.
    """
    grouped, agents = _robots_directive_groups(robots, host_col, body_col)
    rules = grouped.filter(
        F.col("kind").isin("allow", "disallow") & (F.col("value") != "")
    ).select("host", "grp", F.col("kind").alias("directive"), F.col("value").alias("path"))
    # LEFT join: a UA group with NO rules still emits one (host, agent,
    # NULL, NULL) marker row — group PRESENCE drives RFC 9309 group
    # selection (an empty specific group means "everything allowed for
    # this agent" and must still preempt '*'; deriving presence from
    # rules-only rows would wrongly apply the '*' group)
    return agents.join(rules, ["host", "grp"], "left").select(
        "host", "agent", "directive", "path"
    )


def _robots_directive_groups(
    robots: DataFrame, host_col: str, body_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared robots.txt line/group machinery: (grouped directive lines
    with ``grp`` ids, agents-per-group frame). Group ids increment at the
    FIRST user-agent line of each stacked header block."""
    kind_re = _sq(r"(?i)^(user-agent|allow|disallow|crawl-delay)\s*:")
    value_re = _sq(r"(?i)^(?:user-agent|allow|disallow|crawl-delay)\s*:\s*(\S*)")
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.expr("trim(regexp_replace(line, '#.*', ''))"))
        .withColumn("kind", F.expr(f"lower(regexp_extract(line, {kind_re}, 1))"))
        .withColumn("value", F.expr(f"trim(regexp_extract(line, {value_re}, 1))"))
        .filter(F.col("kind") != "")
    )
    from pyspark.sql import Window

    by_pos = Window.partitionBy("host").orderBy("pos")
    grouped = lines.withColumn(
        "grp",
        F.sum(
            (
                (F.col("kind") == "user-agent")
                & (F.coalesce(F.lag("kind").over(by_pos), F.lit("")) != "user-agent")
            ).cast("int")
        ).over(by_pos),
    )
    agents = (
        grouped.filter(F.col("kind") == "user-agent")
        .select("host", "grp", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    return grouped, agents


def robots_crawl_delays(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """``(host, agent, delay_s)`` — Crawl-delay directives per UA group
    (the de-facto extension most crawlers honor; not in RFC 9309 but in
    every production politeness layer). Non-numeric values are dropped;
    several delays in one group keep the LARGEST (the conservative
    reading)."""
    grouped, agents = _robots_directive_groups(robots, host_col, body_col)
    delays = (
        grouped.filter(
            (F.col("kind") == "crawl-delay")
            & F.col("value").rlike(r"^\d+(\.\d+)?$")
        )
        .select("host", "grp", F.col("value").cast("double").alias("delay_s"))
        .groupBy("host", "grp")
        .agg(F.max("delay_s").alias("delay_s"))
    )
    return agents.join(delays, ["host", "grp"]).select("host", "agent", "delay_s")


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Per-URL robots verdict under RFC 9309 group-selection and
    longest-match semantics: input rows gain ``allowed`` (boolean) and
    ``matched_rule`` (the winning rule path, null when no rule matched).

    Semantics: the effective group is the ``agent``-specific one when the
    host defines it, else ``*`` (a host with neither allows everything —
    and so does a host absent from ``rules`` entirely: crawl-gate
    fail-open per the RFC's missing-file rule); among matching rules
    (plain path-prefix subset) the LONGEST path wins, allow beating
    disallow on equal length, lexicographically-smaller path as the final
    deterministic tiebreak.

    Shape for 100 TB: the dimension side pre-aggregates each host's ONE
    effective rule group into an array (``collect_list`` over a
    dimension-sized frame), broadcast-joins on host, and the winner is
    reduced per row with array expressions — the corpus side is MAP-ONLY
    (no groupBy, no window, no regex-per-rule scan), so the gate runs at
    scan speed like the blocklist filter.

    Tie-break note: among rules matching one URL, equal (length,
    directive) implies an IDENTICAL rule path (equal-length prefixes of
    the same string are equal), so (length, allow-wins) is already a
    deterministic total order on distinct verdicts.
    """
    agent = agent.lower()
    exact_hosts = rules.filter(F.col("agent") == agent).select("host").distinct()
    effective = (
        rules.filter(F.col("agent").isin(agent, "*"))
        .join(F.broadcast(exact_hosts.withColumnRenamed("host", "_xh")),
              F.col("host") == F.col("_xh"), "left")
        .filter(
            F.when(F.col("_xh").isNotNull(), F.col("agent") == agent)
            .otherwise(F.col("agent") == "*")
        )
        .select("host", "directive", "path")
    )
    # marker rows (empty groups) participate in group selection above but
    # carry no matchable rule; collect_list skips the null structs they
    # produce, so an empty effective group yields an EMPTY rule array —
    # which the verdict reduction reads as "everything allowed", exactly
    # the RFC's empty-group semantics (distinct from a missing host, whose
    # _rules is NULL — same verdict, different provenance)
    host_rules = effective.groupBy("host").agg(
        F.expr(
            "collect_list(CASE WHEN path IS NOT NULL THEN named_struct("
            "'l', length(path), 'a', CAST(directive = 'allow' AS INT), "
            "'rule', path) END)"
        ).alias("_rules")
    )
    u = urls.withColumn("_r_host", host_of(f"`{url_col}`")).withColumn(
        "_r_path", path_of(f"`{url_col}`")
    )
    joined = u.join(
        F.broadcast(host_rules), u["_r_host"] == host_rules["host"], "left"
    )
    # null _rules (host without robots) propagates: filter→null,
    # array_max→null, verdict→allowed (the RFC's missing-file fail-open)
    best = "array_max(filter(_rules, r -> startswith(_r_path, r.rule)))"
    return joined.select(
        *[c for c in urls.columns],
        F.expr(f"({best} IS NULL OR {best}.a = 1)").alias("allowed"),
        F.expr(f"{best}.rule").alias("matched_rule"),
    )


def politeness_schedule(
    urls: DataFrame,
    delays: DataFrame,
    agent: str,
    default_delay_s: float = 1.0,
    url_col: str = "url",
    tiebreak_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Per-host fetch scheduling under Crawl-delay politeness: input rows
    gain ``slot`` (0-based per-host fetch position, deterministic — URLs
    order lexicographically within a host; pass ``tiebreak_cols`` (e.g. a
    row id) whenever the frontier can contain DUPLICATE URLs, or the slot
    order among the duplicates is engine/partitioning-dependent),
    ``delay_s`` (the host's
    effective Crawl-delay: agent-specific group first, else ``*``, else
    ``default_delay_s``) and ``fetch_offset_s = slot × delay_s`` — the
    earliest time each URL may be fetched relative to the host's first
    fetch.

    Shape for 100 TB: the delay table is dimension-sized → broadcast;
    the slot is ONE window partitioned by host. The per-host window is
    the schedule itself — politeness serializes fetches per host by
    definition, so per-host partition width equals per-host queue depth,
    which is exactly the quantity a frontier shards on.
    """
    from pyspark.sql import Window

    agent = agent.lower()
    # agent-specific delay preferred over '*'; if a host names the same
    # class in several groups, take the LARGEST delay of the preferred
    # class (the conservative reading, and deterministic where a min_by
    # over a preference rank would tie-break arbitrarily between groups)
    pref = (
        delays.filter(F.col("agent").isin(agent, "*"))
        .groupBy("host")
        .agg(
            F.max(F.when(F.col("agent") == agent, F.col("delay_s"))).alias("_ad"),
            F.max(F.when(F.col("agent") == "*", F.col("delay_s"))).alias("_sd"),
        )
        .select("host", F.coalesce(F.col("_ad"), F.col("_sd")).alias("delay_s"))
    )
    u = urls.withColumn("_p_host", host_of(f"`{url_col}`"))
    order = [F.col(url_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    slot = (
        F.row_number().over(Window.partitionBy("_p_host").orderBy(*order)) - 1
    )
    joined = u.join(F.broadcast(pref), u["_p_host"] == pref["host"], "left")
    eff = F.coalesce(F.col("delay_s"), F.lit(float(default_delay_s)))
    return joined.select(
        *[c for c in urls.columns],
        F.col("_p_host").alias("host"),
        slot.alias("slot"),
        eff.alias("delay_s"),
        (slot.cast("double") * eff).alias("fetch_offset_s"),
    )
