"""robots.txt parsing + cache refresh as DataFrame transforms.

The reference has no real robots.txt support — only ~35 hard-coded
substring deny rules (``app/util/url_util.py:30-107``). The north rule
asks for per-host politeness "with robots.txt caching", so this module
supplies the missing half:

* ``parse_robots_txt`` — (host, body) rows -> (host, pattern, allow)
  rules rows, the exact shape ``operators.frontier.apply_robots``
  broadcasts. Grammar: ``User-agent`` group headers followed by
  ``Disallow``/``Allow`` lines; only groups matching ``*`` or the given
  agent apply; blank Disallow (allow-all) and comments are dropped. All
  of it is split/filter/window — one pass, no Python.
* ``crawl_delay_of`` — per-host ``Crawl-delay`` -> ``min_interval_ms``
  rows for the politeness table.
* ``stale_robots`` — cache refresh pick: hosts whose cached copy is
  older than the TTL (the fetch stage re-requests only these).

Scale shape: bodies arrive as one row per host (the fetch stage already
dedups by host), so the line explode is ~50 lines/host; the window that
assigns lines to their user-agent group partitions by host — same key the
fetch stage is already partitioned on, so parsing adds no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TTL_HOURS = 24


def _lines(body):
    return F.split(F.regexp_replace(body, r"\r\n?", "\n"), "\n")


def _with_groups(parsed: DataFrame) -> DataFrame:
    """Assign each line its user-agent group. Per RFC 9309 a RUN of
    consecutive User-agent lines is ONE group header, so the group id
    increments only at the first UA line of a run (lag-based)."""
    w = Window.partitionBy("host").orderBy("pos")
    prev = F.lag("field").over(w)
    starts = (F.col("field") == "user-agent") & (
        prev.isNull() | (prev != "user-agent")
    )
    return parsed.withColumn(
        "grp", F.sum(F.when(starts, 1).otherwise(0)).over(w)
    )


def _group_agents(grouped: DataFrame) -> DataFrame:
    return (
        grouped.filter(F.col("field") == "user-agent")
        .groupBy("host", "grp")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("agents"))
    )


def _applicable_groups(grouped: DataFrame, agent: str) -> DataFrame:
    """(host, grp) pairs whose rules apply to ``agent`` per RFC 9309 §2.2.1:
    if ANY group on a host names the specific agent, only those groups
    apply; otherwise the ``*`` groups apply. (Groups are NOT merged across
    the two specificity levels — the previous merge behavior over-applied
    the ``*`` group to specific agents.)"""
    agents = _group_agents(grouped)
    a = agent.lower()
    has_specific = agents.groupBy("host").agg(
        F.max(F.array_contains("agents", a)).alias("has_spec")
    )
    return (
        agents.join(has_specific, "host")
        .filter(
            F.when(F.col("has_spec"), F.array_contains("agents", a)).otherwise(
                F.array_contains("agents", "*")
            )
        )
        .select("host", "grp")
    )


def parse_robots_txt(
    robots_bodies: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) -> (host, pattern, allow) rules for ``apply_robots``.

    A rule line belongs to the most recent ``User-agent`` header above it.
    Group selection follows RFC 9309 §2.2.1: the most specific matching
    group set wins — groups naming ``agent`` exactly if any exist for the
    host, else the ``*`` groups. Returns deny rules (allow=false) from
    Disallow lines and allow rules (allow=true) from Allow lines; matching
    precedence (longest pattern, Allow on tie) is applied downstream by
    ``operators.frontier.apply_robots``.
    """
    lines = robots_bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(_lines(F.col(body_col))).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip comments + whitespace
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"(?i)^([a-z-]+)\s*:", 1)).alias("field"),
        F.trim(F.regexp_extract("line", r"(?i)^[a-z-]+\s*:\s*(.*)$", 1)).alias("value"),
    ).filter(F.col("field") != "")
    grouped = _with_groups(parsed)
    applicable = _applicable_groups(grouped, agent)
    rules = (
        grouped.filter(F.col("field").isin("disallow", "allow"))
        .join(applicable, ["host", "grp"])
        .filter(F.col("value") != "")  # blank Disallow = allow-all, no rule
        .select(
            "host",
            F.col("value").alias("pattern"),
            (F.col("field") == "allow").alias("allow"),
        )
        .dropDuplicates(["host", "pattern", "allow"])
    )
    return rules


def crawl_delay_of(
    robots_bodies: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, min_interval_ms) from Crawl-delay lines (seconds -> ms);
    feeds ``politeness``. Group-applicability matches parse_robots_txt."""
    # comment-strip + blank/garbage-line drop BEFORE grouping, exactly as
    # parse_robots_txt does — keeping unparsed lines here would let a
    # comment or blank line between consecutive User-agent lines split
    # the UA run, silently losing the group's Crawl-delay
    lines = robots_bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(_lines(F.col(body_col))).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", r"(?i)^([a-z-]+)\s*:", 1)).alias("field"),
        F.trim(F.regexp_extract("line", r"(?i)^[a-z-]+\s*:\s*(.*)$", 1)).alias("value"),
    ).filter(F.col("field") != "")
    grouped = _with_groups(parsed)
    applicable = _applicable_groups(grouped, agent)
    return (
        grouped.filter(F.col("field") == "crawl-delay")
        .join(applicable, ["host", "grp"])
        .select(
            "host",
            # try_cast: a garbage 'Crawl-delay: abc' must read as absent,
            # not abort the politeness build (plain cast throws under
            # Spark 4's default ANSI mode, making the isNotNull filter
            # below dead code)
            (F.col("value").try_cast("double") * 1000)
            .try_cast("int")
            .alias("min_interval_ms"),
        )
        .filter(F.col("min_interval_ms").isNotNull())
        .groupBy("host")
        .agg(F.max("min_interval_ms").alias("min_interval_ms"))
    )


def refresh_robots_cache(
    spark,
    store,
    hosts: DataFrame,
    robots_fetcher,
    now_ts: str,
    agent: str = "*",
    ttl_hours: int = DEFAULT_TTL_HOURS,
    retries: int = 3,
    table: str = "robots_cache",
    error_ttl_hours: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The robots-cache LIFECYCLE the north rule's "robots.txt caching"
    names, as one idempotent pass over a SnapshotStore table:

    1. work-list: ``hosts`` (e.g. this wave's pending frontier hosts,
       deduped) minus hosts whose cached copy is younger than the TTL —
       a fetch failure/absence is cached too (status ``missing``, empty
       body) so an unreachable robots.txt is re-requested once per TTL,
       never once per wave;
    2. fetch ``/robots.txt`` for the work-list through a pluggable
       ``robots_fetcher(host) -> body | None`` (None = transient, retried
       — same poisoned-URL contract as every network stage) inside one
       ``mapInPandas`` pass;
    3. MERGE-commit the new bodies into the cache keyed by host
       (last-writer-wins; the snapshot reader reconciles), so concurrent
       resumes and replays stay idempotent;
    4. return ``(rules, delays)`` parsed from the RECONCILED cache —
       ``rules`` is the (host, pattern, allow) shape
       ``operators.frontier.apply_robots`` broadcasts, ``delays`` feeds
       the politeness table via ``crawl_delay_of``.

    Unreachable-vs-missing (RFC 9309 §2.3.1): a 404 (fetcher returns
    ``""``, status ``missing``) means crawl-all and is cached for the
    full TTL; a fetch that exhausts the retry ladder (status ``error``
    — the server-error / unreachable case, §2.3.1.4) contributes a
    deny-all rule ``(host, "/", allow=false)`` and is re-fetched on a
    shorter ``error_ttl_hours`` (default ``max(1, ttl_hours // 4)``),
    so an unreachable host is never crawled unrestricted for a full
    TTL.

    Scale shape: the work-list and fetch are per-HOST (dedup before any
    network), the cache table carries one row per host, and parsing is
    the existing no-Python expression pipeline — at 10^10 URLs the host
    universe is ~10^6-10^7 rows, a dimension table.
    """
    import pandas as pd

    if error_ttl_hours is None:
        error_ttl_hours = max(1, int(ttl_hours) // 4)
    cache = store.read(spark, table)
    want = hosts.select("host").dropDuplicates(["host"])
    if cache is not None:
        now_col = F.to_timestamp(F.lit(now_ts))
        ttl_of = F.when(
            F.col("status") == "error", F.expr(f"INTERVAL {int(error_ttl_hours)} HOURS")
        ).otherwise(F.expr(f"INTERVAL {int(ttl_hours)} HOURS"))
        fresh = cache.filter(F.col("fetched_at") >= now_col - ttl_of).select("host")
        work = want.join(fresh, "host", "left_anti")
    else:
        work = want

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bodies, statuses = [], []
            for host in pdf["host"]:
                out, attempts = None, 0
                while attempts < retries:
                    attempts += 1
                    out = robots_fetcher(host)
                    if out is not None:
                        break
                if out is None:
                    bodies.append("")
                    statuses.append("error")
                elif out == "":
                    bodies.append("")
                    statuses.append("missing")
                else:
                    bodies.append(out)
                    statuses.append("ok")
            pdf = pdf.reset_index(drop=True)
            pdf["body"] = bodies
            pdf["status"] = statuses
            yield pdf

    fetched = work.mapInPandas(run, "host string, body string, status string").select(
        "host", "body", "status", F.to_timestamp(F.lit(now_ts)).alias("fetched_at")
    ).persist()
    n_fetched = fetched.count()
    if n_fetched:
        store.commit(
            table, fetched, mode="merge", merge_key=["host"],
            meta={"refreshed": n_fetched},
        )
    fetched.unpersist()
    cache = store.read(spark, table)
    if cache is None:
        # empty work-list before the table's first commit: nothing was
        # fetched, nothing is cached — empty rules/delays, not a crash
        ok = spark.createDataFrame([], "host string, body string")
        return parse_robots_txt(ok, agent=agent), crawl_delay_of(ok, agent=agent)
    ok = cache.filter(F.col("status") == "ok").select("host", "body")
    # RFC 9309 §2.3.1.4: unreachable robots.txt (retry ladder exhausted)
    # => assume complete disallow until the (shorter) error TTL re-fetch
    deny_all = cache.filter(F.col("status") == "error").select(
        "host", F.lit("/").alias("pattern"), F.lit(False).alias("allow")
    )
    rules = parse_robots_txt(ok, agent=agent).unionByName(deny_all)
    return rules, crawl_delay_of(ok, agent=agent)


def stale_robots(
    robots_cache: DataFrame,
    now_ts,
    ttl_hours: int = DEFAULT_TTL_HOURS,
    fetched_col: str = "fetched_at",
    error_ttl_hours: int | None = None,
) -> DataFrame:
    """Hosts whose cached robots.txt is older than its TTL — the refresh
    work-list for the next fetch wave (reference analogue: none; it
    re-reads nothing). Mirrors ``refresh_robots_cache``'s policy: rows
    with status ``error`` (unreachable, deny-all per §2.3.1.4) go stale
    on the SHORTER ``error_ttl_hours`` (default ``max(1, ttl // 4)``) so
    a deny-all host is re-tried well before the content TTL; caches
    without a status column use the single TTL."""
    if error_ttl_hours is None:
        error_ttl_hours = max(1, int(ttl_hours) // 4)
    now_col = F.to_timestamp(F.lit(now_ts))
    if "status" in robots_cache.columns:
        ttl_of = F.when(
            F.col("status") == "error",
            F.expr(f"INTERVAL {int(error_ttl_hours)} HOURS"),
        ).otherwise(F.expr(f"INTERVAL {int(ttl_hours)} HOURS"))
    else:
        ttl_of = F.expr(f"INTERVAL {int(ttl_hours)} HOURS")
    age_ok = F.col(fetched_col) >= now_col - ttl_of
    return robots_cache.filter(~age_ok | F.col(fetched_col).isNull()).select("host")
