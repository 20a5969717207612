"""Crawl-maintenance operators (round-2 waves 6-12): the web-graph
hygiene jobs a production crawl runs BETWEEN fetch rounds — redirect
resolution, mirror/trap/soft-404 defense, anchor-text and importance
signals, recrawl scheduling, budget apportionment, robots parsing and
evaluation, registrable-domain extraction, HTML extraction, URL
canonicalization, corpus-version diffing, and joint multimodal dedup.

The reference walks listing pages and refetches everything wholesale
each run (src/main.py:153-200, src/image_processor.py:100-160); it has
none of these capabilities — each exists to keep a 100 TB crawl from
wasting its fetch budget. All run over deterministic materialized
fixtures (the `_materialized` write-once pattern from imagedup.py) so
both engines read the SAME parquet, and every derived threshold is
integer/string arithmetic — no float comparisons anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from voz_spark.imagedup import _materialized
from voz_spark.registry import register


def _pdf(rows: list[dict]):
    import pandas as pd

    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# q96: redirect-chain resolution by pointer doubling. A crawl's URL
# set is riddled with 301/302 chains (http→https, www→apex, moved
# threads); scheduling the intermediate hops wastes fetches and
# splits per-URL state across aliases. The frontier needs each source
# resolved to its FINAL target — and chains can be cyclic (A→B→A),
# which must be detected, not followed forever.
#
# Scale shape: the naive walk is one self-join per hop (O(H) shuffles
# for chains of length H). Pointer doubling squares the reach each
# round — m_k resolves up to 2^k hops — so R = ceil(log2(H)) joins
# suffice: 3 shuffles for chains up to 8 where the naive plan needs 8.
# Every join key is a canonical URL (uniform); the redirect map is
# functional (one outgoing edge per source), so each round is a 1:≤1
# left join with no fan-out. Cycle detection is a final semi-join:
# after R rounds any acyclic source has landed on a terminal node
# (no outgoing edge); a resolved target that still redirects can only
# mean a cycle.
#
# Cross-engine parity: the DuckDB oracle unrolls the SAME R rounds as
# chained AS MATERIALIZED CTEs (the k-core idiom — materialization is
# mandatory or the doubly-referenced CTE expands 2^R scans). Cyclic
# sources get sentinel values ('(cycle)', -1) rather than NULLs so
# neither engine materializes a nullable-int column.
# ---------------------------------------------------------------------------

Q96_REDIRECT_PATH = "/tmp/voz_spark_q96_redirects"
_Q96_CHAINS = 60
_Q96_MAX_LEN = 7  # longest acyclic chain -> R = ceil(log2(7+1)) = 3 rounds
_Q96_ROUNDS = 3
_Q96_CYCLES = 6


def _redirect_rows() -> list[dict]:
    """Deterministic redirect map: 60 chains of length 1..7 ending at
    a terminal URL, plus 6 cycles (sizes 2/3/4) each with one tail
    node feeding into it. The map is functional: every src appears
    exactly once."""
    rows = []
    for c in range(_Q96_CHAINS):
        length = (c % _Q96_MAX_LEN) + 1
        for k in range(length):
            rows.append(
                {
                    "src_url": f"https://r.test/c{c}/n{k}",
                    "dst_url": f"https://r.test/c{c}/n{k + 1}",
                }
            )
    for c in range(_Q96_CYCLES):
        size = 2 + (c % 3)
        for k in range(size):
            rows.append(
                {
                    "src_url": f"https://r.test/cy{c}/n{k}",
                    "dst_url": f"https://r.test/cy{c}/n{(k + 1) % size}",
                }
            )
        rows.append(
            {"src_url": f"https://r.test/cy{c}/tail", "dst_url": f"https://r.test/cy{c}/n0"}
        )
    return rows


def _q96_oracle() -> str:
    steps = ["m0 AS MATERIALIZED (SELECT src_url AS src, dst_url AS dst, 1 AS hops "
             f"FROM read_parquet('{Q96_REDIRECT_PATH}/*.parquet'))"]
    for r in range(1, _Q96_ROUNDS + 1):
        steps.append(
            f"m{r} AS MATERIALIZED (SELECT a.src, COALESCE(b.dst, a.dst) AS dst, "
            f"a.hops + COALESCE(b.hops, 0) AS hops "
            f"FROM m{r - 1} a LEFT JOIN m{r - 1} b ON a.dst = b.src)"
        )
    last = f"m{_Q96_ROUNDS}"
    return (
        "WITH " + ",\n".join(steps) + ",\n"
        "heads AS (SELECT DISTINCT src FROM m0)\n"
        f"SELECT {last}.src AS src_url,\n"
        f"       CASE WHEN h.src IS NULL THEN {last}.dst ELSE '(cycle)' END AS final_url,\n"
        f"       CAST(CASE WHEN h.src IS NULL THEN {last}.hops ELSE -1 END AS BIGINT) AS hops,\n"
        "       (h.src IS NOT NULL) AS is_cycle\n"
        f"FROM {last} LEFT JOIN heads h ON {last}.dst = h.src\n"
        "ORDER BY src_url"
    )


@register("q96_redirect_resolution", oracle=_q96_oracle())
def q96_redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every redirect source to its final URL in
    ceil(log2(H)) pointer-doubling joins; cyclic sources are flagged
    (sentinels '(cycle)'/-1) via a terminal-node semi-join. Parity vs
    a naive Python walk is pinned by tests/test_crawlops.py."""
    edges = _materialized(
        spark,
        Q96_REDIRECT_PATH,
        f"chains={_Q96_CHAINS};maxlen={_Q96_MAX_LEN};cycles={_Q96_CYCLES};v1",
        lambda: spark.createDataFrame(_pdf(_redirect_rows())),
    )
    m = edges.select(
        F.col("src_url").alias("src"), F.col("dst_url").alias("dst"), F.lit(1).alias("hops")
    )
    for _ in range(_Q96_ROUNDS):
        b = m.select(
            F.col("src").alias("b_src"), F.col("dst").alias("b_dst"), F.col("hops").alias("b_hops")
        )
        m = m.join(b, m.dst == b.b_src, "left").select(
            "src",
            F.coalesce("b_dst", "dst").alias("dst"),
            (F.col("hops") + F.coalesce("b_hops", F.lit(0))).alias("hops"),
        )
    heads = edges.select(F.col("src_url").alias("h_src")).distinct()
    return (
        m.join(heads, m.dst == heads.h_src, "left")
        .select(
            F.col("src").alias("src_url"),
            F.when(F.col("h_src").isNull(), F.col("dst")).otherwise("(cycle)").alias("final_url"),
            F.when(F.col("h_src").isNull(), F.col("hops"))
            .otherwise(-1)
            .cast("long")
            .alias("hops"),
            F.col("h_src").isNotNull().alias("is_cycle"),
        )
        .orderBy("src_url")
    )


# ---------------------------------------------------------------------------
# q97: mirror-host detection — host pairs whose page-content sets
# overlap heavily (CDNs, regional mirrors, scraped clones). Crawling
# both sides of a mirror doubles fetch cost for zero new content; the
# frontier should collapse the pair to one representative.
#
# Scale shape: the pair generator is a self-join on content_id, and
# the classic failure is boilerplate — one content hash shared by d
# hosts yields d² join rows (the q26 lesson from round 1). The
# document-frequency cap runs FIRST: content appearing on more than
# DF_CAP hosts is dropped before the join (a privacy-policy page
# shared by every host identifies no mirror), and singletons (df=1)
# are dropped too since they cannot pair. The surviving join key has
# bounded fan-out ≤ DF_CAP by construction, so the pair stage is
# O(shared · DF_CAP), never quadratic in host count. Resemblance is
# Broder-style over the df-capped universe; similarity is integer
# millis (shared*1000 div union) — no float thresholds.
# ---------------------------------------------------------------------------

Q97_PAGES_PATH = "/tmp/voz_spark_q97_host_pages"
_Q97_DF_CAP = 4
_Q97_MIN_SHARED = 20
_Q97_PATHS = 120


def _host_page_rows() -> list[dict]:
    """10 hosts × 120 paths. (h0,h1) mirror 110/120 paths, (h2,h3)
    mirror 60/120; h4..h9 are unique. Every host additionally serves
    a boilerplate page shared by ALL hosts — the df-cap must exclude
    it or every host pair would appear related."""
    rows = []
    for h in range(10):
        host = f"h{h}.voz.test"
        for i in range(_Q97_PATHS):
            if h in (0, 1) and i < 110:
                cid = f"m01-{i}"
            elif h in (2, 3) and i < 60:
                cid = f"m23-{i}"
            else:
                cid = f"h{h}-{i}"
            rows.append({"host": host, "path": f"/p/{i:03d}", "content_id": cid})
        rows.append({"host": host, "path": "/about", "content_id": "boiler"})
    return rows


_Q97_ORACLE = f"""
WITH d AS (
  SELECT DISTINCT host, content_id
  FROM read_parquet('{Q97_PAGES_PATH}/*.parquet')
),
sizes AS (
  SELECT host, COUNT(*) AS n_pages FROM d GROUP BY host
),
rare AS (
  SELECT content_id FROM d GROUP BY content_id
  HAVING COUNT(*) BETWEEN 2 AND {_Q97_DF_CAP}
),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, COUNT(*) AS shared
  FROM d a JOIN d b ON a.content_id = b.content_id AND a.host < b.host
  WHERE a.content_id IN (SELECT content_id FROM rare)
  GROUP BY 1, 2
)
SELECT p.host_a, p.host_b, p.shared,
       sa.n_pages AS size_a, sb.n_pages AS size_b,
       p.shared * 1000 // (sa.n_pages + sb.n_pages - p.shared) AS jaccard_milli
FROM pairs p
JOIN sizes sa ON sa.host = p.host_a
JOIN sizes sb ON sb.host = p.host_b
WHERE p.shared >= {_Q97_MIN_SHARED}
ORDER BY host_a, host_b
"""


@register("q97_mirror_hosts", oracle=_Q97_ORACLE)
def q97_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host pairs sharing >= MIN_SHARED df-capped content ids, scored
    by integer-milli Jaccard over the full page sets. Boilerplate
    (df > DF_CAP) and singleton content are pruned BEFORE the pair
    join, bounding its fan-out."""
    pages = _materialized(
        spark,
        Q97_PAGES_PATH,
        f"hosts=10;paths={_Q97_PATHS};v1",
        lambda: spark.createDataFrame(_pdf(_host_page_rows())),
    )
    d = pages.select("host", "content_id").distinct()
    sizes = d.groupBy("host").agg(F.count(F.lit(1)).alias("n_pages"))
    rare = (
        d.groupBy("content_id")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _Q97_DF_CAP))
        .select("content_id")
    )
    dr = d.join(F.broadcast(rare), "content_id")
    a = dr.select(F.col("host").alias("host_a"), "content_id")
    b = dr.select(F.col("host").alias("host_b"), "content_id")
    pairs = (
        a.join(b, "content_id")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= _Q97_MIN_SHARED)
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n_pages").alias("size_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n_pages").alias("size_b"))
    return (
        pairs.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "size_a",
            "size_b",
            F.expr("shared * 1000 div (size_a + size_b - shared)").alias("jaccard_milli"),
        )
        .orderBy("host_a", "host_b")
    )


# ---------------------------------------------------------------------------
# q98: anchor-text aggregation — the classic web-graph signal: what
# OTHER pages call a URL is a better description than the URL itself
# (it drives both ranking and crawl prioritization). Per target URL,
# the top-3 anchors by link count plus how many distinct hosts use
# them (one host repeating an anchor 1000× is weaker evidence than
# 1000 hosts saying it once).
#
# Scale shape: one hash aggregate on (dst_url, anchor) — partial
# map-side, the key is uniform — then a top-3 window partitioned by
# dst_url. The window key is the target URL itself (cardinality ~the
# corpus, no hot key), the same per-key-rank shape q78 uses; total
# order (n_links DESC, anchor) makes rank deterministic. Host
# extraction is one JVM regexp — no UDF.
# ---------------------------------------------------------------------------

Q98_LINKS_PATH = "/tmp/voz_spark_q98_links"
_Q98_DSTS = 40
_Q98_HOST_RE = "https://([^/]+)/"


def _link_rows() -> list[dict]:
    """Deterministic link graph: 40 targets; target d receives
    30 + (d % 50) links from rotating source hosts with a skewed
    5-anchor vocabulary."""
    rows = []
    for d in range(_Q98_DSTS):
        vocab = ["click here", "read more", f"thread {d}", f"guide {d}", "homepage"]
        for j in range(30 + (d % 50)):
            rows.append(
                {
                    "src_url": f"https://s{j % 17}.voz.test/page/{j}",
                    "dst_url": f"https://t.voz.test/t/{d:03d}",
                    "anchor": vocab[(j * j + d) % 5],
                }
            )
    return rows


_Q98_ORACLE = f"""
WITH g AS (
  SELECT dst_url, anchor,
         COUNT(*) AS n_links,
         COUNT(DISTINCT regexp_extract(src_url, '{_Q98_HOST_RE}', 1)) AS n_hosts
  FROM read_parquet('{Q98_LINKS_PATH}/*.parquet')
  GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY dst_url ORDER BY n_links DESC, anchor) AS rank
  FROM g
)
SELECT dst_url, anchor, n_links, n_hosts, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
ORDER BY dst_url, rank
"""


@register("q98_anchor_text", oracle=_Q98_ORACLE)
def q98_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 anchor texts per target URL with link and distinct-host
    counts; one (dst, anchor) hash aggregate + a per-target rank
    window under a total order."""
    from pyspark.sql import Window

    links = _materialized(
        spark,
        Q98_LINKS_PATH,
        f"dsts={_Q98_DSTS};v1",
        lambda: spark.createDataFrame(_pdf(_link_rows())),
    )
    g = (
        links.select(
            "dst_url",
            "anchor",
            F.regexp_extract("src_url", _Q98_HOST_RE, 1).alias("src_host"),
        )
        .groupBy("dst_url", "anchor")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src_host").alias("n_hosts"),
        )
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("n_links"), "anchor")
    return (
        g.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("dst_url", "anchor", "n_links", "n_hosts", "rank")
        .orderBy("dst_url", "rank")
    )


# ---------------------------------------------------------------------------
# q99: crawler-trap detection — calendar pages, session-id rewrites,
# and faceted-search explosions generate unbounded URL sets from a
# handful of page templates; an undefended frontier drowns in them
# (the reference's fixed listing walk simply cannot see them). The
# detector collapses each path to its template (long hex runs → 'H'
# first, then digit runs → 'N') and flags hosts whose distinct-URL to
# distinct-template ratio explodes.
#
# Scale shape: template derivation is two JVM regexp_replace calls
# in-row; then two hash aggregates — (host, template) counts, then
# per-host rollup — both on uniform keys with map-side partials. The
# trap criterion is floor division (n_urls div n_templates >= K), the
# cross-engine-exact integer idiom.
# ---------------------------------------------------------------------------

Q99_CRAWLLOG_PATH = "/tmp/voz_spark_q99_crawl_log"
_Q99_TRAP_RATIO = 20


def _crawl_log_rows() -> list[dict]:
    """Two trap hosts (a calendar explosion and a session-id
    rewriter) and six healthy hosts with diverse shallow templates."""
    rows = []
    for m in range(1, 13):
        for day in range(1, 29):
            rows.append({"host": "cal.trap.test", "path": f"/cal/2024/{m}/{day}"})
    for i in range(300):
        sid = hashlib.md5(f"sid{i}".encode()).hexdigest()
        rows.append({"host": "sid.trap.test", "path": f"/forum/thread-{i % 10}?sid={sid}"})
    for h in range(6):
        for i in range(40):
            kind = ("t", "u", "tag", "faq", "help")[i % 5]
            rows.append({"host": f"h{h}.voz.test", "path": f"/{kind}/{kind}page{i}"})
    return rows


_Q99_ORACLE = f"""
WITH t AS (
  SELECT host, path,
         regexp_replace(regexp_replace(path, '[0-9a-f]{{16,}}', 'H', 'g'),
                        '[0-9]+', 'N', 'g') AS template
  FROM read_parquet('{Q99_CRAWLLOG_PATH}/*.parquet')
),
per_t AS (
  SELECT host, template, COUNT(DISTINCT path) AS n_urls
  FROM t GROUP BY 1, 2
)
SELECT host,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       COUNT(*) AS n_templates,
       CAST(MAX(n_urls) AS BIGINT) AS max_template_urls,
       (CAST(SUM(n_urls) AS BIGINT) // COUNT(*) >= {_Q99_TRAP_RATIO}) AS is_trap
FROM per_t
GROUP BY host
ORDER BY host
"""


@register("q99_trap_detection", oracle=_Q99_ORACLE)
def q99_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL-template explosion stats: a host is a trap when
    distinct URLs exceed TRAP_RATIO × distinct templates (floor
    division). Template = path with hex runs → 'H', digit runs →
    'N' — identical regexes in both engines."""
    logd = _materialized(
        spark,
        Q99_CRAWLLOG_PATH,
        f"ratio={_Q99_TRAP_RATIO};v1",
        lambda: spark.createDataFrame(_pdf(_crawl_log_rows())),
    )
    t = logd.select(
        "host",
        "path",
        F.regexp_replace(
            F.regexp_replace("path", "[0-9a-f]{16,}", "H"), "[0-9]+", "N"
        ).alias("template"),
    )
    per_t = t.groupBy("host", "template").agg(F.countDistinct("path").alias("n_urls"))
    return (
        per_t.groupBy("host")
        .agg(
            F.sum("n_urls").cast("long").alias("n_urls"),
            F.count(F.lit(1)).alias("n_templates"),
            F.max("n_urls").cast("long").alias("max_template_urls"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            "max_template_urls",
            F.expr(f"n_urls div n_templates >= {_Q99_TRAP_RATIO}").alias("is_trap"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q100: change-rate recrawl tiering — the freshness model (Cho &
# Garcia-Molina's recrawl scheduling problem): estimate each URL's
# change rate from its snapshot history and assign a recrawl tier, so
# the fetch budget concentrates on pages that actually change. The
# reference refetches every thread every run regardless of history.
#
# Scale shape: one lag window partitioned by URL (the key is the URL
# itself — uniform, no hot key; in production the history is bounded
# to the trailing K snapshots per URL so window state is O(K)), then
# one per-URL hash aggregate. change_rate is integer millis
# (changes*1000 div intervals) and the tier CASE compares millis —
# no float thresholds.
# ---------------------------------------------------------------------------

Q100_SNAPSHOTS_PATH = "/tmp/voz_spark_q100_snapshots"
_Q100_URLS = 200
_Q100_SNAPS = 9


def _snapshot_rows() -> list[dict]:
    """200 URLs × 9 snapshots in four deterministic change classes:
    never / every 4th / every 2nd / every snapshot."""
    rows = []
    for u in range(_Q100_URLS):
        period = (0, 4, 2, 1)[u % 4]
        for s in range(_Q100_SNAPS):
            version = 0 if period == 0 else s // period
            rows.append(
                {
                    "url": f"https://t.voz.test/t/{u:04d}",
                    "fetch_seq": s,
                    "content_id": f"u{u}-v{version}",
                }
            )
    return rows


_Q100_ORACLE = f"""
WITH s AS (
  SELECT url, fetch_seq, content_id,
         LAG(content_id) OVER (PARTITION BY url ORDER BY fetch_seq) AS prev
  FROM read_parquet('{Q100_SNAPSHOTS_PATH}/*.parquet')
),
r AS (
  SELECT url,
         COUNT(*) AS n_snapshots,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND content_id <> prev THEN 1 ELSE 0 END)
              AS BIGINT) AS n_changes
  FROM s GROUP BY url
)
SELECT url, n_snapshots, n_changes,
       n_changes * 1000 // (n_snapshots - 1) AS rate_milli,
       CASE WHEN n_changes * 1000 // (n_snapshots - 1) >= 900 THEN 'hot'
            WHEN n_changes * 1000 // (n_snapshots - 1) >= 400 THEN 'warm'
            WHEN n_changes * 1000 // (n_snapshots - 1) >= 100 THEN 'cool'
            ELSE 'cold' END AS tier
FROM r
ORDER BY url
"""


@register("q100_recrawl_tiers", oracle=_Q100_ORACLE)
def q100_recrawl_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL observed change rate (integer millis over snapshot
    intervals) and recrawl tier: hot ≥ 0.9, warm ≥ 0.4, cool ≥ 0.1,
    else cold. One per-URL lag window + one hash aggregate."""
    from pyspark.sql import Window

    snaps = _materialized(
        spark,
        Q100_SNAPSHOTS_PATH,
        f"urls={_Q100_URLS};snaps={_Q100_SNAPS};v1",
        lambda: spark.createDataFrame(_pdf(_snapshot_rows())),
    )
    w = Window.partitionBy("url").orderBy("fetch_seq")
    s = snaps.withColumn("prev", F.lag("content_id").over(w))
    r = s.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        F.sum(
            F.when(F.col("prev").isNotNull() & (F.col("content_id") != F.col("prev")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_changes"),
    )
    rate = F.expr("n_changes * 1000 div (n_snapshots - 1)")
    return (
        r.select(
            "url",
            "n_snapshots",
            "n_changes",
            rate.alias("rate_milli"),
            F.when(rate >= 900, "hot")
            .when(rate >= 400, "warm")
            .when(rate >= 100, "cool")
            .otherwise("cold")
            .alias("tier"),
        )
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# q101: OPIC-style page-importance for crawl prioritization (Abiteboul
# et al.'s Online Page Importance Computation / PageRank power
# iteration): each round a page distributes its importance equally
# over its out-links; the frontier fetches high-importance pages
# first. The reference crawls in pure listing order (src/main.py:
# 153-200) — no importance model at all.
#
# Cross-engine exactness: importance is INTEGER MICRO-UNITS, never a
# float. Each contribution is rank div outdeg (floor division — the
# cross-engine-exact idiom), each damping step is
# 150000 + (850 * sum) div 1000. Floor-division PageRank is the
# standard fixed-point formulation; the tiny systematic undercount vs
# IEEE is irrelevant for ORDERING and buys bit-identical results on
# any engine and any summation order (integer addition commutes; IEEE
# addition does not).
#
# Scale shape: R unrolled rounds, each ONE join (edges ⋈ ranks on the
# uniform src key; the edges side carries its outdeg, precomputed
# once) + ONE hash aggregate on dst with map-side partials. Dangling
# nodes simply leak their cash (standard OPIC behavior); zero-indegree
# nodes keep the base 150000. The DuckDB oracle unrolls the SAME R
# rounds as AS MATERIALIZED CTEs (the k-core idiom).
# ---------------------------------------------------------------------------

Q101_LINKGRAPH_PATH = "/tmp/voz_spark_q101_linkgraph"
_Q101_N = 400
_Q101_ROUNDS = 4


def _linkgraph_rows() -> list[dict]:
    """Deterministic 400-node link graph: node v links to (2v+1)%N,
    (3v+2)%N, (7v+3)%N (self-loops and duplicate targets dropped);
    every 17th node is dangling (no out-links)."""
    rows = []
    n = _Q101_N
    for v in range(n):
        if v % 17 == 0:
            continue
        for d in sorted({(2 * v + 1) % n, (3 * v + 2) % n, (7 * v + 3) % n} - {v}):
            rows.append({"src": v, "dst": d})
    return rows


def _q101_oracle() -> str:
    pre = (
        f"e AS MATERIALIZED (SELECT src, dst FROM read_parquet('{Q101_LINKGRAPH_PATH}/*.parquet')),\n"
        "od AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),\n"
        "ed AS MATERIALIZED (SELECT e.src, e.dst, od.outdeg FROM e JOIN od ON e.src = od.src),\n"
        "nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),\n"
        "r0 AS MATERIALIZED (SELECT v, CAST(1000000 AS BIGINT) AS rank FROM nodes)"
    )
    steps = [pre]
    for k in range(1, _Q101_ROUNDS + 1):
        steps.append(
            f"r{k} AS MATERIALIZED (SELECT n.v, "
            f"CAST(150000 + (850 * COALESCE(c.s, 0)) // 1000 AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT ed.dst AS v, CAST(SUM(r{k - 1}.rank // ed.outdeg) AS BIGINT) AS s "
            f"FROM ed JOIN r{k - 1} ON ed.src = r{k - 1}.v GROUP BY ed.dst) c ON n.v = c.v)"
        )
    return (
        "WITH " + ",\n".join(steps) + "\n"
        f"SELECT v AS node_id, rank AS rank_micro FROM r{_Q101_ROUNDS}\n"
        "ORDER BY rank_micro DESC, node_id"
    )


@register("q101_opic_importance", oracle=_q101_oracle())
def q101_opic_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-micro-unit PageRank/OPIC after R=4 power iterations:
    rank' = 150000 + 850·(Σ rank div outdeg) div 1000. One uniform-key
    join + one map-side-partial aggregate per round; parity vs a
    brute-force Python iteration is pinned by tests/test_crawlops.py."""
    edges = _materialized(
        spark,
        Q101_LINKGRAPH_PATH,
        f"n={_Q101_N};v1",
        lambda: spark.createDataFrame(_pdf(_linkgraph_rows())),
    )
    od = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(od, "src")
    nodes = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    r = nodes.withColumn("rank", F.lit(1000000).cast("long"))
    for _ in range(_Q101_ROUNDS):
        contribs = (
            ed.join(r, ed.src == r.v)
            .groupBy(ed.dst.alias("cv"))
            .agg(F.sum(F.expr("rank div outdeg")).alias("s"))
        )
        r = nodes.join(contribs, nodes.v == contribs.cv, "left").select(
            "v",
            F.expr("CAST(150000 + (850 * COALESCE(s, 0)) div 1000 AS BIGINT)").alias("rank"),
        )
    return (
        r.select(F.col("v").alias("node_id"), F.col("rank").alias("rank_micro"))
        .orderBy(F.desc("rank_micro"), "node_id")
    )


# ---------------------------------------------------------------------------
# q102: per-host crawl-budget apportionment — divide a round's global
# fetch budget over healthy hosts proportionally to their pending URL
# counts using the LARGEST-REMAINDER method (Hamilton apportionment):
# quota = B·w div W, then the leftover L = B − Σquota goes one unit
# each to the L largest remainders. Fully integer, so the allocation
# is exact and engine-identical, and it always sums to exactly B —
# floor-only allocation underspends, float-rounding over- or
# under-spends. Trap hosts (q99's verdict, recomputed here from the
# same crawl log) get ZERO budget: apportionment is the enforcement
# point for trap defense.
#
# Scale shape: two uniform hash aggregates (per-host counts; the
# 1-row totals), the totals broadcast back (scalar O(1) driver
# collect for the leftover count L — same bounded-domain precedent as
# the pivot-value collects), and the leftover winners come from
# TakeOrdered top-L on (remainder DESC, host) — NO global window over
# the host table, which at web scale has 10^7+ rows.
# ---------------------------------------------------------------------------

_Q102_BUDGET = 1000
_Q102_TRAP_RATIO = 20


def _q102_oracle() -> str:
    return f"""
WITH t AS (
  SELECT host, path,
         regexp_replace(regexp_replace(path, '[0-9a-f]{{16,}}', 'H', 'g'),
                        '[0-9]+', 'N', 'g') AS template
  FROM read_parquet('{Q99_CRAWLLOG_PATH}/*.parquet')
),
h AS (
  SELECT host, COUNT(DISTINCT path) AS n_urls, COUNT(DISTINCT template) AS n_templates
  FROM t GROUP BY host
),
healthy AS (
  SELECT host, n_urls FROM h WHERE n_urls // n_templates < {_Q102_TRAP_RATIO}
),
tot AS (SELECT CAST(SUM(n_urls) AS BIGINT) AS w FROM healthy),
q AS (
  SELECT host, n_urls,
         {_Q102_BUDGET} * n_urls // tot.w AS quota,
         {_Q102_BUDGET} * n_urls % tot.w AS remainder
  FROM healthy, tot
),
l AS (SELECT {_Q102_BUDGET} - CAST(SUM(quota) AS BIGINT) AS leftover FROM q),
r AS (
  SELECT q.*, ROW_NUMBER() OVER (ORDER BY remainder DESC, host) AS rn FROM q
)
SELECT r.host, r.n_urls, CAST(r.quota AS BIGINT) AS quota,
       CAST(r.remainder AS BIGINT) AS remainder,
       CAST(r.quota + CASE WHEN r.rn <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS allocated
FROM r, l
ORDER BY host
"""


@register("q102_budget_apportionment", oracle=_q102_oracle())
def q102_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 1000-fetch round budget
    over non-trap hosts, weighted by pending URL count. Σ allocated
    == budget exactly (pinned in tests); leftover winners via
    TakeOrdered top-L, no global window."""
    logd = _materialized(
        spark,
        Q99_CRAWLLOG_PATH,
        f"ratio={_Q99_TRAP_RATIO};v1",
        lambda: spark.createDataFrame(_pdf(_crawl_log_rows())),
    )
    t = logd.select(
        "host",
        "path",
        F.regexp_replace(
            F.regexp_replace("path", "[0-9a-f]{16,}", "H"), "[0-9]+", "N"
        ).alias("template"),
    )
    h = t.groupBy("host").agg(
        F.countDistinct("path").alias("n_urls"),
        F.countDistinct("template").alias("n_templates"),
    )
    healthy = h.where(F.expr(f"n_urls div n_templates < {_Q102_TRAP_RATIO}")).select(
        "host", "n_urls"
    )
    tot = healthy.agg(F.sum("n_urls").cast("long").alias("w"))
    q = healthy.crossJoin(F.broadcast(tot)).select(
        "host",
        "n_urls",
        F.expr(f"{_Q102_BUDGET} * n_urls div w").alias("quota"),
        F.expr(f"{_Q102_BUDGET} * n_urls % w").alias("remainder"),
    )
    # leftover count: O(1) scalar (one row) — the bounded driver-side
    # collect precedent; L < |hosts| by construction
    leftover = int(
        _Q102_BUDGET - q.agg(F.sum("quota").cast("long").alias("s")).collect()[0].s
    )
    winners = (
        q.orderBy(F.desc("remainder"), "host").limit(leftover).select("host")
        if leftover > 0
        else q.limit(0).select("host")
    )
    w = winners.withColumn("extra", F.lit(1))
    return (
        q.join(F.broadcast(w), "host", "left")
        .select(
            "host",
            "n_urls",
            "quota",
            "remainder",
            (F.col("quota") + F.coalesce("extra", F.lit(0))).cast("long").alias("allocated"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q107: registrable-domain (eTLD+1) extraction — politeness, budgets,
# and trap/mirror statistics must key on the REGISTRABLE domain, not
# the hostname: a.example.co.uk and b.example.co.uk are one site (and
# one rate-limit target), while user1.github.io and user2.github.io
# are different sites. That requires public-suffix-list semantics:
# the match is the LONGEST suffix present in the PSL, and an unknown
# TLD falls back to the bare last label.
#
# Scale shape: the PSL is ~10^4 rows — broadcast by construction —
# and a hostname has ≤ ~6 labels, so candidate generation is a
# bounded in-row explode (suffixes built with transform over
# sequence, all JVM-side). Longest-match is an argmax per host; the
# nested candidates of one host have strictly increasing lengths, so
# max(struct(length, suffix)) is a total order. One bounded explode +
# one broadcast join + one hash aggregate on the uniform host key.
# ---------------------------------------------------------------------------

Q107_HOSTS_PATH = "/tmp/voz_spark_q107_hosts"
Q107_PSL_PATH = "/tmp/voz_spark_q107_psl"

_Q107_PSL = [
    "com", "net", "org", "io", "uk", "co.uk", "org.uk", "test",
    "github.io", "vn", "com.vn", "edu.vn",
]


def _q107_host_rows() -> list[dict]:
    hosts = [
        "www.shop.example.co.uk",
        "a.example.co.uk",
        "example.co.uk",
        "b.example.org.uk",
        "www.example.com",
        "example.com",
        "deep.a.b.example.net",
        "user1.github.io",
        "user2.github.io",
        "www.user1.github.io",
        "forum.voz.test",
        "img1.voz.test",
        "news.example.com.vn",
        "example.edu.vn",
        "plain.vn",
        "internal.corpnet",  # unknown TLD -> fallback: last label
        "a.b.internal.corpnet",
    ]
    return [{"host": h} for h in hosts]


_Q107_ORACLE = f"""
WITH h AS (
  SELECT host, string_split(host, '.') AS labels
  FROM read_parquet('{Q107_HOSTS_PATH}/*.parquet')
),
cand AS (
  SELECT host, labels,
         UNNEST([array_to_string(labels[i:], '.') FOR i IN range(1, len(labels) + 1)]) AS sfx
  FROM h
),
m AS (
  SELECT c.host, MAX(LENGTH(c.sfx)) AS sfx_len
  FROM cand c JOIN read_parquet('{Q107_PSL_PATH}/*.parquet') p ON c.sfx = p.suffix
  WHERE LENGTH(c.host) > LENGTH(c.sfx)  -- the host itself must not BE the suffix
  GROUP BY c.host
),
best AS (
  SELECT c.host, c.sfx AS public_suffix
  FROM cand c JOIN m ON c.host = m.host AND LENGTH(c.sfx) = m.sfx_len
  JOIN read_parquet('{Q107_PSL_PATH}/*.parquet') p ON c.sfx = p.suffix
)
SELECT h2.host,
       COALESCE(b.public_suffix, regexp_extract(h2.host, '([^.]+)$', 1)) AS public_suffix,
       CASE WHEN b.public_suffix IS NULL
            THEN regexp_extract(h2.host, '([^.]+)[.][^.]+$', 1) || '.'
                 || regexp_extract(h2.host, '([^.]+)$', 1)
            ELSE regexp_extract(substr(h2.host, 1, LENGTH(h2.host) - LENGTH(b.public_suffix) - 1),
                                '([^.]+)$', 1) || '.' || b.public_suffix
       END AS registrable_domain
FROM (SELECT host FROM read_parquet('{Q107_HOSTS_PATH}/*.parquet')) h2
LEFT JOIN best b ON h2.host = b.host
ORDER BY h2.host
"""


@register("q107_registrable_domain", oracle=_Q107_ORACLE)
def q107_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-suffix-list longest-match: host → (public_suffix,
    registrable_domain); unknown TLDs fall back to the last label.
    Bounded in-row suffix explode + broadcast PSL join + per-host
    argmax on the total order (length, suffix)."""
    hosts = _materialized(
        spark,
        Q107_HOSTS_PATH,
        "hosts=v1",
        lambda: spark.createDataFrame(_pdf(_q107_host_rows())),
    )
    psl = _materialized(
        spark,
        Q107_PSL_PATH,
        f"psl={len(_Q107_PSL)};v1",
        lambda: spark.createDataFrame(_pdf([{"suffix": s} for s in _Q107_PSL])),
    )
    cand = hosts.select(
        "host",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(host, '[.]'))), "
                "i -> array_join(slice(split(host, '[.]'), i, size(split(host, '[.]'))), '.'))"
            )
        ).alias("sfx"),
    )
    best = (
        cand.join(F.broadcast(psl), cand.sfx == psl.suffix)
        .where(F.length("host") > F.length("sfx"))
        .groupBy("host")
        .agg(F.max(F.struct(F.length("sfx").alias("l"), F.col("sfx").alias("s"))).alias("mx"))
        .select("host", F.col("mx.s").alias("public_suffix"))
    )
    return (
        hosts.join(best, "host", "left")
        .select(
            "host",
            F.coalesce(
                "public_suffix", F.regexp_extract("host", r"([^.]+)$", 1)
            ).alias("public_suffix"),
            F.when(
                F.col("public_suffix").isNull(),
                F.concat(
                    F.regexp_extract("host", r"([^.]+)[.][^.]+$", 1),
                    F.lit("."),
                    F.regexp_extract("host", r"([^.]+)$", 1),
                ),
            )
            .otherwise(
                F.concat(
                    F.regexp_extract(
                        F.expr(
                            "substr(host, 1, length(host) - length(public_suffix) - 1)"
                        ),
                        r"([^.]+)$",
                        1,
                    ),
                    F.lit("."),
                    F.col("public_suffix"),
                )
            )
            .alias("registrable_domain"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q108/q109: HTML content extraction + DOM-template fingerprinting.
# The reference's entire parse stage is BeautifulSoup over rendered
# thread pages (src/thread_crawler.py, src/main.py:153-200): title,
# post text, links, image refs. q108 re-expresses that extraction
# declaratively — IDENTICAL regex programs in Spark and DuckDB (title
# tag, href/src attributes, strip-tags + whitespace-collapse for
# text) so the oracle is exact, not approximate. q109 hashes each
# page's TAG SEQUENCE into a DOM-template fingerprint: pages sharing
# a template cluster together — the DOM-level complement of q99's
# URL-template trap detector (soft-404 and boilerplate-layout
# detection key on exactly this signal).
#
# Scale shape: both are single-scan, in-row regexp programs
# (regexp_extract_all / regexp_replace — JVM codegen, no UDF, no
# explode for the counts since size() folds in-row) followed by ONE
# uniform-key hash aggregate (q109) or none at all (q108: the only
# exchange is the display sort). Pages never shuffle their HTML: q109
# aggregates 32-char fingerprints.
# ---------------------------------------------------------------------------

Q108_HTML_PATH = "/tmp/voz_spark_q108_html"
_Q108_N = 120


def _html_rows() -> list[dict]:
    """Deterministic thread-page corpus: 3 page templates (thread,
    listing, profile) across 6 hosts; thread pages carry posts with
    links and images, every 4th page gains an extra quote block."""
    rows = []
    for i in range(_Q108_N):
        host = f"h{i % 6}.voz.test"
        kind = ("thread", "listing", "profile")[i % 3]
        posts = []
        if kind == "thread":
            for p in range(2 + i % 3):
                posts.append(
                    f'<div class="post"><p>Post {p} of page {i} says building pc '
                    f'needs budget {10 + (i * 7 + p) % 40} million</p>'
                    f'<a href="https://{host}/t/{i:03d}?p={p}">link{p}</a>'
                    f'<img src="https://img.voz.test/i/{i}_{p}.png"/></div>'
                )
            if i % 4 == 0:
                posts.append('<blockquote><p>quoted earlier reply</p></blockquote>')
        elif kind == "listing":
            for t in range(4):
                posts.append(f'<li><a href="https://{host}/t/{i * 10 + t:04d}">thread {t}</a></li>')
        else:
            posts.append(f'<div class="bio"><p>member since 202{i % 4}</p></div>')
        html = (
            f'<html><head><title>voz {kind} page {i:03d}</title></head>'
            f'<body><nav><a href="https://{host}/">home</a></nav>'
            + "".join(posts)
            + "</body></html>"
        )
        rows.append({"url": f"https://{host}/{kind}/{i:03d}", "html": html})
    return rows


_Q108_ORACLE = f"""
WITH x AS (
  SELECT url,
         regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
         len(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS n_links,
         len(regexp_extract_all(html, '<img src="([^"]*)"', 1)) AS n_images,
         trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                             '[ ]+', ' ', 'g')) AS text
  FROM read_parquet('{Q108_HTML_PATH}/*.parquet')
)
SELECT url, title,
       CAST(n_links AS BIGINT) AS n_links,
       CAST(n_images AS BIGINT) AS n_images,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       md5(text) AS text_md5
FROM x
ORDER BY url
"""


@register("q108_html_extract", oracle=_Q108_ORACLE)
def q108_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title / link count / image count / tag-stripped text per page —
    the reference's BeautifulSoup stage as one in-row regexp program;
    text compared by md5, counts fold in-row via size()."""
    pages = _materialized(
        spark,
        Q108_HTML_PATH,
        f"n={_Q108_N};v1",
        lambda: spark.createDataFrame(_pdf(_html_rows())),
    )
    text = F.trim(
        F.regexp_replace(F.regexp_replace("html", "<[^>]+>", " "), "[ ]+", " ")
    )
    return (
        pages.select(
            "url",
            F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
            F.size(F.regexp_extract_all("html", F.lit(r'href="([^"]*)"'), 1))
            .cast("long")
            .alias("n_links"),
            F.size(F.regexp_extract_all("html", F.lit(r'<img src="([^"]*)"'), 1))
            .cast("long")
            .alias("n_images"),
            F.size(F.split(text, " ")).cast("long").alias("n_words"),
            F.md5(text).alias("text_md5"),
        )
        .orderBy("url")
    )


_Q109_ORACLE = f"""
WITH t AS (
  SELECT url,
         regexp_extract(url, 'https://([^/]+)/', 1) AS host,
         md5(array_to_string(regexp_extract_all(html, '<([a-z]+)[^>]*>', 1), ',')) AS template_md5
  FROM read_parquet('{Q108_HTML_PATH}/*.parquet')
)
SELECT template_md5,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT host) AS n_hosts
FROM t
GROUP BY template_md5
HAVING COUNT(*) >= 2
ORDER BY n_pages DESC, template_md5
"""


@register("q109_dom_templates", oracle=_Q109_ORACLE)
def q109_dom_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM-template clusters: pages grouped by the md5 of their
    opening-tag sequence. One in-row fingerprint + one hash aggregate
    on the uniform 32-char key — the HTML never shuffles."""
    pages = _materialized(
        spark,
        Q108_HTML_PATH,
        f"n={_Q108_N};v1",
        lambda: spark.createDataFrame(_pdf(_html_rows())),
    )
    t = pages.select(
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("host"),
        F.md5(
            F.array_join(
                F.expr("regexp_extract_all(html, '<([a-z]+)[^>]*>', 1)"), ","
            )
        ).alias("template_md5"),
    )
    return (
        t.groupBy("template_md5")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .where(F.col("n_pages") >= 2)
        .orderBy(F.desc("n_pages"), "template_md5")
    )


# ---------------------------------------------------------------------------
# q110/q111: the robots.txt stack — raw file parsing and effective-
# permission evaluation. The frontier's B9 stage consumes a compiled
# (host, path_prefix, allowed) TABLE (frontier.py:276-308); these two
# close the loop from raw fetched robots.txt text to that table and
# to per-URL verdicts. The reference never parses robots at all
# (src/browser.py:40-44 — it evades).
#
# q110 parse semantics (the spec's tricky bits, both engines):
# - a BLOCK starts at a User-agent line whose PREVIOUS meaningful
#   line is not a User-agent line ("User-agent: a\nUser-agent: b\n
#   Disallow: /x" applies /x to BOTH a and b) — gaps-and-islands via
#   lag + running sum, one window partitioning reused for both;
# - comments (#) and blank lines are dropped before grouping;
# - Sitemap is host-global (user_agent ''), not block-scoped;
# - directives before any User-agent line are invalid and dropped.
#
# q111 evaluation semantics (Google's documented rules): use the most
# specific matching agent group (vozbot if present, else *); among
# matching Allow/Disallow rules the LONGEST path wins; at equal
# length Allow beats Disallow; no matching rule → allowed.
#
# Scale shape: q110 is split+posexplode (bounded per-file fan-out) +
# two windows sharing one hashpartitioning(host) exchange + a 1:few
# block join. q111 broadcasts the rule table (robots rules are tiny
# relative to candidate URLs — the same asymmetry B9 exploits) and
# resolves the winner with ONE hash aggregate: argmax over the
# (match_len, is_allow, rule_path) total order — no window over the
# candidate table.
# ---------------------------------------------------------------------------

Q110_ROBOTS_PATH = "/tmp/voz_spark_q110_robots"
Q111_CAND_PATH = "/tmp/voz_spark_q111_cands"


def _robots_rows() -> list[dict]:
    rows = []
    for h in range(8):
        host = f"h{h}.voz.test"
        lines = [f"# robots for {host}", "User-agent: *"]
        if h % 3 == 2:
            lines.append("Disallow: /")
        else:
            lines += ["Disallow: /private/", "Allow: /private/pub/"]
        if h == 4:  # a host WITHOUT a vozbot group, so * applies
            lines += ["Allow: /dup/", "Disallow: /dup/"]
        lines.append(f"Crawl-delay: {1 + h % 3}")
        lines.append("")
        if h % 3 != 1:
            lines.append("User-agent: vozbot")
            if h % 2 == 0:
                lines.append("User-agent: altbot")
            lines += ["Disallow: /vozbot-only/", "Allow: /"]
            lines.append("")
        lines.append(f"Sitemap: https://{host}/sitemap.xml")
        rows.append({"host": host, "robots_txt": "\n".join(lines)})
    return rows


def _cand_rows() -> list[dict]:
    paths = ["/", "/ok/page", "/private/x", "/private/pub/y", "/vozbot-only/z", "/dup/x"]
    return [{"host": f"h{h}.voz.test", "path": p} for h in range(8) for p in paths]


_Q110_PARSE_DUCK = f"""
raw AS (
  SELECT host, string_split(robots_txt, chr(10)) AS ls
  FROM read_parquet('{Q110_ROBOTS_PATH}/*.parquet')
),
ln AS (
  SELECT host, UNNEST(range(1, len(ls) + 1)) AS line_no, trim(UNNEST(ls)) AS line
  FROM raw
),
ml AS (
  SELECT host, line_no,
         lower(trim(substr(line, 1, strpos(line, ':') - 1))) AS rule_type,
         trim(substr(line, strpos(line, ':') + 1)) AS value
  FROM ln
  WHERE line <> '' AND substr(line, 1, 1) <> '#' AND strpos(line, ':') > 0
),
b AS (
  SELECT *,
         CASE WHEN rule_type = 'user-agent' AND COALESCE(
                LAG(rule_type) OVER (PARTITION BY host ORDER BY line_no), ''
              ) <> 'user-agent' THEN 1 ELSE 0 END AS block_start
  FROM ml
),
g AS (
  SELECT *, SUM(block_start) OVER (
           PARTITION BY host ORDER BY line_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_id
  FROM b
),
uas AS (
  SELECT host, block_id, value AS user_agent FROM g WHERE rule_type = 'user-agent'
),
dirs AS (
  SELECT host, block_id, line_no, rule_type, value FROM g
  WHERE rule_type IN ('disallow', 'allow', 'crawl-delay') AND block_id >= 1
)
"""

_Q110_ORACLE = f"""
WITH {_Q110_PARSE_DUCK},
flat AS (
  SELECT d.host, u.user_agent, d.line_no, d.rule_type, d.value
  FROM dirs d JOIN uas u ON d.host = u.host AND d.block_id = u.block_id
  UNION ALL
  SELECT host, '' AS user_agent, line_no, rule_type, value
  FROM g WHERE rule_type = 'sitemap'
)
SELECT host, user_agent, CAST(line_no AS BIGINT) AS seq, rule_type, value
FROM flat
ORDER BY host, user_agent, seq
"""


def _parsed_robots(spark: SparkSession) -> DataFrame:
    """Shared q110 parse pipeline: returns the g/uas/dirs equivalent
    as three named columns stages folded into one DataFrame of
    meaningful lines with block ids."""
    from pyspark.sql import Window

    robots = _materialized(
        spark,
        Q110_ROBOTS_PATH,
        "robots=v2",
        lambda: spark.createDataFrame(_pdf(_robots_rows())),
    )
    ln = robots.select(
        "host", F.posexplode(F.split("robots_txt", "\n")).alias("pos0", "raw")
    ).select("host", (F.col("pos0") + 1).alias("line_no"), F.trim("raw").alias("line"))
    ml = ln.where(
        (F.col("line") != "")
        & (F.substring("line", 1, 1) != "#")
        & (F.expr("instr(line, ':')") > 0)
    ).select(
        "host",
        "line_no",
        F.lower(F.trim(F.expr("substr(line, 1, instr(line, ':') - 1)"))).alias("rule_type"),
        F.trim(F.expr("substr(line, instr(line, ':') + 1)")).alias("value"),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    b = ml.withColumn(
        "block_start",
        (
            (F.col("rule_type") == "user-agent")
            & (F.coalesce(F.lag("rule_type").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    )
    return b.withColumn(
        "block_id",
        F.sum("block_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


@register("q110_robots_parse", oracle=_Q110_ORACLE)
def q110_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw robots.txt → flat rule rows (host, user_agent, seq,
    rule_type, value): multi-UA blocks fan out to every agent in the
    block, Sitemap lines are host-global, pre-block directives drop."""
    g = _parsed_robots(spark)
    uas = g.where(F.col("rule_type") == "user-agent").select(
        "host", "block_id", F.col("value").alias("user_agent")
    )
    dirs = g.where(
        F.col("rule_type").isin("disallow", "allow", "crawl-delay")
        & (F.col("block_id") >= 1)
    ).select("host", "block_id", "line_no", "rule_type", "value")
    flat = dirs.join(uas, ["host", "block_id"]).select(
        "host", "user_agent", "line_no", "rule_type", "value"
    )
    sitemaps = g.where(F.col("rule_type") == "sitemap").select(
        "host", F.lit("").alias("user_agent"), "line_no", "rule_type", "value"
    )
    return (
        flat.unionByName(sitemaps)
        .select("host", "user_agent", F.col("line_no").cast("long").alias("seq"), "rule_type", "value")
        .orderBy("host", "user_agent", "seq")
    )


_Q111_UA = "vozbot"

_Q111_ORACLE = f"""
WITH {_Q110_PARSE_DUCK},
rules AS (
  SELECT d.host, u.user_agent, d.rule_type, d.value AS rule_path
  FROM dirs d JOIN uas u ON d.host = u.host AND d.block_id = u.block_id
  WHERE d.rule_type IN ('allow', 'disallow') AND u.user_agent IN ('*', '{_Q111_UA}')
),
pick AS (
  SELECT host, MAX(CASE WHEN user_agent = '{_Q111_UA}' THEN 2 ELSE 1 END) AS ua_rank
  FROM rules GROUP BY host
),
eff AS (
  SELECT r.* FROM rules r JOIN pick p ON r.host = p.host
  AND (CASE WHEN r.user_agent = '{_Q111_UA}' THEN 2 ELSE 1 END) = p.ua_rank
),
c AS (SELECT host, path FROM read_parquet('{Q111_CAND_PATH}/*.parquet')),
m AS (
  SELECT c.host, c.path, e.rule_type, e.rule_path,
         LENGTH(e.rule_path) AS mlen,
         CASE WHEN e.rule_type = 'allow' THEN 1 ELSE 0 END AS is_allow
  FROM c JOIN eff e ON c.host = e.host
  WHERE substr(c.path, 1, LENGTH(e.rule_path)) = e.rule_path
),
win AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY host, path
           ORDER BY mlen DESC, is_allow DESC, rule_path DESC) AS rn
  FROM m
)
SELECT c.host, c.path,
       COALESCE(w.is_allow = 1, TRUE) AS allowed,
       COALESCE(w.rule_path, '') AS matched_rule,
       CAST(COALESCE(w.mlen, 0) AS BIGINT) AS matched_len
FROM c LEFT JOIN (SELECT * FROM win WHERE rn = 1) w
  ON c.host = w.host AND c.path = w.path
ORDER BY c.host, c.path
"""


@register("q111_robots_effective", oracle=_Q111_ORACLE)
def q111_robots_effective(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(host, path) crawl verdict for our agent under Google
    semantics: most specific agent group, longest matching rule wins,
    Allow beats Disallow on ties, default allowed. Rules broadcast;
    the winner is one argmax aggregate — no candidate-table window."""
    g = _parsed_robots(spark)
    uas = g.where(F.col("rule_type") == "user-agent").select(
        "host", "block_id", F.col("value").alias("user_agent")
    )
    rules = (
        g.where(F.col("rule_type").isin("allow", "disallow"))
        .join(uas, ["host", "block_id"])
        .where(F.col("user_agent").isin("*", _Q111_UA))
        .select(
            "host",
            "user_agent",
            "rule_type",
            F.col("value").alias("rule_path"),
            F.when(F.col("user_agent") == _Q111_UA, 2).otherwise(1).alias("ua_rank"),
        )
    )
    pick = rules.groupBy("host").agg(F.max("ua_rank").alias("mx_rank"))
    eff = rules.join(F.broadcast(pick), "host").where(F.col("ua_rank") == F.col("mx_rank"))
    cands = _materialized(
        spark,
        Q111_CAND_PATH,
        "cands=v1",
        lambda: spark.createDataFrame(_pdf(_cand_rows())),
    )
    m = (
        cands.join(F.broadcast(eff), "host")
        .where(F.expr("substr(path, 1, length(rule_path)) = rule_path"))
        .groupBy("host", "path")
        .agg(
            F.max(
                F.struct(
                    F.length("rule_path").alias("mlen"),
                    F.when(F.col("rule_type") == "allow", 1).otherwise(0).alias("is_allow"),
                    F.col("rule_path").alias("rp"),
                )
            ).alias("mx")
        )
    )
    return (
        cands.join(m, ["host", "path"], "left")
        .select(
            "host",
            "path",
            F.coalesce(F.col("mx.is_allow") == 1, F.lit(True)).alias("allowed"),
            F.coalesce(F.col("mx.rp"), F.lit("")).alias("matched_rule"),
            F.coalesce(F.col("mx.mlen"), F.lit(0)).cast("long").alias("matched_len"),
        )
        .orderBy("host", "path")
    )


# ---------------------------------------------------------------------------
# q112: soft-404 detection — pages that answer HTTP 200 but are error
# pages ("not found", "removed") rendered through a site template.
# Per-page text matching alone misses localized/renamed variants; the
# DOM-template signal (q109) propagates the verdict: if at least half
# of a template cluster's pages carry an error marker, EVERY page of
# that cluster is a soft-404 — including the ones whose text shows no
# marker. A crawl that stores soft-404s corrupts both its corpus and
# its seen-set (the URL looks "done" but yielded nothing).
#
# Scale shape: fingerprint + marker flag fold in-row on the scan; one
# hash aggregate on the uniform template key; the per-cluster verdict
# (a tiny table — templates, not pages) broadcasts back onto the page
# rows. The majority rule is integer (2·n_err >= n_pages).
# ---------------------------------------------------------------------------

Q112_PAGES_PATH = "/tmp/voz_spark_q112_soft404"
_Q112_ERR_RE = "(not found|no longer exists|has been removed)"


def _soft404_rows() -> list[dict]:
    """30 content pages (2 templates) + 18 soft-404 pages (1 error
    template): 12 carry an English error marker, 6 are the localized
    variant with NO marker — only the cluster rule can catch those."""
    rows = []
    for i in range(30):
        host = f"h{i % 6}.voz.test"
        body = f"<div><p>thread {i} real content about building pc</p></div>"
        if i % 2 == 0:
            body += f'<a href="https://{host}/t/{i}">next</a>'
        rows.append(
            {
                "url": f"https://{host}/t/{i:03d}",
                "html": f"<html><head><title>t{i}</title></head><body>{body}</body></html>",
            }
        )
    for i in range(18):
        host = f"h{i % 6}.voz.test"
        msg = (
            "oops this page has been removed by a moderator"
            if i % 3 != 2
            else f"trang nay khong ton tai so {i}"  # localized: no marker
        )
        rows.append(
            {
                "url": f"https://{host}/t/gone{i:03d}",
                "html": (
                    "<html><head><title>error</title></head>"
                    f"<body><section><em>{msg}</em></section></body></html>"
                ),
            }
        )
    return rows


_Q112_ORACLE = f"""
WITH t AS (
  SELECT url,
         md5(array_to_string(regexp_extract_all(html, '<([a-z]+)[^>]*>', 1), ',')) AS template_md5,
         regexp_matches(lower(html), '{_Q112_ERR_RE}') AS own_err_text
  FROM read_parquet('{Q112_PAGES_PATH}/*.parquet')
),
c AS (
  SELECT template_md5,
         COUNT(*) AS n_pages,
         CAST(SUM(CASE WHEN own_err_text THEN 1 ELSE 0 END) AS BIGINT) AS n_err
  FROM t GROUP BY template_md5
)
SELECT t.url, t.template_md5, t.own_err_text,
       (2 * c.n_err >= c.n_pages) AS is_soft404
FROM t JOIN c ON t.template_md5 = c.template_md5
WHERE 2 * c.n_err >= c.n_pages
ORDER BY t.url
"""


@register("q112_soft404_pages", oracle=_Q112_ORACLE)
def q112_soft404_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages flagged soft-404 because their DOM-template cluster is
    error-dominated (2·n_err >= n_pages) — catches localized error
    pages whose own text carries no marker."""
    pages = _materialized(
        spark,
        Q112_PAGES_PATH,
        "soft404=v1",
        lambda: spark.createDataFrame(_pdf(_soft404_rows())),
    )
    t = pages.select(
        "url",
        F.md5(
            F.array_join(F.expr("regexp_extract_all(html, '<([a-z]+)[^>]*>', 1)"), ",")
        ).alias("template_md5"),
        F.expr(f"lower(html) rlike '{_Q112_ERR_RE}'").alias("own_err_text"),
    )
    c = t.groupBy("template_md5").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("own_err_text").cast("int")).cast("long").alias("n_err"),
    )
    flagged = c.where(2 * F.col("n_err") >= F.col("n_pages")).select("template_md5")
    return (
        t.join(F.broadcast(flagged), "template_md5")
        .select("url", "template_md5", "own_err_text", F.lit(True).alias("is_soft404"))
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# q113: joint multimodal dedup — collapse (image, caption) PAIRS only
# when BOTH modalities agree: visually near-duplicate (banded pHash,
# q61's rule) AND caption edit distance small. Image-only dedup (q61)
# would merge re-used stock visuals with genuinely different text
# (q67's label-noise pairs — those must be ROUTED, not merged); the
# joint rule is the safe-collapse criterion a multimodal corpus needs.
#
# Scale shape: pair generation is q61's banded LSH (one shuffle on
# the band key, per-bucket cap); captions join back onto the
# candidate pairs (pairs ≪ corpus, so the caption lookup is the small
# side), and levenshtein is one in-row JVM expression. Captions in
# this fixture are ASCII by construction: Spark's levenshtein counts
# codepoints while DuckDB's counts bytes, so cross-engine exactness
# requires 1-byte characters — documented, and the general case would
# pre-fold captions to a normalized ASCII form first.
# ---------------------------------------------------------------------------

Q113_MM_PATH = "/tmp/voz_spark_q113_mm"
_Q113_LEV_MAX = 10


def _mm_rows() -> list[dict]:
    from voz_spark import synth

    rows = []
    for i in range(560):
        own = f"photo of pc build number {i} with part code {(i * i) % 997}"
        if i % 7 == 3 and i > 0:
            # visually near-dup of i-1 (synth pattern rule). Captions:
            # half are edit-variants (joint dup), half unrelated
            # (q67-style label noise -> must NOT merge)
            cap = (
                f"photo of pc build number {i - 1} with part code {((i - 1) * (i - 1)) % 997} copy"
                if i % 14 == 3
                else f"unrelated stock banner art slide {i} promo"
            )
        else:
            cap = own
        rows.append({"image_id": synth.image_id(i), "phash": synth.image_phash(i), "caption": cap})
    return rows


def _q113_oracle() -> str:
    from voz_spark.imagedup import _HAMMING_MAX, _capped_pairs_sql

    return f"""
WITH p AS (SELECT image_id, phash FROM read_parquet('{Q113_MM_PATH}/*.parquet')),
{_capped_pairs_sql()},
cap AS (SELECT image_id, caption FROM read_parquet('{Q113_MM_PATH}/*.parquet'))
SELECT c.id_a, c.id_b,
       CAST(bit_count(xor(c.ph_a, c.ph_b)) AS INT) AS hamming,
       CAST(levenshtein(ca.caption, cb.caption) AS INT) AS caption_lev
FROM cand c
JOIN cap ca ON c.id_a = ca.image_id
JOIN cap cb ON c.id_b = cb.image_id
WHERE bit_count(xor(c.ph_a, c.ph_b)) <= {_HAMMING_MAX}
  AND levenshtein(ca.caption, cb.caption) <= {_Q113_LEV_MAX}
ORDER BY id_a, id_b
"""


@register("q113_multimodal_dedup", oracle=_q113_oracle())
def q113_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-collapse pairs: near-dup image (banded pHash, hamming <=
    10) AND near-dup caption (levenshtein <= 10). Label-noise pairs
    (same visual, unrelated caption) are excluded by construction."""
    from voz_spark.imagedup import _neardup_pairs

    mm = _materialized(
        spark,
        Q113_MM_PATH,
        f"n=560;lev={_Q113_LEV_MAX};v1",
        lambda: spark.createDataFrame(_pdf(_mm_rows())),
    )
    pairs = _neardup_pairs(mm.select("image_id", "phash"))
    ca = mm.select(F.col("image_id").alias("id_a"), F.col("caption").alias("cap_a"))
    cb = mm.select(F.col("image_id").alias("id_b"), F.col("caption").alias("cap_b"))
    return (
        pairs.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn("caption_lev", F.levenshtein("cap_a", "cap_b").cast("int"))
        .where(F.col("caption_lev") <= _Q113_LEV_MAX)
        .select("id_a", "id_b", "hamming", "caption_lev")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q116: corpus-version diff — the release-notes report between two
# corpus snapshots: per doc_id, added / removed / changed (content
# hash moved) / unchanged, with token accounting. q93's MERGE builds
# the new version; this op EXPLAINS it — the reconciliation report
# every dataset release ships with. The shape is a FULL OUTER join,
# the one join kind the rest of the registry doesn't exercise.
#
# Scale shape: one full-outer sort-merge join on the uniform doc_id
# key, status derived in-row from null-sides + hash equality, then a
# 4-row rollup with map-side partials. No window, no second pass.
# ---------------------------------------------------------------------------

Q116_V1_PATH = "/tmp/voz_spark_q116_v1"
Q116_V2_PATH = "/tmp/voz_spark_q116_v2"


def _corpus_version_rows(version: int):
    rows = []
    for d in range(400):
        in_v1 = d % 10 != 9  # 10% of ids only exist in v2 (added)
        in_v2 = d % 10 != 4  # 10% of v1 removed in v2
        changed = d % 5 == 2
        if version == 1 and in_v1:
            rows.append({"doc_id": d, "content_id": f"c{d}-v1", "n_tokens": 100 + d % 50})
        if version == 2 and in_v2:
            cid = f"c{d}-v2" if changed else f"c{d}-v1"
            rows.append({"doc_id": d, "content_id": cid, "n_tokens": 100 + d % 50 + (7 if changed else 0)})
    return rows


_Q116_ORACLE = f"""
WITH v1 AS (SELECT * FROM read_parquet('{Q116_V1_PATH}/*.parquet')),
v2 AS (SELECT * FROM read_parquet('{Q116_V2_PATH}/*.parquet')),
j AS (
  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
         CASE WHEN v1.doc_id IS NULL THEN 'added'
              WHEN v2.doc_id IS NULL THEN 'removed'
              WHEN v1.content_id <> v2.content_id THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(v1.n_tokens, 0) AS t1,
         COALESCE(v2.n_tokens, 0) AS t2
  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
)
SELECT status, COUNT(*) AS n_docs,
       CAST(SUM(t1) AS BIGINT) AS tokens_v1,
       CAST(SUM(t2) AS BIGINT) AS tokens_v2,
       CAST(SUM(t2) - SUM(t1) AS BIGINT) AS token_delta
FROM j
GROUP BY status
ORDER BY status
"""


@register("q116_corpus_diff", oracle=_Q116_ORACLE)
def q116_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: full-outer join of two corpus versions
    on doc_id, per-status doc and token accounting."""
    v1 = _materialized(
        spark, Q116_V1_PATH, "v1", lambda: spark.createDataFrame(_pdf(_corpus_version_rows(1)))
    ).select(
        F.col("doc_id").alias("id1"), F.col("content_id").alias("c1"), F.col("n_tokens").alias("t1")
    )
    v2 = _materialized(
        spark, Q116_V2_PATH, "v2", lambda: spark.createDataFrame(_pdf(_corpus_version_rows(2)))
    ).select(
        F.col("doc_id").alias("id2"), F.col("content_id").alias("c2"), F.col("n_tokens").alias("t2")
    )
    j = v1.join(v2, v1.id1 == v2.id2, "full_outer").select(
        F.when(F.col("id1").isNull(), "added")
        .when(F.col("id2").isNull(), "removed")
        .when(F.col("c1") != F.col("c2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce("t1", F.lit(0)).alias("t1"),
        F.coalesce("t2", F.lit(0)).alias("t2"),
    )
    return (
        j.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t1").cast("long").alias("tokens_v1"),
            F.sum("t2").cast("long").alias("tokens_v2"),
            (F.sum("t2") - F.sum("t1")).cast("long").alias("token_delta"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# q117: URL canonicalization (the SQL-expressible core of B1, made
# oracle-checkable): lowercase scheme+host ONLY (paths are
# case-sensitive), strip default ports (:80 for http, :443 for
# https), DROP tracking parameters (utm_*, fbclid), SORT the
# surviving query parameters, and drop an empty '?'. Without this,
# one page lives under dozens of frontier keys and every downstream
# per-URL state splits.
#
# Scale shape: everything is in-row — regexp_extract for the parts,
# split + filter + array_sort + array_join for the query string; no
# UDF, no shuffle but the display sort. (The engine's production path
# additionally handles percent-encoding via its null-gated pandas UDF
# — frontier.py:88-139; this op is the declarative subset both
# engines can verify exactly.)
# ---------------------------------------------------------------------------

Q117_URLS_PATH = "/tmp/voz_spark_q117_urls"


def _messy_url_rows() -> list[dict]:
    urls = [
        "HTTP://Voz.Test:80/t/123?utm_source=fb&b=2&a=1",
        "http://voz.test/t/123?a=1&b=2",
        "HTTPS://IMG.Voz.Test:443/i/9?fbclid=XYZ",
        "https://img.voz.test/i/9",
        "https://voz.test/CaseSensitive/Path?z=9&y=8&utm_campaign=x",
        "http://voz.test:8080/alt-port?a=1",
        "https://voz.test/t/7?",
        "http://voz.test/t/55?utm_source=a&utm_medium=b&fbclid=c",
        "https://a.voz.test/p?m=1&M=2",
        "http://voz.test:80/",
    ]
    return [{"url": u} for u in urls]


_Q117_ORACLE = f"""
WITH u AS (
  SELECT url,
         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z]+://([^/?]*)', 1)) AS hostport,
         regexp_extract(url, '^[A-Za-z]+://[^/?]*([^?]*)', 1) AS path,
         CASE WHEN strpos(url, '?') > 0 THEN substr(url, strpos(url, '?') + 1) ELSE '' END AS qs
  FROM read_parquet('{Q117_URLS_PATH}/*.parquet')
),
n AS (
  SELECT url, scheme,
         CASE WHEN scheme = 'http'  THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END AS host,
         path,
         COALESCE(array_to_string(list_sort([p FOR p IN string_split(qs, '&')
            IF p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid)=')]), '&'), '') AS cq
  FROM u
)
SELECT url,
       scheme || '://' || host || path || CASE WHEN cq <> '' THEN '?' || cq ELSE '' END AS canon_url,
       CAST(CASE WHEN cq = '' THEN 0 ELSE len(string_split(cq, '&')) END AS BIGINT) AS n_params_kept,
       (url <> scheme || '://' || host || path ||
        CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS was_changed
FROM n
ORDER BY url
"""


@register("q117_url_canonicalize", oracle=_Q117_ORACLE)
def q117_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative URL canonicalization: lowercase scheme+host, strip
    default ports, drop tracking params, sort the rest, drop empty
    '?'. All in-row array/string expressions."""
    urls = _materialized(
        spark,
        Q117_URLS_PATH,
        "urls=v1",
        lambda: spark.createDataFrame(_pdf(_messy_url_rows())),
    )
    scheme = F.lower(F.regexp_extract("url", "^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract("url", "^[A-Za-z]+://([^/?]*)", 1))
    path = F.regexp_extract("url", "^[A-Za-z]+://[^/?]*([^?]*)", 1)
    qs = F.when(
        F.expr("instr(url, '?')") > 0, F.expr("substr(url, instr(url, '?') + 1)")
    ).otherwise("")
    u = urls.select(
        "url", scheme.alias("scheme"), hostport.alias("hostport"), path.alias("path"), qs.alias("qs")
    )
    host = (
        F.when(F.col("scheme") == "http", F.regexp_replace("hostport", ":80$", ""))
        .when(F.col("scheme") == "https", F.regexp_replace("hostport", ":443$", ""))
        .otherwise(F.col("hostport"))
    )
    cq = F.array_join(
        F.array_sort(
            F.expr(
                "filter(split(qs, '&'), p -> p != '' AND NOT p rlike '^(utm_[a-z]+|fbclid)=')"
            )
        ),
        "&",
    )
    n = u.select("url", "scheme", host.alias("host"), "path", cq.alias("cq"))
    canon = F.concat(
        F.col("scheme"),
        F.lit("://"),
        F.col("host"),
        F.col("path"),
        F.when(F.col("cq") != "", F.concat(F.lit("?"), F.col("cq"))).otherwise(""),
    )
    return (
        n.select(
            "url",
            canon.alias("canon_url"),
            F.when(F.col("cq") == "", 0)
            .otherwise(F.size(F.split("cq", "&")))
            .cast("long")
            .alias("n_params_kept"),
            (F.col("url") != canon).alias("was_changed"),
        )
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# q125: host fetch-health + adaptive backoff tiers — the feedback
# loop the politeness scheduler (B4) needs: a host answering 5xx or
# timing out should see its rate cut BEFORE it blocks the crawl. Per
# host: error rate in integer millis, the LONGEST consecutive-failure
# streak (gaps-and-islands: island id = fetch_seq minus per-status
# rank — both engines compute it identically), and a backoff tier
# from integer thresholds.
#
# Scale shape: one uniform-host window pass assigns island ids, then
# two host-keyed aggregates (per-island lengths → per-host max); the
# fetch log shuffles once. The fixture plants distinct failure
# patterns: healthy, intermittent (no long streak), outage (one long
# streak), dead.
# ---------------------------------------------------------------------------

Q125_FETCHLOG_PATH = "/tmp/voz_spark_q125_fetchlog"
_Q125_N_FETCH = 60


def _fetchlog_rows() -> list[dict]:
    rows = []
    patterns = {
        "ok.voz.test": lambda s: "ok",
        "flaky.voz.test": lambda s: "error" if s % 5 == 2 else "ok",  # isolated errors
        "outage.voz.test": lambda s: "error" if 20 <= s < 32 else "ok",  # one 12-streak
        "dead.voz.test": lambda s: "error",
    }
    for host, rule in patterns.items():
        for s in range(_Q125_N_FETCH):
            rows.append({"host": host, "fetch_seq": s, "status": rule(s)})
    return rows


_Q125_ORACLE = f"""
WITH f AS (
  SELECT host, fetch_seq, status,
         fetch_seq - ROW_NUMBER() OVER (PARTITION BY host, status ORDER BY fetch_seq)
           AS island
  FROM read_parquet('{Q125_FETCHLOG_PATH}/*.parquet')
),
streaks AS (
  SELECT host, island, COUNT(*) AS len
  FROM f WHERE status = 'error' GROUP BY host, island
),
mx AS (SELECT host, CAST(MAX(len) AS BIGINT) AS max_error_streak FROM streaks GROUP BY host),
h AS (
  SELECT host, COUNT(*) AS n_fetches,
         CAST(SUM(CASE WHEN status = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM f GROUP BY host
)
SELECT h.host, h.n_fetches, h.n_errors,
       h.n_errors * 1000 // h.n_fetches AS error_rate_milli,
       COALESCE(mx.max_error_streak, 0) AS max_error_streak,
       CASE WHEN h.n_errors * 1000 // h.n_fetches >= 900 THEN 'suspend'
            WHEN COALESCE(mx.max_error_streak, 0) >= 10
              OR h.n_errors * 1000 // h.n_fetches >= 300 THEN 'slow'
            WHEN h.n_errors > 0 THEN 'watch'
            ELSE 'normal' END AS backoff_tier
FROM h LEFT JOIN mx ON h.host = mx.host
ORDER BY h.host
"""


@register("q125_fetch_health", oracle=_Q125_ORACLE)
def q125_fetch_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host error rate (integer millis), longest error streak
    (gaps-and-islands), and backoff tier: suspend ≥ 90% errors, slow
    on a ≥10 streak or ≥30% rate, watch on any error, else normal."""
    from pyspark.sql import Window

    logf = _materialized(
        spark,
        Q125_FETCHLOG_PATH,
        f"n={_Q125_N_FETCH};v1",
        lambda: spark.createDataFrame(_pdf(_fetchlog_rows())),
    )
    w = Window.partitionBy("host", "status").orderBy("fetch_seq")
    f = logf.withColumn("island", F.col("fetch_seq") - F.row_number().over(w))
    mx = (
        f.where(F.col("status") == "error")
        .groupBy("host", "island")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("host")
        .agg(F.max("len").cast("long").alias("max_error_streak"))
    )
    h = f.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.sum((F.col("status") == "error").cast("int")).cast("long").alias("n_errors"),
    )
    rate = F.expr("n_errors * 1000 div n_fetches")
    streak = F.coalesce("max_error_streak", F.lit(0).cast("long"))
    return (
        h.join(mx, "host", "left")
        .select(
            "host",
            "n_fetches",
            "n_errors",
            rate.alias("error_rate_milli"),
            streak.alias("max_error_streak"),
            F.when(rate >= 900, "suspend")
            .when((streak >= 10) | (rate >= 300), "slow")
            .when(F.col("n_errors") > 0, "watch")
            .otherwise("normal")
            .alias("backoff_tier"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q132: reciprocal-link farm detection over the observed host-link
# graph — link spam's signature is pairs of hosts exchanging links at
# near-parity ("I link you, you link me") far above organic rates.
# Production crawls demote such pairs before importance propagation
# (q101 OPIC / pagerank) so farms can't pump each other's scores; the
# reference has no graph hygiene at all (it crawls one forum).
#
# The link log is derived deterministically from the events table
# (src_host = user_id mod H, dst_host = event_id mod H — a dense
# host-to-host link sample; same integer rule in both engines, so the
# fixture needs no materialization).
#
# Scale shape: ONE shuffle. Directed edges fold to the UNORDERED pair
# key (least, greatest) carrying conditional partial sums for each
# direction — map-side combine applies, no self-join of the pair table
# on its reversed key (the naive shape shuffles twice and materializes
# both orientations). The farm rule is pure integer arithmetic:
# reciprocity_milli = 1000*min(fwd,rev) div max(fwd,rev) — engine-
# exact, no float comparisons.
# ---------------------------------------------------------------------------

_Q132_H = 31  # host-space modulus
_Q132_MIN_EACH = 4  # both directions must carry at least this many links
_Q132_RECIP_MILLI = 500  # min(fwd,rev)/max(fwd,rev) >= 0.5

_Q132_ORACLE = f"""
WITH e AS (
  SELECT user_id % {_Q132_H} AS src_h, event_id % {_Q132_H} AS dst_h
  FROM events
  WHERE user_id % {_Q132_H} <> event_id % {_Q132_H}
),
p AS (
  SELECT LEAST(src_h, dst_h) AS host_a, GREATEST(src_h, dst_h) AS host_b,
         CAST(SUM(CASE WHEN src_h < dst_h THEN 1 ELSE 0 END) AS BIGINT) AS fwd,
         CAST(SUM(CASE WHEN src_h > dst_h THEN 1 ELSE 0 END) AS BIGINT) AS rev
  FROM e GROUP BY 1, 2
)
SELECT host_a, host_b, fwd, rev,
       (1000 * LEAST(fwd, rev)) // GREATEST(fwd, rev) AS recip_milli
FROM p
WHERE fwd >= {_Q132_MIN_EACH} AND rev >= {_Q132_MIN_EACH}
  AND (1000 * LEAST(fwd, rev)) // GREATEST(fwd, rev) >= {_Q132_RECIP_MILLI}
ORDER BY host_a, host_b
"""


@register("q132_link_farm_pairs", oracle=_Q132_ORACLE)
def q132_link_farm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host pairs exchanging links at near-parity (candidate link
    farms): one aggregate on the unordered pair key with directional
    partial sums; integer milli-reciprocity rule."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % _Q132_H).alias("src_h"),
        (F.col("event_id") % _Q132_H).alias("dst_h"),
    )
    pairs = (
        ev.where(F.col("src_h") != F.col("dst_h"))
        .groupBy(
            F.least("src_h", "dst_h").alias("host_a"),
            F.greatest("src_h", "dst_h").alias("host_b"),
        )
        .agg(
            F.sum(
                F.when(F.col("src_h") < F.col("dst_h"), 1).otherwise(0)
            ).cast("long").alias("fwd"),
            F.sum(
                F.when(F.col("src_h") > F.col("dst_h"), 1).otherwise(0)
            ).cast("long").alias("rev"),
        )
    )
    recip = F.expr("(1000 * least(fwd, rev)) div greatest(fwd, rev)")
    return (
        pairs.withColumn("recip_milli", recip)
        .where(
            (F.col("fwd") >= _Q132_MIN_EACH)
            & (F.col("rev") >= _Q132_MIN_EACH)
            & (F.col("recip_milli") >= _Q132_RECIP_MILLI)
        )
        .select("host_a", "host_b", "fwd", "rev", "recip_milli")
        .orderBy("host_a", "host_b")
    )


# ---------------------------------------------------------------------------
# q135: content-type sniffing — servers lie about MIME types (soft
# error pages served as image/jpeg, PDFs served as text/html), and a
# crawler that trusts the header poisons downstream decode stages. The
# gate sniffs the payload's magic bytes and flags disagreement with
# the declared Content-Type; the reference trusts the response header
# outright (src/image_processor.py:60-84). Browsers and production
# crawlers all run this check (MIME sniffing is standardised for
# exactly this reason).
#
# Fixture: (fetch_id, declared_type, head BINARY) — the first 16
# payload bytes with a deterministic true format per row; every
# idx % 13 == 4 row declares image/jpeg over an HTML error page and
# every idx % 17 == 9 declares text/html over PDF bytes.
#
# Scale shape: ZERO shuffles — hex-prefix classification is one in-row
# CASE over the scan (the q68/q131 plan class); the 16-byte head means
# the scan never reads payload bodies.
# ---------------------------------------------------------------------------

Q135_FETCH_PATH = "/tmp/voz_spark_q135_fetch"

_Q135_N = 340

# (hex prefix of the payload head, sniffed MIME type)
_Q135_MAGIC = [
    ("FFD8FF", "image/jpeg"),
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),
    ("25504446", "application/pdf"),
    ("3C21444F", "text/html"),  # "<!DO"
    ("3C68746D", "text/html"),  # "<htm"
    ("56515A31", "image/vqz"),  # the engine's own codec magic
]

_Q135_TRUE = [
    ("image/jpeg", b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x02\x03\x04\x05"),
    ("image/png", b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR"),
    ("image/gif", b"GIF89a\x10\x00\x10\x00\x80\x00\x00\x00\x00\x00"),
    ("application/pdf", b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"),
    ("text/html", b"<!DOCTYPE html><h"),
    ("image/vqz", b"VQZ1\x00\x00\x00\x10\x00\x00\x00\x10"),
]


def _q135_sniff_sql(col: str) -> str:
    """Shared CASE expression (ANSI SQL, valid in both engines): hex
    prefix of the head -> sniffed MIME type."""
    arms = " ".join(
        f"WHEN hex({col}) LIKE '{p}%' THEN '{m}'" for p, m in _Q135_MAGIC
    )
    return f"CASE {arms} ELSE 'application/octet-stream' END"


_Q135_ORACLE = f"""
WITH s AS (
  SELECT fetch_id, declared_type,
         {_q135_sniff_sql("head")} AS sniffed_type
  FROM read_parquet('{Q135_FETCH_PATH}/*.parquet')
)
SELECT fetch_id, declared_type, sniffed_type
FROM s WHERE declared_type <> sniffed_type
ORDER BY fetch_id
"""


def _q135_fetch_builder(spark: SparkSession):
    """(fetch_id, declared_type, head) rows with planted MIME lies."""

    def build():
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["id"]:
                    idx = int(i)
                    true_type, head = _Q135_TRUE[idx % len(_Q135_TRUE)]
                    declared = true_type
                    if idx % 13 == 4:
                        declared = "image/jpeg"
                        head = _Q135_TRUE[4][1]  # HTML error page bytes
                    elif idx % 17 == 9:
                        declared = "text/html"
                        head = _Q135_TRUE[3][1]  # PDF bytes
                    rows.append(
                        {
                            "fetch_id": f"f{idx:07d}",
                            "declared_type": declared,
                            "head": head[:16],
                        }
                    )
                yield pd.DataFrame(rows)

        return (
            spark.range(_Q135_N)
            .repartition(8)
            .mapInPandas(
                gen, "fetch_id string, declared_type string, head binary"
            )
        )

    return build


@register("q135_content_type_mismatch", oracle=_Q135_ORACLE)
def q135_content_type_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetches whose payload magic bytes contradict the declared
    Content-Type: in-row hex-prefix sniff, zero shuffles."""
    from voz_spark.imagedup import _materialized

    t = _materialized(
        spark,
        Q135_FETCH_PATH,
        f"n={_Q135_N};lies=13:4,17:9;v1",
        _q135_fetch_builder(spark),
    )
    return (
        t.withColumn("sniffed_type", F.expr(_q135_sniff_sql("head")))
        .where(F.col("declared_type") != F.col("sniffed_type"))
        .select("fetch_id", "declared_type", "sniffed_type")
        .orderBy("fetch_id")
    )


# ---------------------------------------------------------------------------
# q138: locale-duplicate clustering — multilingual sites serve the
# same page under /en/, /vi/, /fr/ URL variants, and untranslated
# locales are byte-identical: crawling all of them triples the corpus
# with exact duplicates that URL canonicalization (q117) cannot see
# (the URLs genuinely differ). Group by content fingerprint, keep one
# canonical URL per cluster (preferring the 'en' mirror, then the
# lexicographically smallest URL), and report the locale spread —
# the hreflang-consolidation step of a production crawl.
#
# Fixture: derived arithmetically from `documents` (page_no = doc
# index div 3, locale = index mod 3; every page_no % 10 == 7 'fr'
# variant is genuinely translated, i.e. its fingerprint differs) —
# same integer rule in both engines, so no materialization is needed.
#
# Scale shape: ONE shuffle on the content fingerprint. The canonical
# pick is a rank-prefixed MIN — a partial-combinable scalar aggregate,
# never a window — and locale spread is a bounded collect_set (|L|=3).
# ---------------------------------------------------------------------------

_Q138_LOCALES = ["en", "vi", "fr"]

_Q138_ORACLE = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i FROM documents
),
v AS (
  SELECT i // 3 AS page_no,
         CASE i % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'vi' ELSE 'fr' END AS locale,
         md5(CAST(CASE WHEN i % 3 = 2 AND (i // 3) % 10 = 7
                       THEN 1000000 + i // 3 ELSE i // 3 END AS VARCHAR)) AS fp
  FROM d
),
u AS (
  SELECT page_no, locale, fp,
         'https://site.example/' || locale || '/p/' || CAST(page_no AS VARCHAR) AS url,
         CASE WHEN locale = 'en' THEN '0' ELSE '1' END || url AS ck
  FROM v
)
SELECT fp,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       array_to_string(list_sort(list(DISTINCT locale)), ',') AS locales,
       substr(MIN(ck), 2) AS canonical_url
FROM u
GROUP BY fp
HAVING COUNT(*) > 1
ORDER BY fp
"""


@register("q138_locale_dup_clusters", oracle=_Q138_ORACLE)
def q138_locale_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locale-mirror URL clusters sharing one content fingerprint:
    one fingerprint shuffle; canonical URL via rank-prefixed MIN (no
    window), 'en' preferred."""
    from voz_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("i")
    )
    page = F.expr("i div 3")
    v = d.select(
        page.alias("page_no"),
        F.element_at(
            F.array(*[F.lit(loc) for loc in _Q138_LOCALES]),
            (F.col("i") % 3 + 1).cast("int"),
        ).alias("locale"),
        F.md5(
            F.when(
                (F.col("i") % 3 == 2) & (page % 10 == 7),
                F.lit(1_000_000) + page,
            )
            .otherwise(page)
            .cast("string")
        ).alias("fp"),
    )
    u = v.select(
        "fp",
        "locale",
        F.concat(
            F.lit("https://site.example/"),
            F.col("locale"),
            F.lit("/p/"),
            F.col("page_no").cast("string"),
        ).alias("url"),
    ).withColumn(
        "ck",
        F.concat(
            F.when(F.col("locale") == "en", F.lit("0")).otherwise(F.lit("1")),
            F.col("url"),
        ),
    )
    return (
        u.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.array_join(F.sort_array(F.collect_set("locale")), ",").alias(
                "locales"
            ),
            F.expr("substring(min(ck), 2, 2147483647)").alias("canonical_url"),
        )
        .where(F.col("n_urls") > 1)
        .select("fp", "n_urls", "locales", "canonical_url")
        .orderBy("fp")
    )


# ---------------------------------------------------------------------------
# q139: discovery-credit crawl ROI — which hosts are WORTH the fetch
# budget? Re-served content earns nothing: each distinct content
# fingerprint credits only the host that served it FIRST (smallest
# fetch id), and a host's ROI is credited-discoveries per fetch. This
# is the feedback signal q102's budget apportionment wants as its
# weight at steady state (fetch counts alone reward mirrors and
# boilerplate farms). The reference crawls a single forum and never
# asks the question.
#
# The fetch log derives arithmetically from `events` (host = user_id
# mod 23, fingerprint = md5(event_id mod 400) — 400 distinct contents
# guarantee heavy re-serving); same integer rules in both engines, no
# materialization needed.
#
# Scale shape: first-serve attribution is a MIN over a sortable
# zero-padded (fetch_id|host) string key per fingerprint — a scalar
# partial-combinable aggregate, no window, no self-join; then one
# bounded host-level rollup. Ties cannot occur (fetch ids are
# distinct per row via ROW_NUMBER-free arithmetic: the key embeds the
# host, so even equal fetch ids order deterministically).
# ---------------------------------------------------------------------------

_Q139_H = 23  # host-space modulus
_Q139_C = 400  # distinct-content modulus

_Q139_ORACLE = f"""
WITH f AS (
  SELECT user_id % {_Q139_H} AS host,
         md5(CAST(event_id % {_Q139_C} AS VARCHAR)) AS fp,
         lpad(CAST(event_id AS VARCHAR), 20, '0') || '|' ||
           CAST(user_id % {_Q139_H} AS VARCHAR) AS ck
  FROM events
),
first_serve AS (
  SELECT fp, CAST(split_part(MIN(ck), '|', 2) AS BIGINT) AS host
  FROM f GROUP BY fp
),
credits AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_discoveries
  FROM first_serve GROUP BY host
),
tot AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches FROM f GROUP BY host
)
SELECT t.host, t.n_fetches,
       COALESCE(c.n_discoveries, 0) AS n_discoveries,
       (1000 * COALESCE(c.n_discoveries, 0)) // t.n_fetches AS roi_milli
FROM tot t LEFT JOIN credits c ON t.host = c.host
ORDER BY t.host
"""


@register("q139_crawl_roi", oracle=_Q139_ORACLE)
def q139_crawl_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl ROI under first-serve discovery credit: MIN over
    a zero-padded sortable key per fingerprint (no window), then a
    bounded host rollup; integer milli-ROI."""
    from voz_spark.session import load_table

    f = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % _Q139_H).alias("host"),
        F.md5((F.col("event_id") % _Q139_C).cast("string")).alias("fp"),
        F.concat(
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
            F.lit("|"),
            (F.col("user_id") % _Q139_H).cast("string"),
        ).alias("ck"),
    )
    first_serve = f.groupBy("fp").agg(
        F.substring_index(F.min("ck"), "|", -1).cast("long").alias("host")
    )
    credits = first_serve.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_discoveries")
    )
    tot = f.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches")
    )
    return (
        tot.join(credits, "host", "left")
        .select(
            "host",
            "n_fetches",
            F.coalesce("n_discoveries", F.lit(0)).cast("long").alias(
                "n_discoveries"
            ),
            F.expr("(1000 * coalesce(n_discoveries, 0)) div n_fetches").alias(
                "roi_milli"
            ),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q142: politeness compliance audit — the frontier PLANS politeness
# (per-host budgets, synth.py pacing model); this audits what actually
# HAPPENED: per host, the observed gaps between consecutive fetches
# against the host's required crawl-delay, counting violations. The
# closed-loop check every crawl operation runs after an incident
# ("did we hammer anyone last night?"); the reference sleeps between
# requests but never verifies (src/crawler.py's time.sleep calls).
#
# Fetch log derives from `events` (host = user_id mod 11, fetch time =
# ts); required delay is host mod 5 + 1 seconds — same integer rules
# in both engines. Gaps are computed in exact integer MICROSECONDS
# (timestampdiff / date_diff both return exact integers at that
# granularity, no truncation ambiguity), so the violation rule is
# engine-exact arithmetic.
#
# Scale shape: the lag window partitions on the host — a key whose
# row count politeness itself bounds (a compliant host log grows at
# most 1/delay rows per second), so no window partition explodes; in
# production the audit shards further by (host, day) with per-shard
# boundary rows. Aggregates are partial-combinable.
# ---------------------------------------------------------------------------

_Q142_H = 11  # host-space modulus
_Q142_DELAYS = 5  # required delay = host % 5 + 1 seconds

_Q142_ORACLE = f"""
WITH f AS (
  SELECT user_id % {_Q142_H} AS host, ts, event_id FROM events
),
g AS (
  SELECT host, ts, event_id,
         date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
  FROM f
  WINDOW w AS (PARTITION BY host ORDER BY ts, event_id)
)
SELECT host,
       host % {_Q142_DELAYS} + 1 AS required_delay_s,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN gap_us < (host % {_Q142_DELAYS} + 1) * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(COALESCE(MIN(gap_us), -1) AS BIGINT) AS min_gap_us
FROM g
GROUP BY host
ORDER BY host
"""


@register("q142_politeness_audit", oracle=_Q142_ORACLE)
def q142_politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed inter-fetch gaps per host vs the required crawl-delay:
    exact integer-microsecond gaps from a host-keyed lag window,
    partial-combinable violation counts."""
    from pyspark.sql import Window

    from voz_spark.session import load_table

    f = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % _Q142_H).alias("host"), "ts", "event_id"
    )
    w = Window.partitionBy("host").orderBy("ts", "event_id")
    g = f.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    )
    delay_s = F.col("host") % _Q142_DELAYS + 1
    return (
        g.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.sum(
                F.when(
                    F.col("gap_us")
                    < (F.col("host") % _Q142_DELAYS + 1) * 1_000_000,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_violations"),
            F.coalesce(F.min("gap_us"), F.lit(-1)).cast("long").alias("min_gap_us"),
        )
        .select(
            "host",
            delay_s.alias("required_delay_s"),
            "n_fetches",
            "n_gaps",
            "n_violations",
            "min_gap_us",
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q144: srcset responsive-image consolidation — modern pages declare
# each image as a `srcset` of width variants ("url 320w, url 800w,
# ..."); fetching every variant multiplies image bandwidth by the
# variant count for zero new content. The crawler must PARSE the
# srcset and pick exactly one candidate per image: the smallest width
# >= the page's display target, else the largest available (the
# browser's own selection rule). The reference collects bare <img>
# src attributes only (src/crawler.py image extraction) and would
# fetch every variant as an independent URL.
#
# Fixture derives arithmetically from `documents`: page i declares
# k = i%4+2 width variants (a prefix of [320,480,800,1200,1600]) and
# a display target of 360 + (i%5)*160 — same integer rules in both
# engines, no materialization needed.
#
# Scale shape: selection is IN-ROW — split + transform + array_min
# over the candidate list, zero shuffles and no explode (the naive
# plan explodes 5x rows and runs a per-image window). The only
# exchange is the final bounded-key (|widths|) rollup. The pick is
# encoded as a sortable string key (direction flip via 999999-w on
# the under-target branch), the engine's windowless-argmin idiom.
# ---------------------------------------------------------------------------

_Q144_WIDTHS = "320,480,800,1200,1600"

_Q144_ORACLE = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents),
s AS (
  SELECT i, 360 + (i % 5) * 160 AS target,
         array_to_string([
           'https://cdn.example/i' || i || '-' ||
           CAST(([320,480,800,1200,1600])[j+1] AS VARCHAR) || 'w.jpg ' ||
           CAST(([320,480,800,1200,1600])[j+1] AS VARCHAR) || 'w'
           FOR j IN range(0, i % 4 + 2)], ', ') AS srcset
  FROM d
),
p AS (
  SELECT i, list_min([
           CASE WHEN CAST(regexp_extract(c, '(\\d+)w$', 1) AS INT) >= target
                THEN '0' || lpad(CAST(CAST(regexp_extract(c, '(\\d+)w$', 1) AS INT) AS VARCHAR), 6, '0')
                ELSE '1' || lpad(CAST(999999 - CAST(regexp_extract(c, '(\\d+)w$', 1) AS INT) AS VARCHAR), 6, '0')
           END || string_split(c, ' ')[1]
           FOR c IN string_split(srcset, ', ')]) AS best
  FROM s
),
c AS (
  SELECT i, substr(best, 8) AS chosen_url,
         CAST(regexp_extract(substr(best, 8), '-(\\d+)w\\.jpg$', 1) AS INT) AS chosen_w
  FROM p
)
SELECT chosen_w,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT chosen_url) AS BIGINT) AS n_urls
FROM c GROUP BY chosen_w ORDER BY chosen_w
"""


@register("q144_srcset_consolidation", oracle=_Q144_ORACLE)
def q144_srcset_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse srcset variant lists and pick one fetch per image (the
    browser rule: smallest width >= target, else largest): in-row
    split + transform + array_min — zero shuffles before the bounded
    rollup, no explode, no window."""
    from voz_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("i")
    )
    s = d.select(
        "i",
        (F.lit(360) + (F.col("i") % 5) * 160).alias("target"),
        F.expr(
            "array_join(transform(sequence(0, cast(i % 4 + 1 as int)), j -> "
            "concat('https://cdn.example/i', i, '-', "
            "cast(element_at(array(" + _Q144_WIDTHS + "), j + 1) as string), "
            "'w.jpg ', "
            "cast(element_at(array(" + _Q144_WIDTHS + "), j + 1) as string), "
            "'w')), ', ')"
        ).alias("srcset"),
    )
    best = F.expr(
        r"""array_min(transform(split(srcset, ', '), c ->
          concat(
            CASE WHEN cast(regexp_extract(c, '(\\d+)w$', 1) as int) >= target
                 THEN concat('0', lpad(cast(cast(regexp_extract(c, '(\\d+)w$', 1) as int) as string), 6, '0'))
                 ELSE concat('1', lpad(cast(999999 - cast(regexp_extract(c, '(\\d+)w$', 1) as int) as string), 6, '0'))
            END,
            substring_index(c, ' ', 1))))"""
    )
    c = (
        s.withColumn("best", best)
        .select(F.expr("substr(best, 8)").alias("chosen_url"))
        .select(
            "chosen_url",
            F.regexp_extract("chosen_url", r"-(\d+)w\.jpg$", 1)
            .cast("int")
            .alias("chosen_w"),
        )
    )
    return (
        c.groupBy("chosen_w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.countDistinct("chosen_url").cast("long").alias("n_urls"),
        )
        .orderBy("chosen_w")
    )


# ---------------------------------------------------------------------------
# q145: CDN shard-host consolidation — big sites fan the SAME image
# out over numbered shard hostnames (cdn0..cdn6.assets.example) for
# browser connection parallelism; a URL-keyed frontier treats every
# shard copy as new work, multiplying image fetches by the shard
# count. Collapsing the numeric shard id out of the hostname
# (cdn3.assets.example -> cdn#.assets.example) merges the copies —
# while hosts that merely LOOK similar but are different origins
# (static.other.example) must stay distinct. The reference's
# filename-keyed image cache (src/image_processor.py:44-56) sees each
# shard copy as a distinct file.
#
# Fixture derives arithmetically from `documents`: URL i serves
# content c = i div 7 from shard i % 7, except every c % 5 == 2
# content's shard-0 copy lives on the unrelated origin
# static.other.example (the negative control normalization must NOT
# merge into the cdn family).
#
# Scale shape: host normalization is an in-row regexp; the family
# rollup groups on (norm_host, content fingerprint) — one shuffle on
# a near-unique composite key — and the final per-norm-host rollup is
# bounded by the host-family count. Both aggregates combine map-side.
# ---------------------------------------------------------------------------

_Q145_ORACLE = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents),
u AS (
  SELECT md5(CAST(i // 7 AS VARCHAR)) AS fp,
         CASE WHEN (i // 7) % 5 = 2 AND i % 7 = 0 THEN 'static.other.example'
              ELSE 'cdn' || CAST(i % 7 AS VARCHAR) || '.assets.example' END AS host
  FROM d
),
n AS (SELECT fp, host, regexp_replace(host, '[0-9]+', '#', 'g') AS norm_host FROM u),
f AS (
  SELECT norm_host, fp,
         CAST(COUNT(*) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT host) AS BIGINT) AS n_raw_hosts
  FROM n GROUP BY norm_host, fp
)
SELECT norm_host,
       CAST(COUNT(*) AS BIGINT) AS n_contents,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       CAST(SUM(n_urls) - COUNT(*) AS BIGINT) AS n_redundant_urls,
       CAST(SUM(CASE WHEN n_raw_hosts > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_host_contents,
       CAST(MAX(n_raw_hosts) AS BIGINT) AS max_raw_hosts
FROM f GROUP BY norm_host ORDER BY norm_host
"""


@register("q145_cdn_shard_consolidation", oracle=_Q145_ORACLE)
def q145_cdn_shard_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse numbered CDN shard hostnames and measure the redundant
    URL load per host family: in-row regexp normalization, one
    composite-key family shuffle, bounded final rollup."""
    from voz_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("i")
    )
    content = F.expr("i div 7")
    u = d.select(
        F.md5(content.cast("string")).alias("fp"),
        F.when(
            (content % 5 == 2) & (F.col("i") % 7 == 0),
            F.lit("static.other.example"),
        )
        .otherwise(
            F.concat(
                F.lit("cdn"),
                (F.col("i") % 7).cast("string"),
                F.lit(".assets.example"),
            )
        )
        .alias("host"),
    )
    n = u.withColumn(
        "norm_host", F.regexp_replace("host", "[0-9]+", "#")
    )
    fam = n.groupBy("norm_host", "fp").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("host").cast("long").alias("n_raw_hosts"),
    )
    return (
        fam.groupBy("norm_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contents"),
            F.sum("n_urls").cast("long").alias("n_urls"),
            (F.sum("n_urls") - F.count(F.lit(1)))
            .cast("long")
            .alias("n_redundant_urls"),
            F.sum(F.when(F.col("n_raw_hosts") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_multi_host_contents"),
            F.max("n_raw_hosts").cast("long").alias("max_raw_hosts"),
        )
        .orderBy("norm_host")
    )


# ---------------------------------------------------------------------------
# q146: conditional-GET revisit savings — recrawls refetch pages that
# usually have NOT changed; HTTP 304 (If-None-Match / ETag) lets the
# server skip the body for unchanged content, but only if the crawler
# tracks per-URL fingerprints across visits and measures how often
# they repeat. This query computes, per host, how many refetches
# returned byte-identical content (304-eligible) and the bytes that
# revisit fingerprinting would have saved — the evidence that decides
# whether to turn conditional requests on for a host. The reference
# refetches everything wholesale each run and stores no validators
# (src/main.py:153-200).
#
# Fetch log derives from `events`: URL u = event_id % 997, host =
# u % 23, per-fetch content tag (event_id div 101) % 5, body size
# 1000 + (u % 50) * 100 — identical integer rules in both engines.
#
# Scale shape: the per-URL visit sequence is a lag window keyed on
# the URL — partitions are bounded by the recrawl frequency (a URL is
# fetched O(rounds) times, never O(corpus)); the host rollup is
# partial-combinable. Production shards the window by (url, epoch).
# ---------------------------------------------------------------------------

_Q146_ORACLE = """
WITH f AS (
  SELECT event_id % 997 AS u, ts, event_id,
         md5(CAST((event_id % 997) * 10 + (event_id // 101) % 5 AS VARCHAR)) AS fp,
         1000 + (event_id % 997) % 50 * 100 AS nbytes
  FROM events
),
g AS (
  SELECT u, fp, nbytes,
         LAG(fp) OVER (PARTITION BY u ORDER BY ts, event_id) AS prev_fp
  FROM f
)
SELECT u % 23 AS host,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(COUNT(prev_fp) AS BIGINT) AS n_refetches,
       CAST(SUM(CASE WHEN fp = prev_fp THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
       CAST(SUM(CASE WHEN fp = prev_fp THEN nbytes ELSE 0 END) AS BIGINT) AS bytes_304_eligible,
       CAST(CASE WHEN COUNT(prev_fp) = 0 THEN -1
            ELSE (1000 * (COUNT(prev_fp) - SUM(CASE WHEN fp = prev_fp THEN 1 ELSE 0 END))) // COUNT(prev_fp)
       END AS BIGINT) AS change_rate_milli
FROM g GROUP BY u % 23 ORDER BY host
"""


@register("q146_revisit_savings", oracle=_Q146_ORACLE)
def q146_revisit_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host 304-eligible refetch counts and saved bytes from
    per-URL fingerprint lag: bounded URL-keyed window, map-side
    combinable host rollup, integer milli change rate."""
    from pyspark.sql import Window

    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    f = ev.select(
        (F.col("event_id") % 997).alias("u"),
        "ts",
        "event_id",
        F.md5(
            (
                (F.col("event_id") % 997) * 10
                + F.expr("event_id div 101") % 5
            ).cast("string")
        ).alias("fp"),
        (F.lit(1000) + (F.col("event_id") % 997) % 50 * 100).alias("nbytes"),
    )
    w = Window.partitionBy("u").orderBy("ts", "event_id")
    g = f.withColumn("prev_fp", F.lag("fp").over(w))
    unchanged = F.when(F.col("fp") == F.col("prev_fp"), 1).otherwise(0)
    agg = (
        g.groupBy((F.col("u") % 23).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.count("prev_fp").cast("long").alias("n_refetches"),
            F.sum(unchanged).cast("long").alias("n_unchanged"),
            F.sum(
                F.when(F.col("fp") == F.col("prev_fp"), F.col("nbytes")).otherwise(0)
            )
            .cast("long")
            .alias("bytes_304_eligible"),
        )
        .withColumn(
            "change_rate_milli",
            F.expr(
                "cast(if(n_refetches = 0, -1,"
                " (1000 * (n_refetches - n_unchanged)) div n_refetches) as bigint)"
            ),
        )
    )
    return agg.orderBy("host")


# ---------------------------------------------------------------------------
# q156: politeness dispatch planner — the FORWARD twin of q142's
# backward-looking gap audit: given the queued requests for each host
# and the host's required crawl-delay, compute each request's EARLIEST
# legal dispatch time (dispatch >= arrival, and consecutive dispatches
# per host >= delay apart). This is the per-host token-bucket
# recurrence every polite fetcher runs sequentially
#     d_i = max(a_i, d_{i-1} + g)
# (the reference serializes it as time.sleep between requests,
# src/crawler.py) — which looks inherently sequential, but unrolls to
# the closed form
#     d_i = g*i + max_{j<=i} (a_j - g*j)
# (induction: max(a_i, g*(i-1) + M_{i-1} + g) = g*i + max(a_i - g*i,
# M_{i-1}) = g*i + M_i). So the whole plan is ONE shuffle on the host
# key plus a running-max window — fully parallel across hosts, no
# iteration, no state. All arithmetic is exact integer MICROSECONDS
# (unix_micros / epoch_us; BIGINT throughout: g*i <= 5e6 * |host rows|
# is far inside int64), so the oracle is engine-exact.
#
# Scale shape: the window partitions on the host — the same
# politeness-bounded key as q142, so no partition explodes; the
# running max is a streaming frame (ROWS UNBOUNDED PRECEDING), O(1)
# per row. At the 10^10 design point the planner runs per (host,
# round-batch) after the frontier's per-host top-B cap, so a window
# partition is at most the politeness budget B.
# ---------------------------------------------------------------------------

_Q156_H = 11  # host-space modulus (q142's fetch-log rules)
_Q156_DELAYS = 5  # required gap = host % 5 + 1 seconds

_Q156_ORACLE = f"""
WITH f AS (
  SELECT user_id % {_Q156_H} AS host, event_id, epoch_us(ts) AS arr_us,
         (user_id % {_Q156_H} % {_Q156_DELAYS} + 1) * 1000000 AS gap_us
  FROM events
),
r AS (
  SELECT host, event_id, arr_us, gap_us,
         ROW_NUMBER() OVER w - 1 AS i
  FROM f
  WINDOW w AS (PARTITION BY host ORDER BY arr_us, event_id)
),
d AS (
  SELECT host, event_id, arr_us, gap_us, i,
         MAX(arr_us - gap_us * i) OVER
           (PARTITION BY host ORDER BY arr_us, event_id
            ROWS UNBOUNDED PRECEDING) AS runmax
  FROM r
)
SELECT CAST(host AS BIGINT) AS host, event_id,
       CAST(arr_us AS BIGINT) AS arr_us,
       CAST(gap_us * i + runmax AS BIGINT) AS dispatch_us,
       CAST(gap_us * i + runmax - arr_us AS BIGINT) AS wait_us
FROM d
"""


@register("q156_dispatch_plan", oracle=_Q156_ORACLE)
def q156_dispatch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest legal dispatch time per queued fetch under per-host
    crawl-delay: the sequential token-bucket recurrence solved in
    closed form as one host-keyed running-max window (exact integer
    microseconds, no iteration)."""
    from pyspark.sql import Window

    from voz_spark.session import load_table

    f = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % _Q156_H).cast("long").alias("host"),
        "event_id",
        # ts is TIMESTAMP_NTZ: micros since the naive epoch (exactly
        # DuckDB's epoch_us on a naive timestamp), no TZ dependence
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("arr_us"),
    )
    f = f.withColumn(
        "gap_us", ((F.col("host") % _Q156_DELAYS + 1) * 1_000_000).cast("long")
    )
    w = Window.partitionBy("host").orderBy("arr_us", "event_id")
    r = f.withColumn("i", (F.row_number().over(w) - 1).cast("long"))
    runmax = F.max(F.col("arr_us") - F.col("gap_us") * F.col("i")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = r.withColumn("dispatch_us", (F.col("gap_us") * F.col("i") + runmax).cast("long"))
    return d.select(
        "host",
        "event_id",
        "arr_us",
        "dispatch_us",
        (F.col("dispatch_us") - F.col("arr_us")).cast("long").alias("wait_us"),
    )


# ---------------------------------------------------------------------------
# q157: rendezvous (highest-random-weight) fetch-shard routing — at the
# 10^10 design point, per-host politeness state (token buckets, robots
# cache, connection pools) must live ON the fetcher executor that owns
# the host, so hosts need a STABLE host->shard assignment that (a) is
# computable in-row with no coordination and (b) barely changes when
# the fetcher fleet resizes. Modulo hashing fails (b): growing K to
# K+1 reassigns ~K/(K+1) of all hosts, invalidating almost every
# politeness state in the fleet. Rendezvous hashing (Thaler &
# Ravishankar 1998, "Using name-based mappings to increase hit rates")
# assigns each host to argmax_s md5(host||':'||s) — provably exactly
# 1/(K+1) of hosts move when a shard is added, and ONLY onto the new
# shard, never between survivors. This query computes the K=16
# assignment (per-shard host/URL load, i.e. the balance evidence) and
# the K->K+1 churn per shard (the minimal-disruption evidence). The
# reference is a single sequential fetcher (src/crawler.py) and never
# faces the problem.
#
# Host load derives from `events`: host = event_id % 997, URL weight =
# fetch count per host — identical integer rules in both engines; the
# md5-hex winner is compared lexicographically (identical ASCII
# ordering in both engines, ties impossible short of an md5 collision).
#
# Scale shape: ONE shuffle (the distinct-host rollup); the K keys are
# an in-row array transform over the already-aggregated host table
# (O(hosts*K), hosts ~1e7-8 at design point, embarrassingly parallel);
# the final per-shard rollup has K=16 groups. No window, no join, no
# per-row Python.
# ---------------------------------------------------------------------------

_Q157_HOSTS = 997
_Q157_K = 16  # fetcher shards before the resize

_Q157_ORACLE = f"""
WITH hosts AS (
  SELECT event_id % {_Q157_HOSTS} AS host, CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM events GROUP BY 1
),
keyed AS (
  SELECT host, n_urls,
    list_transform(range(0, {_Q157_K}),
      s -> md5(CAST(host AS VARCHAR) || ':' || CAST(s AS VARCHAR))) AS k16,
    list_transform(range(0, {_Q157_K + 1}),
      s -> md5(CAST(host AS VARCHAR) || ':' || CAST(s AS VARCHAR))) AS k17
  FROM hosts
),
r AS (
  SELECT host, n_urls,
         list_position(k16, list_max(k16)) - 1 AS shard,
         list_position(k17, list_max(k17)) - 1 AS shard_after_grow
  FROM keyed
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN shard_after_grow <> shard THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_on_grow
FROM r GROUP BY shard ORDER BY shard
"""


@register("q157_fetch_shard_routing", oracle=_Q157_ORACLE)
def q157_fetch_shard_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash host->fetcher-shard assignment: per-shard host
    and URL load at K shards plus the churn a K->K+1 fleet resize
    would cause (provably only onto the new shard). One distinct-host
    shuffle; keys are an in-row array transform."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % _Q157_HOSTS).alias("host")
    )
    hosts = ev.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n_urls"))

    def keys(n):
        return F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s: F.md5(
                F.concat(F.col("host").cast("string"), F.lit(":"), s.cast("string"))
            ),
        )

    keyed = hosts.select(
        "host", "n_urls", keys(_Q157_K).alias("k16"), keys(_Q157_K + 1).alias("k17")
    )
    r = keyed.select(
        "host",
        "n_urls",
        (F.array_position(F.col("k16"), F.array_max("k16")) - 1).alias("shard"),
        (F.array_position(F.col("k17"), F.array_max("k17")) - 1).alias(
            "shard_after_grow"
        ),
    )
    return (
        r.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hosts"),
            F.sum("n_urls").cast("long").alias("n_urls"),
            F.sum(F.when(F.col("shard_after_grow") != F.col("shard"), 1).otherwise(0))
            .cast("long")
            .alias("n_moved_on_grow"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q158: IP-pool politeness merging — per-HOST politeness is not enough:
# virtual hosting puts many hostnames on one server IP, and a polite
# crawler must budget per ORIGIN SERVER or it hammers shared hosting
# with (hosts-on-IP x per-host-rate) requests (the standard Mercator /
# Heritrix refinement; the reference crawls one host and never faces
# it). Hosts sharing ANY resolved IP must share one budget pool, and
# IP sharing is transitive (host A and C never share an IP but both
# share one with B -> one pool), so pools are the CONNECTED COMPONENTS
# of the bipartite host<->IP graph. This query builds the pools and
# reports each pool's size — the fan-in evidence that decides the
# pooled crawl-delay.
#
# The resolution table derives from `documents`: host h = doc index,
# primary IP = h div 3 (DNS-level co-hosting in triples), plus for
# h % 7 == 0 a secondary IP (h + 5) div 3 (multi-homed hosts that
# BRIDGE adjacent triples into longer chains) — identical integer
# rules in both engines. IP nodes are offset by 10^6 to keep the node
# space disjoint; every component contains a host, so the pool id is
# the component minimum (= smallest member host).
#
# Scale shape: the edge list is one in-row projection (<= 2 edges per
# host); components contract in O(log^2 n) shuffles via the engine's
# alternating-star CC (graph.py — the q70 machinery, NOT per-round
# label propagation whose round count is the chain diameter); the
# pool rollup is one bounded aggregate. The DuckDB oracle closes
# reachability with a recursive CTE over the same edges.
# ---------------------------------------------------------------------------

_Q158_IP_OFFSET = 1_000_000

_Q158_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT CAST(doc_id AS BIGINT) AS h FROM documents
),
edges AS (
  SELECT h, h // 3 + {_Q158_IP_OFFSET} AS ip FROM d
  UNION ALL
  SELECT h, (h + 5) // 3 + {_Q158_IP_OFFSET} AS ip FROM d WHERE h % 7 = 0
),
sym AS (
  SELECT h AS u, ip AS v FROM edges
  UNION ALL
  SELECT ip AS u, h AS v FROM edges
),
nodes AS (SELECT DISTINCT u AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.v, reach.r FROM reach JOIN sym e ON e.u = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT CAST(component AS BIGINT) AS pool_id,
       CAST(SUM(CASE WHEN node < {_Q158_IP_OFFSET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hosts,
       CAST(SUM(CASE WHEN node >= {_Q158_IP_OFFSET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ips
FROM comp GROUP BY component ORDER BY pool_id
"""


@register("q158_ip_pool_politeness", oracle=_Q158_ORACLE)
def q158_ip_pool_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness pools = connected components of the bipartite
    host<->resolved-IP graph (transitive virtual-host sharing): pool
    id is the smallest member host; reports per-pool host and IP
    fan-in. Star-contraction CC, O(log^2 n) rounds."""
    from voz_spark.graph import connected_components
    from voz_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("h")
    )
    primary = d.select(
        F.col("h").alias("u"),
        (F.expr("h div 3") + F.lit(_Q158_IP_OFFSET)).alias("v"),
    )
    secondary = d.where(F.col("h") % 7 == 0).select(
        F.col("h").alias("u"),
        (F.expr("(h + 5) div 3") + F.lit(_Q158_IP_OFFSET)).alias("v"),
    )
    cc = connected_components(primary.unionByName(secondary))
    return (
        cc.groupBy(F.col("component").cast("long").alias("pool_id"))
        .agg(
            F.sum(F.when(F.col("node") < _Q158_IP_OFFSET, 1).otherwise(0))
            .cast("long")
            .alias("n_hosts"),
            F.sum(F.when(F.col("node") >= _Q158_IP_OFFSET, 1).otherwise(0))
            .cast("long")
            .alias("n_ips"),
        )
        .orderBy("pool_id")
    )


# ---------------------------------------------------------------------------
# q160: byte-budgeted round planning — politeness caps a host's REQUEST
# count, but the crawl's real constraint at the 10^10 design point is
# BANDWIDTH: each round may pull only so many bytes per host (egress
# fairness, origin-side rate limits quoted in bytes, storage ingest
# caps). Given the queued URLs with size estimates (Content-Length
# from a HEAD or the previous visit, q146's validator table), schedule
# each host's queue IN ARRIVAL ORDER until the cumulative estimated
# bytes exceed the host's byte budget; the rest defer to the next
# round. Prefix-sum-until-cap, NOT a knapsack: order is contractual
# (priority was already settled by the frontier sort) so the plan is a
# running sum + a filter, deterministic and incremental. The reference
# downloads every discovered image unconditionally (src/image_processor.py)
# and has no notion of a byte budget.
#
# Fetch queue derives from `events`: host = event_id % 23, est_bytes =
# 1000 + (event_id % 50) * 100, arrival order (ts, event_id); host
# budget = (host % 4 + 1) * 100_000 bytes — identical integer rules in
# both engines.
#
# Scale shape: ONE host-keyed window whose running sum is a streaming
# frame (O(1)/row) and whose partitions are politeness-bounded (a
# host's queue, never the corpus); the rollup is partial-combinable.
# All arithmetic BIGINT.
# ---------------------------------------------------------------------------

_Q160_HOSTS = 23

_Q160_ORACLE = f"""
WITH q AS (
  SELECT event_id % {_Q160_HOSTS} AS host, event_id, ts,
         1000 + event_id % 50 * 100 AS est_bytes
  FROM events
),
c AS (
  SELECT host, event_id, est_bytes,
         (host % 4 + 1) * 100000 AS budget_bytes,
         SUM(est_bytes) OVER (PARTITION BY host ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS cum_bytes
  FROM q
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(MAX(budget_bytes) AS BIGINT) AS budget_bytes,
       CAST(SUM(CASE WHEN cum_bytes <= budget_bytes THEN 1 ELSE 0 END) AS BIGINT)
         AS n_scheduled,
       CAST(SUM(CASE WHEN cum_bytes <= budget_bytes THEN 0 ELSE 1 END) AS BIGINT)
         AS n_deferred,
       CAST(SUM(CASE WHEN cum_bytes <= budget_bytes THEN est_bytes ELSE 0 END) AS BIGINT)
         AS bytes_scheduled
FROM c GROUP BY host ORDER BY host
"""


@register("q160_byte_budget_round", oracle=_Q160_ORACLE)
def q160_byte_budget_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandwidth-capped round plan: per-host prefix-sum-until-budget
    over the arrival-ordered queue (streaming window frame on the
    politeness-bounded host key), then a combinable rollup of
    scheduled/deferred counts and bytes."""
    from pyspark.sql import Window

    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    q = ev.select(
        (F.col("event_id") % _Q160_HOSTS).alias("host"),
        "event_id",
        "ts",
        (F.lit(1000) + F.col("event_id") % 50 * 100).cast("long").alias("est_bytes"),
    ).withColumn("budget_bytes", ((F.col("host") % 4 + 1) * 100_000).cast("long"))
    w = (
        Window.partitionBy("host")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = q.withColumn("cum_bytes", F.sum("est_bytes").over(w))
    sched = F.col("cum_bytes") <= F.col("budget_bytes")
    return (
        c.groupBy(F.col("host").cast("long").alias("host"))
        .agg(
            F.max("budget_bytes").cast("long").alias("budget_bytes"),
            F.sum(F.when(sched, 1).otherwise(0)).cast("long").alias("n_scheduled"),
            F.sum(F.when(sched, 0).otherwise(1)).cast("long").alias("n_deferred"),
            F.sum(F.when(sched, F.col("est_bytes")).otherwise(0))
            .cast("long")
            .alias("bytes_scheduled"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q162: tracking-parameter mining — q117's canonicalizer strips a
# FIXED list of tracking params (utm_*, fbclid, ...), but the long
# tail of session/affiliate junk is site-specific and must be LEARNED
# from the crawl itself: a query parameter is content-neutral iff,
# among URLs identical except for that parameter, the fetched content
# fingerprint never varies. This query mines that evidence per
# parameter: explode each URL into (param, stripped-URL-without-it)
# rows, group by (param, stripped), and count groups where the
# parameter's value varies but the fingerprint does not (neutral) vs
# varies WITH it (content-bearing). Neutral verdicts feed the
# canonicalizer's strip list; content-bearing params (pagination etc.)
# must never be stripped. The reference hardcodes nothing of the sort
# — it crawls one forum whose URLs it fully controls.
#
# URL synth from `events` (identical integer rules both engines):
# 60-bit md5 pseudo-digits give INDEPENDENT param values (a direct
# modulus of event_id would entangle path and params and leave every
# stripped group single-valued): path p = event_id % 97, page = h % 4
# (content-bearing: fp = md5(path:page)), utm = (h div 4) % 7 and an
# optional ref = (h div 84) % 5 when (h div 28) % 3 = 0 (both
# neutral). Params keep a canonical order [page, utm, ref].
#
# Scale shape: explode is <= 3 rows per URL (bounded by a URL's param
# count); ONE shuffle on (param, stripped) whose groups are
# near-duplicate URL families (politeness-bounded in practice); the
# per-param rollup has O(|params|) groups. The engine side is fully
# generic array machinery (filter/transform/array_join over the
# params list) — only the fixture knows the param names.
# ---------------------------------------------------------------------------

_Q162_ORACLE = """
WITH h AS (
  SELECT event_id AS u,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
         'p' || CAST(event_id % 97 AS VARCHAR) AS path
  FROM events
),
d AS (
  SELECT u, path,
         CAST(h % 4 AS VARCHAR) AS page,
         CAST((h // 4) % 7 AS VARCHAR) AS utm,
         (h // 28) % 3 = 0 AS has_ref,
         CAST((h // 84) % 5 AS VARCHAR) AS ref,
         md5(path || ':' || CAST(h % 4 AS VARCHAR)) AS fp
  FROM h
),
ex AS (
  SELECT 'page' AS param, page AS val, fp,
         path || '?' || 'utm=' || utm ||
           CASE WHEN has_ref THEN '&ref=' || ref ELSE '' END AS stripped
  FROM d
  UNION ALL
  SELECT 'utm', utm, fp,
         path || '?' || 'page=' || page ||
           CASE WHEN has_ref THEN '&ref=' || ref ELSE '' END
  FROM d
  UNION ALL
  SELECT 'ref', ref, fp,
         path || '?' || 'page=' || page || '&utm=' || utm
  FROM d WHERE has_ref
),
g AS (
  SELECT param, stripped,
         COUNT(DISTINCT val) AS nv, COUNT(DISTINCT fp) AS nf
  FROM ex GROUP BY 1, 2
)
SELECT param,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_value_groups,
       CAST(SUM(CASE WHEN nv > 1 AND nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
       CASE WHEN SUM(CASE WHEN nv > 1 AND nf > 1 THEN 1 ELSE 0 END) > 0
            THEN 'content-bearing' ELSE 'neutral' END AS verdict
FROM g GROUP BY param ORDER BY param
"""


@register("q162_tracking_param_mining", oracle=_Q162_ORACLE)
def q162_tracking_param_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn which query parameters are content-neutral (strippable by
    the canonicalizer) vs content-bearing: per (param, URL-stripped-
    of-it) group, does the fingerprint vary with the value? Generic
    array filter/transform machinery, <= |params| rows per URL."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    h = ev.select(
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
        F.concat(F.lit("p"), (F.col("event_id") % 97).cast("string")).alias("path"),
    )
    pstruct = lambda name, val: F.struct(  # noqa: E731
        F.lit(name).alias("name"), val.cast("string").alias("val")
    )
    empty = F.array().cast("array<struct<name:string,val:string>>")
    d = h.select(
        "path",
        F.md5(
            F.concat(F.col("path"), F.lit(":"), (F.col("h") % 4).cast("string"))
        ).alias("fp"),
        F.concat(
            F.array(
                pstruct("page", F.col("h") % 4),
                pstruct("utm", F.expr("(h div 4) % 7")),
            ),
            F.when(
                F.expr("(h div 28) % 3") == 0,
                F.array(pstruct("ref", F.expr("(h div 84) % 5"))),
            ).otherwise(empty),
        ).alias("params"),
    )
    ex = d.select(
        "path",
        "fp",
        "params",
        F.explode("params").alias("pr"),
    ).select(
        F.col("pr.name").alias("param"),
        F.col("pr.val").alias("val"),
        "fp",
        F.concat(
            F.col("path"),
            F.lit("?"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("params"), lambda y: y["name"] != F.col("pr.name")
                    ),
                    lambda y: F.concat(y["name"], F.lit("="), y["val"]),
                ),
                "&",
            ),
        ).alias("stripped"),
    )
    g = ex.groupBy("param", "stripped").agg(
        F.countDistinct("val").alias("nv"), F.countDistinct("fp").alias("nf")
    )
    viol = F.when((F.col("nv") > 1) & (F.col("nf") > 1), 1).otherwise(0)
    return (
        g.groupBy("param")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_multi_value_groups"),
            F.sum(viol).cast("long").alias("n_violating_groups"),
        )
        .withColumn(
            "verdict",
            F.when(F.col("n_violating_groups") > 0, F.lit("content-bearing")).otherwise(
                F.lit("neutral")
            ),
        )
        .orderBy("param")
    )


# ---------------------------------------------------------------------------
# q166: URL path-template mining — the structural complement of q162
# (which learns strippable QUERY params) and q99 (which detects traps
# by per-host depth/fanout): generalize each URL path by collapsing
# digit runs ('/cal/2026/8/19' -> '/cal/{d}/{d}/{d}') and judge each
# TEMPLATE by how much distinct content its URL population actually
# serves. A calendar trap mints unbounded URLs that all render the
# same empty grid (urls-per-fingerprint explodes); sort-order
# variants serve each listing ~6 ways (redundant); real content
# templates sit near 1 URL per fingerprint. The verdict drives the
# frontier's template-level admission policy — a capability the
# reference (one hand-picked forum) never needs.
#
# URL synth from `events` (identical integer rules both engines,
# q162's md5 pseudo-digit idiom): e % 3 == 0 -> calendar trap page
# (constant fingerprint), else e % 7 == 1 -> listing sort variant
# (fingerprint of the listing only), else forum thread page
# (fingerprint of the full path).
#
# Scale shape: scan -> project (regexp template + md5 fp) -> one hash
# aggregate keyed by template (bounded by the template vocabulary,
# thousands at web scale, not URL count) with distinct-counting
# partials -> in-row verdict. The regexp is a single linear pass per
# URL, JVM-codegen'd; no joins, no windows, no Python.
# ---------------------------------------------------------------------------

_Q166_ORACLE = """
WITH h AS (
  SELECT event_id AS e,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
u AS (
  SELECT CASE
           WHEN e % 3 = 0 THEN
             '/cal/' || CAST(2000 + h % 40 AS VARCHAR)
               || '/' || CAST(1 + (h // 40) % 12 AS VARCHAR)
               || '/' || CAST(1 + (h // 480) % 28 AS VARCHAR)
           WHEN e % 7 = 1 THEN
             '/list/' || CAST(e % 20 AS VARCHAR) || '/sort-' || CAST(h % 6 AS VARCHAR)
           ELSE
             '/forum/t' || CAST(e % 50 AS VARCHAR) || '/p' || CAST(h % 4 AS VARCHAR)
         END AS path,
         CASE
           WHEN e % 3 = 0 THEN md5('cal-empty')
           WHEN e % 7 = 1 THEN md5('/list/' || CAST(e % 20 AS VARCHAR))
           ELSE md5('/forum/t' || CAST(e % 50 AS VARCHAR) || '/p' || CAST(h % 4 AS VARCHAR))
         END AS fp
  FROM h
),
g AS (
  SELECT regexp_replace(path, '[0-9]+', '{d}', 'g') AS template,
         CAST(COUNT(DISTINCT path) AS BIGINT) AS n_urls,
         CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints
  FROM u GROUP BY 1
)
SELECT template, n_urls, n_fingerprints,
       CAST(1000 * n_urls // n_fingerprints AS BIGINT) AS urls_per_fp_milli,
       CASE WHEN 1000 * n_urls // n_fingerprints <= 1500 THEN 'content'
            WHEN 1000 * n_urls // n_fingerprints <= 20000 THEN 'redundant'
            ELSE 'trap' END AS verdict
FROM g ORDER BY template
"""


@register("q166_url_template_mining", oracle=_Q166_ORACLE)
def q166_url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judge URL path templates (digit runs collapsed to {d}) by
    distinct-URLs-per-distinct-fingerprint: content vs redundant vs
    crawler trap. One bounded-key hash aggregate, no joins."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    b = ev.select(
        F.col("event_id").alias("e"),
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    s = lambda c: c.cast("string")  # noqa: E731
    path = (
        F.when(
            F.col("e") % 3 == 0,
            F.concat(
                F.lit("/cal/"),
                s(F.lit(2000) + F.col("h") % 40),
                F.lit("/"),
                s(F.lit(1) + F.expr("h div 40") % 12),
                F.lit("/"),
                s(F.lit(1) + F.expr("h div 480") % 28),
            ),
        )
        .when(
            F.col("e") % 7 == 1,
            F.concat(F.lit("/list/"), s(F.col("e") % 20), F.lit("/sort-"), s(F.col("h") % 6)),
        )
        .otherwise(
            F.concat(F.lit("/forum/t"), s(F.col("e") % 50), F.lit("/p"), s(F.col("h") % 4))
        )
    )
    fp = (
        F.when(F.col("e") % 3 == 0, F.md5(F.lit("cal-empty")))
        .when(
            F.col("e") % 7 == 1,
            F.md5(F.concat(F.lit("/list/"), s(F.col("e") % 20))),
        )
        .otherwise(
            F.md5(F.concat(F.lit("/forum/t"), s(F.col("e") % 50), F.lit("/p"), s(F.col("h") % 4)))
        )
    )
    u = b.select(path.alias("path"), fp.alias("fp"))
    g = (
        u.groupBy(F.regexp_replace("path", "[0-9]+", "{d}").alias("template"))
        .agg(
            F.countDistinct("path").cast("long").alias("n_urls"),
            F.countDistinct("fp").cast("long").alias("n_fingerprints"),
        )
    )
    ratio = F.expr("1000 * n_urls div n_fingerprints").cast("long")
    return (
        g.select("template", "n_urls", "n_fingerprints", ratio.alias("urls_per_fp_milli"))
        .withColumn(
            "verdict",
            F.when(F.col("urls_per_fp_milli") <= 1500, F.lit("content"))
            .when(F.col("urls_per_fp_milli") <= 20000, F.lit("redundant"))
            .otherwise(F.lit("trap")),
        )
        .orderBy("template")
    )


# ---------------------------------------------------------------------------
# q167: alt-text mining — the image-caption HARVEST step an
# image+caption dataset pipeline runs over raw HTML: pull every
# `<img src alt>` tag out of the fetched pages, canonicalize per
# image URL (the same image is embedded on many pages, often with
# DIFFERENT alt strings), elect the majority alt as the canonical
# caption candidate, and grade it (empty / filename / generic /
# descriptive) so the curation funnel can keep only caption-worthy
# pairs. The reference takes captions only from the one forum's post
# text next to each image (src/image_processor.py:44-80); it has no
# alt-attribute harvest at all — this is the LAION-style acquisition
# path for (image, caption) rows.
#
# Scale shape: tag extraction is an in-row regexp_extract_all +
# explode (JVM codegen; pages never shuffle their HTML — only the
# ~100-byte tag strings move). The vote is one hash aggregate keyed
# by (img_url, alt) — near-unique, no skew — and the election window
# partitions on img_url over the AGGREGATE, bounded by the alt-variant
# count per image (a handful), never by page count. Grading is in-row.
# ---------------------------------------------------------------------------

Q167_PAGES_PATH = "/tmp/voz_spark_q167_imgpages"
_Q167_N = 300


def _img_page_rows() -> list[dict]:
    """Deterministic img-tag corpus: 300 pages x 3 tags over a 100-image
    universe (d = (i + 37t) % 100), so each image recurs on exactly 9
    pages. The alt string rotates through five planted classes —
    empty, filename-ish, generic, and two competing descriptive
    variants — with slot 0 casting 3 votes for variant d%5 and slots
    1-2 casting 6 votes for variant (d+1)%5: every image gets a REAL
    contested election with a strict 6-vs-3 majority winner."""
    rows = []
    for i in range(_Q167_N):
        tags = []
        for t in range(3):
            d = (i + 37 * t) % 100
            v = (d + (1 if t else 0)) % 5
            alt = [
                "",
                f"IMG_{d:04d}.jpg",
                "photo",
                f"rig build log {d} with custom loop",
                f"desk setup photo from thread {d}",
            ][v]
            tags.append(
                f'<img src="https://cdn{d % 4}.voz.test/img/{d:04d}.jpg" alt="{alt}">'
            )
        rows.append(
            {
                "url": f"https://h{i % 7}.voz.test/t/{i:03d}",
                "html": "<html><body>" + "".join(tags) + "</body></html>",
            }
        )
    return rows


_Q167_ORACLE = f"""
WITH t AS (
  SELECT url, unnest(regexp_extract_all(html, '<img [^>]*>')) AS tag
  FROM read_parquet('{Q167_PAGES_PATH}/*.parquet')
),
x AS (
  SELECT regexp_extract(tag, 'src="([^"]*)"', 1) AS img_url,
         regexp_extract(tag, 'alt="([^"]*)"', 1) AS alt
  FROM t
),
g AS (SELECT img_url, alt, COUNT(*) AS n FROM x GROUP BY 1, 2),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY img_url ORDER BY n DESC, alt) AS rk,
         SUM(n) OVER (PARTITION BY img_url) AS n_pages,
         COUNT(*) OVER (PARTITION BY img_url) AS n_variants
  FROM g
)
SELECT img_url, alt AS canon_alt,
       CAST(n AS BIGINT) AS n_votes,
       CAST(n_pages AS BIGINT) AS n_pages,
       CAST(n_variants AS BIGINT) AS n_variants,
       CASE WHEN alt = '' THEN 'empty'
            WHEN regexp_matches(alt, '^[A-Z]+_[0-9]+[.](jpg|png)$') THEN 'filename'
            WHEN length(alt) < 8 THEN 'generic'
            ELSE 'descriptive' END AS alt_class
FROM r WHERE rk = 1 ORDER BY img_url
"""


@register("q167_alt_text_mining", oracle=_Q167_ORACLE)
def q167_alt_text_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical alt-text election per image URL with quality grading:
    in-row tag regexp + one (img, alt) vote aggregate + a variant-
    bounded election window; the HTML itself never shuffles."""
    from pyspark.sql import Window

    pages = _materialized(
        spark,
        Q167_PAGES_PATH,
        f"n={_Q167_N};v2",
        lambda: spark.createDataFrame(_pdf(_img_page_rows())),
    )
    tags = pages.select(
        F.explode(F.regexp_extract_all("html", F.lit("<img [^>]*>"), 0)).alias("tag")
    )
    x = tags.select(
        F.regexp_extract("tag", 'src="([^"]*)"', 1).alias("img_url"),
        F.regexp_extract("tag", 'alt="([^"]*)"', 1).alias("alt"),
    )
    g = x.groupBy("img_url", "alt").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("img_url")
    r = (
        g.withColumn(
            "rk",
            F.row_number().over(w.orderBy(F.col("n").desc(), F.col("alt"))),
        )
        .withColumn("n_pages", F.sum("n").over(w))
        .withColumn("n_variants", F.count(F.lit(1)).over(w))
    )
    alt_class = (
        F.when(F.col("alt") == "", F.lit("empty"))
        .when(F.col("alt").rlike("^[A-Z]+_[0-9]+[.](jpg|png)$"), F.lit("filename"))
        .when(F.length("alt") < 8, F.lit("generic"))
        .otherwise(F.lit("descriptive"))
    )
    return (
        r.filter(F.col("rk") == 1)
        .select(
            "img_url",
            F.col("alt").alias("canon_alt"),
            F.col("n").cast("long").alias("n_votes"),
            F.col("n_pages").cast("long").alias("n_pages"),
            F.col("n_variants").cast("long").alias("n_variants"),
            alt_class.alias("alt_class"),
        )
        .orderBy("img_url")
    )


# ---------------------------------------------------------------------------
# q168: DNS prefetch planning — before a fetch round dispatches, every
# scheduled host must resolve; naive per-fetch resolution hammers
# resolvers with |URLs| lookups when only |hosts| are needed (and at
# 10^10 URLs, |hosts| is ~10^7 — three orders smaller). This query
# folds the frontier to per-host demand, replays the resolver cache's
# TTL rule to split hosts into fresh / expired / never-resolved, and
# emits per-resolver-shard work orders with the earliest fetch
# deadline each shard must beat. The reference resolves implicitly
# inside requests.get, once per fetch (src/crawler.py).
#
# Cache state derives from the host id by integer rules identical in
# both engines: hid % 3 == 0 -> never resolved ('new'); else the
# cached entry is (hid % 500) minutes old with a TTL of
# 300 + (hid % 7) * 300 s -> 'expired' when age exceeds TTL, else
# 'fresh'.
#
# Scale shape: ONE hash aggregate keyed by host folds the frontier
# (count + min fetch ts partial-combine map-side, so the shuffle
# carries |hosts| rows, not |URLs|); cache state and shard are then
# in-row expressions and the final rollup groups on the bounded
# (shard, state) domain. No joins, no windows, no Python.
# ---------------------------------------------------------------------------

_Q168_ORACLE = """
WITH h AS (
  SELECT event_id % 211 AS hid, COUNT(*) AS n_urls, MIN(ts) AS first_fetch
  FROM events GROUP BY 1
),
c AS (
  SELECT hid, n_urls, first_fetch,
         CASE WHEN hid % 3 = 0 THEN 'new'
              WHEN 60 * hid > 300 + 300 * (hid % 7) THEN 'expired'
              ELSE 'fresh' END AS cache_state
  FROM h
)
SELECT CAST(hid % 8 AS BIGINT) AS shard, cache_state,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       CAST(MAX(n_urls) AS BIGINT) AS max_urls_one_host,
       MIN(first_fetch) AS first_deadline
FROM c GROUP BY 1, 2 ORDER BY shard, cache_state
"""


@register("q168_dns_prefetch_plan", oracle=_Q168_ORACLE)
def q168_dns_prefetch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-resolver-shard DNS work orders: frontier folded to host
    grain (one partial-combining aggregate), TTL cache-state replay
    in-row, bounded (shard, state) rollup with fetch deadlines."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    h = ev.groupBy((F.col("event_id") % 211).alias("hid")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("ts").alias("first_fetch"),
    )
    state = (
        F.when(F.col("hid") % 3 == 0, F.lit("new"))
        .when(60 * F.col("hid") > 300 + 300 * (F.col("hid") % 7), F.lit("expired"))
        .otherwise(F.lit("fresh"))
    )
    return (
        h.withColumn("cache_state", state)
        .groupBy((F.col("hid") % 8).cast("long").alias("shard"), "cache_state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hosts"),
            F.sum("n_urls").cast("long").alias("n_urls"),
            F.max("n_urls").cast("long").alias("max_urls_one_host"),
            F.min("first_fetch").alias("first_deadline"),
        )
        .orderBy("shard", "cache_state")
    )


# ---------------------------------------------------------------------------
# q169: frontier spill tiers — a 10^10-URL frontier does not fit in
# executor memory; only the slice the next rounds will actually fetch
# belongs on the fast tier. This query places every frontier URL into
# hot (next round: top 10% by priority) / warm (rounds after: next
# 30%) / cold (spill: the rest) WITHOUT ever globally sorting the
# frontier: it builds a bounded priority HISTOGRAM (the 64Ki-bucket
# packed-priority domain), takes a running count over that tiny bin
# table, derives the two cutoff priorities as scalars, and classifies
# bins — the exact-threshold top-B idea (frontier.py's per-host
# batching) lifted to storage placement. The reference holds its whole
# frontier as a Python list in RAM (src/main.py).
#
# Scale shape: one hash aggregate keyed by the 16-bit priority bucket
# (bounded 65,536 keys regardless of frontier size; count + bytes
# partial-combine), a window over the BIN table only (never the
# frontier), two scalar cutoffs broadcast back, and a 3-row rollup.
# The frontier itself is touched by exactly one exchange — the
# histogram shuffle. Budgets are integer fractions of the total (10%
# / 40% cumulative) so every scale factor exercises all three tiers.
# ---------------------------------------------------------------------------

_Q169_ORACLE = """
WITH f AS (
  SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 65536 AS p,
         500 + event_id % 100 * 10 AS nbytes
  FROM events
),
g AS (SELECT p, COUNT(*) AS c, SUM(nbytes) AS b FROM f GROUP BY 1),
w AS (SELECT *, SUM(c) OVER (ORDER BY p) AS cum, SUM(c) OVER () AS n FROM g),
cut AS (
  SELECT MAX(CASE WHEN cum * 10 <= n THEN p END) AS hot_cut,
         MAX(CASE WHEN cum * 10 <= n * 4 THEN p END) AS warm_cut
  FROM w
)
SELECT CASE WHEN p <= COALESCE(hot_cut, -1) THEN 'hot'
            WHEN p <= COALESCE(warm_cut, -1) THEN 'warm'
            ELSE 'cold' END AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(c) AS BIGINT) AS n_urls,
       CAST(SUM(b) AS BIGINT) AS n_bytes,
       CAST(MIN(p) AS BIGINT) AS p_min,
       CAST(MAX(p) AS BIGINT) AS p_max
FROM w, cut GROUP BY 1 ORDER BY p_min
"""


@register("q169_frontier_spill_tiers", oracle=_Q169_ORACLE)
def q169_frontier_spill_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/warm/cold frontier placement via a bounded priority
    histogram: the frontier shuffles once (bin aggregate); the running
    count, cutoffs, and tier rollup all happen on the 64Ki-row bin
    table."""
    from pyspark.sql import Window

    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    f = ev.select(
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 65536
        ).alias("p"),
        (F.lit(500) + F.col("event_id") % 100 * 10).alias("nbytes"),
    )
    g = f.groupBy("p").agg(
        F.count(F.lit(1)).alias("c"), F.sum("nbytes").alias("b")
    )
    # Window over the BIN table (<= 65,536 rows), never the frontier.
    # The bin table feeds BOTH the cutoff scalars and the tier rollup:
    # persist it (the q25/q81 lesson) or the cut branch re-scans and
    # re-shuffles the whole frontier a second time.
    w = (
        g.withColumn("cum", F.sum("c").over(Window.orderBy("p")))
        .withColumn("n", F.sum("c").over(Window.partitionBy()))
        .persist()
    )
    cut = w.agg(
        F.max(F.when(F.col("cum") * 10 <= F.col("n"), F.col("p"))).alias("hot_cut"),
        F.max(F.when(F.col("cum") * 10 <= F.col("n") * 4, F.col("p"))).alias("warm_cut"),
    )
    tier = (
        F.when(F.col("p") <= F.coalesce(F.col("hot_cut"), F.lit(-1)), F.lit("hot"))
        .when(F.col("p") <= F.coalesce(F.col("warm_cut"), F.lit(-1)), F.lit("warm"))
        .otherwise(F.lit("cold"))
    )
    return (
        w.crossJoin(F.broadcast(cut))
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("c").cast("long").alias("n_urls"),
            F.sum("b").cast("long").alias("n_bytes"),
            F.min("p").cast("long").alias("p_min"),
            F.max("p").cast("long").alias("p_max"),
        )
        .orderBy("p_min")
    )


# ---------------------------------------------------------------------------
# q170: cache-header freshness policy — q100 learns recrawl tiers from
# OBSERVED content change; this query learns them from what the server
# DECLARES: parse Cache-Control (no-store / no-cache / max-age /
# s-maxage, with s-maxage taking shared-cache precedence per RFC 9111
# §5.2.2.10) into an effective TTL per fetched URL, then roll up a
# per-host refetch policy. Servers that declare everything uncacheable
# get 'always-refetch'; short declared lifetimes get 'short-ttl'. The
# reference sends every request cold and ignores response headers
# entirely (src/crawler.py).
#
# Header synth from `events` (identical string rules both engines):
# e % 5 picks the variant — bare max-age, no-store, public max-age +
# s-maxage, no-cache, absent header (heuristic 3600 s default).
#
# Scale shape: header parsing is in-row regexp (the '(^|[ ,])max-age='
# guard keeps max-age from matching inside s-maxage — JVM codegen,
# no UDF); the only exchange is the bounded per-host rollup, fully
# partial-combining. No joins, no windows.
# ---------------------------------------------------------------------------

_Q170_ORACLE = """
WITH h AS (
  SELECT event_id AS e,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
u AS (
  SELECT e % 53 AS host,
         CASE e % 5
           WHEN 0 THEN 'max-age=' || CAST(h % 86400 AS VARCHAR)
           WHEN 1 THEN 'no-store'
           WHEN 2 THEN 'public, max-age=' || CAST(h % 3600 AS VARCHAR)
                    || ', s-maxage=' || CAST((h // 7) % 7200 AS VARCHAR)
           WHEN 3 THEN 'no-cache'
           ELSE ''
         END AS cc
  FROM h
),
p AS (
  SELECT host, cc,
         CASE
           WHEN cc LIKE '%no-store%' OR cc LIKE '%no-cache%' THEN 0
           WHEN regexp_extract(cc, 's-maxage=([0-9]+)', 1) <> ''
             THEN CAST(regexp_extract(cc, 's-maxage=([0-9]+)', 1) AS BIGINT)
           WHEN regexp_extract(cc, '(^|[ ,])max-age=([0-9]+)', 2) <> ''
             THEN CAST(regexp_extract(cc, '(^|[ ,])max-age=([0-9]+)', 2) AS BIGINT)
           ELSE 3600
         END AS ttl,
         CASE WHEN cc LIKE '%no-store%' OR cc LIKE '%no-cache%' THEN 1 ELSE 0 END AS unc,
         CASE WHEN cc = '' THEN 1 ELSE 0 END AS dflt
  FROM u
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(unc) AS BIGINT) AS n_uncacheable,
       CAST(SUM(dflt) AS BIGINT) AS n_default,
       CAST(SUM(ttl) AS BIGINT) AS ttl_sum,
       CAST(MAX(ttl) AS BIGINT) AS ttl_max,
       CASE WHEN SUM(unc) * 2 >= COUNT(*) THEN 'always-refetch'
            WHEN SUM(ttl) // COUNT(*) < 1800 THEN 'short-ttl'
            ELSE 'long-ttl' END AS policy
FROM p GROUP BY 1 ORDER BY host
"""


@register("q170_cache_header_policy", oracle=_Q170_ORACLE)
def q170_cache_header_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host refetch policy from declared Cache-Control freshness:
    in-row RFC 9111 parse (s-maxage precedence, no-store/no-cache =>
    TTL 0, absent => 3600 default), one bounded host rollup."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    b = ev.select(
        F.col("event_id").alias("e"),
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    s = lambda c: c.cast("string")  # noqa: E731
    cc = (
        F.when(F.col("e") % 5 == 0, F.concat(F.lit("max-age="), s(F.col("h") % 86400)))
        .when(F.col("e") % 5 == 1, F.lit("no-store"))
        .when(
            F.col("e") % 5 == 2,
            F.concat(
                F.lit("public, max-age="),
                s(F.col("h") % 3600),
                F.lit(", s-maxage="),
                s(F.expr("h div 7") % 7200),
            ),
        )
        .when(F.col("e") % 5 == 3, F.lit("no-cache"))
        .otherwise(F.lit(""))
    )
    u = b.select((F.col("e") % 53).alias("host"), cc.alias("cc"))
    smax = F.regexp_extract("cc", "s-maxage=([0-9]+)", 1)
    mage = F.regexp_extract("cc", "(^|[ ,])max-age=([0-9]+)", 2)
    uncache = F.col("cc").contains("no-store") | F.col("cc").contains("no-cache")
    ttl = (
        F.when(uncache, F.lit(0))
        .when(smax != "", smax.cast("long"))
        .when(mage != "", mage.cast("long"))
        .otherwise(F.lit(3600))
    )
    p = u.select(
        "host",
        ttl.alias("ttl"),
        F.when(uncache, 1).otherwise(0).alias("unc"),
        F.when(F.col("cc") == "", 1).otherwise(0).alias("dflt"),
    )
    g = p.groupBy(F.col("host").cast("long").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum("unc").cast("long").alias("n_uncacheable"),
        F.sum("dflt").cast("long").alias("n_default"),
        F.sum("ttl").cast("long").alias("ttl_sum"),
        F.max("ttl").cast("long").alias("ttl_max"),
    )
    policy = (
        F.when(F.col("n_uncacheable") * 2 >= F.col("n_urls"), F.lit("always-refetch"))
        .when(F.expr("ttl_sum div n_urls") < 1800, F.lit("short-ttl"))
        .otherwise(F.lit("long-ttl"))
    )
    return g.withColumn("policy", policy).orderBy("host")


# ---------------------------------------------------------------------------
# q171: mojibake gate — web text is full of double-encoding damage
# (UTF-8 bytes re-decoded as Latin-1: 'á' -> 'Ã¡', ''' -> 'â€™',
# NBSP -> 'Â '); training on it teaches the model to emit the
# artifacts. This gate counts the three classic mojibake lead
# sequences per document and rejects documents whose artifact density
# crosses an integer milli threshold. Corruption is PLANTED by
# deterministic in-row rules (the q165 repost-augmentation idiom) so
# both engines score the identical corrupted corpus: doc_id % 7 == 3
# re-encodes every 'a', else doc_id % 11 == 5 re-encodes every 'e'.
# The reference stores whatever bytes the page served (it never
# audits encoding; src/thread_crawler.py).
#
# Scale shape: corruption, counting (length-difference folds — no
# regex backtracking, no explode) and the verdict are all in-row;
# the ONLY exchange is the display sort. Counting by length diff is
# O(|text|) single-pass and JVM-codegen'd.
# ---------------------------------------------------------------------------

_Q171_ORACLE = """
WITH c AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 3 THEN replace(text, 'a', 'Ã¡')
              WHEN doc_id % 11 = 5 THEN replace(text, 'e', 'â€™')
              ELSE text END AS t
  FROM documents
),
m AS (
  SELECT doc_id, source, length(t) AS n_chars,
         (length(t) - length(replace(t, 'Ã', '')))
         + (length(t) - length(replace(t, 'â€', ''))) // 2
         + (length(t) - length(replace(t, 'Â', ''))) AS n_moji
  FROM c
)
SELECT doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_moji AS BIGINT) AS n_moji,
       CAST(1000 * n_moji // n_chars AS BIGINT) AS moji_milli,
       CASE WHEN 1000 * n_moji // n_chars >= 5 THEN 'reject' ELSE 'clean' END AS verdict
FROM m ORDER BY doc_id
"""


@register("q171_mojibake_gate", oracle=_Q171_ORACLE)
def q171_mojibake_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mojibake density and reject/clean verdict: planted
    double-encoding corruption, length-difference artifact counting,
    integer milli gate — all in-row, zero shuffles before the sort."""
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    t = (
        F.when(F.col("doc_id") % 7 == 3, F.regexp_replace("text", "a", "Ã¡"))
        .when(F.col("doc_id") % 11 == 5, F.regexp_replace("text", "e", "â€™"))
        .otherwise(F.col("text"))
    )
    c = docs.select("doc_id", "source", t.alias("t"))
    n_moji = (
        (F.length("t") - F.length(F.regexp_replace("t", "Ã", "")))
        + F.expr("(length(t) - length(regexp_replace(t, 'â€', ''))) div 2")
        + (F.length("t") - F.length(F.regexp_replace("t", "Â", "")))
    )
    m = c.select(
        "doc_id",
        "source",
        F.length("t").cast("long").alias("n_chars"),
        n_moji.cast("long").alias("n_moji"),
    )
    milli = F.expr("1000 * n_moji div n_chars").cast("long")
    return m.select(
        "doc_id",
        "source",
        "n_chars",
        "n_moji",
        milli.alias("moji_milli"),
        F.when(milli >= 5, F.lit("reject")).otherwise(F.lit("clean")).alias("verdict"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q172: latency-adaptive politeness — q125 reacts to ERRORS (suspend /
# slow / healthy from status streaks); this query adapts to server
# SPEED before errors ever appear: fold the fetch log into per-host
# 50 ms latency histograms, read p50/p95 off the cumulative bin counts
# (the q118 histogram-quantile idiom, keyed per host), and set the
# polite inter-request interval to 2x the p95 upper bound, floored at
# 200 ms — slow servers automatically get gentler pacing, which is
# what keeps them answering at all. The reference hard-codes one
# global sleep regardless of server behaviour (src/crawler.py).
#
# Latency synth from `events`: host = e % 97; baseline 50 + (h % 1000)
# ms, hosts with host % 13 == 2 run 3x-tailed (50 + h % 3000) — the
# planted slow set. p95 is integer-exact: smallest bin with
# 20*cum >= 19*n.
#
# Scale shape: one (host, bin) hash aggregate folds the fetch log
# (partial-combining; the shuffle carries |hosts| x |bins| <= 97 x 61
# rows here, bounded by hosts x 61 at any scale); the quantile window
# runs per host over <= 61 bins, never over fetches. Adaptation rule
# is in-row on the per-host rollup.
# ---------------------------------------------------------------------------

_Q172_ORACLE = """
WITH f AS (
  SELECT event_id % 97 AS host,
         50 + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
              % (CASE WHEN event_id % 97 % 13 = 2 THEN 3000 ELSE 1000 END) AS lat
  FROM events
),
g AS (SELECT host, lat // 50 AS bin, COUNT(*) AS c FROM f GROUP BY 1, 2),
w AS (
  SELECT *, SUM(c) OVER (PARTITION BY host ORDER BY bin) AS cum,
            SUM(c) OVER (PARTITION BY host) AS n
  FROM g
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(MAX(n) AS BIGINT) AS n_fetches,
       CAST(MIN(CASE WHEN 2 * cum >= n THEN bin END) AS BIGINT) AS p50_bin,
       CAST(MIN(CASE WHEN 20 * cum >= 19 * n THEN bin END) AS BIGINT) AS p95_bin,
       CAST(GREATEST(200, (MIN(CASE WHEN 20 * cum >= 19 * n THEN bin END) + 1) * 50 * 2)
            AS BIGINT) AS interval_ms,
       CASE WHEN (MIN(CASE WHEN 20 * cum >= 19 * n THEN bin END) + 1) * 50 >= 1500
            THEN 'slow' ELSE 'normal' END AS verdict
FROM w GROUP BY host ORDER BY host
"""


@register("q172_latency_politeness", oracle=_Q172_ORACLE)
def q172_latency_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host p50/p95 latency from 50 ms histogram bins and the
    2x-p95 adaptive politeness interval (200 ms floor): one bounded
    (host, bin) aggregate, per-host window over <= 61 bins."""
    from pyspark.sql import Window

    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    host = F.col("event_id") % 97
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    lat = F.lit(50) + h % F.when(host % 13 == 2, 3000).otherwise(1000)
    f = ev.select(host.alias("host"), lat.alias("lat"))
    g = f.groupBy("host", F.expr("lat div 50").alias("bin")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("host")
    b = g.withColumn("cum", F.sum("c").over(w.orderBy("bin"))).withColumn(
        "n", F.sum("c").over(w)
    )
    p95 = F.min(F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("bin")))
    out = b.groupBy(F.col("host").cast("long").alias("host")).agg(
        F.max("n").cast("long").alias("n_fetches"),
        F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("bin")))
        .cast("long")
        .alias("p50_bin"),
        p95.cast("long").alias("p95_bin"),
        F.greatest(F.lit(200), (p95 + 1) * 50 * 2).cast("long").alias("interval_ms"),
        F.when((p95 + 1) * 50 >= 1500, F.lit("slow"))
        .otherwise(F.lit("normal"))
        .alias("verdict"),
    )
    return out.orderBy("host")


# ---------------------------------------------------------------------------
# q175: effective crawl-delay — the politeness interval a fetcher must
# actually honor is the MAX of what the server DECLARES (robots.txt
# Crawl-delay) and what its observed speed DEMANDS (q172's 2x-p95
# adaptation), floored at 200 ms. This query composes the two: q172's
# latency rollup joined (broadcast — |hosts| rows) against the
# declared-delay table, with a 'binding' column naming which
# constraint won — the number ops tune when a host crawls too slowly.
# Declared delays synth by host % 5 (0 -> 5 s, 1 -> 1 s, else none).
#
# Scale shape: everything downstream of q172's bounded histogram is
# per-host rows (|hosts|, not fetches); the merge is in-row. The
# DuckDB oracle wraps the IDENTICAL q172 SQL as a CTE — composition
# parity, not re-derivation.
# ---------------------------------------------------------------------------

_Q175_ORACLE = f"""
WITH q172 AS ({_Q172_ORACLE}),
m AS (
  SELECT host, n_fetches, interval_ms AS adaptive_ms,
         CAST(CASE host % 5 WHEN 0 THEN 5000 WHEN 1 THEN 1000 ELSE 0 END AS BIGINT)
           AS robots_ms
  FROM q172
)
SELECT host, n_fetches, robots_ms, adaptive_ms,
       GREATEST(robots_ms, adaptive_ms) AS effective_ms,
       CASE WHEN robots_ms >= adaptive_ms AND robots_ms > 0 THEN 'robots'
            WHEN adaptive_ms > 200 THEN 'latency'
            ELSE 'floor' END AS binding
FROM m ORDER BY host
"""


@register("q175_effective_crawl_delay", oracle=_Q175_ORACLE)
def q175_effective_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max of declared (robots Crawl-delay) and adaptive (q172 2x-p95)
    politeness per host, with the binding constraint named — in-row
    merge over q172's bounded per-host rollup."""
    q = q172_latency_politeness(spark, sf_dir).select(
        "host", "n_fetches", F.col("interval_ms").alias("adaptive_ms")
    )
    robots = (
        F.when(F.col("host") % 5 == 0, 5000)
        .when(F.col("host") % 5 == 1, 1000)
        .otherwise(0)
        .cast("long")
    )
    m = q.withColumn("robots_ms", robots)
    return (
        m.select(
            "host",
            "n_fetches",
            "robots_ms",
            "adaptive_ms",
            F.greatest("robots_ms", "adaptive_ms").alias("effective_ms"),
            F.when(
                (F.col("robots_ms") >= F.col("adaptive_ms")) & (F.col("robots_ms") > 0),
                F.lit("robots"),
            )
            .when(F.col("adaptive_ms") > 200, F.lit("latency"))
            .otherwise(F.lit("floor"))
            .alias("binding"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q177: frontier age audit — politeness throttling means a host's
# queue DRAINS at a fixed rate no matter how fast discovery fills it;
# when fill outruns drain the host's URLs age forever and the crawl
# silently stops covering it. This query folds the queued frontier to
# per-host (depth, age) stats, computes rounds-to-drain against the
# host's politeness budget, and flags starving hosts — the signal
# that drives budget bumps (q102 apportions budget; this audits
# whether the apportionment keeps up). The reference's queue is one
# in-memory list with no aging concept (src/main.py).
#
# Queue synth from `events`: host = e % 67, enqueue age in seconds
# = h % 100000; per-host budget/round = 50 + (host % 5) * 150 —
# identical integer rules both engines.
#
# Scale shape: ONE partial-combining host aggregate folds the queue
# (count / min / max / sum age partials); drain math and the verdict
# are in-row on the |hosts| rollup. No joins, no windows.
# ---------------------------------------------------------------------------

_Q177_ORACLE = """
WITH q AS (
  SELECT event_id % 67 AS host,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
           % 100000 AS age_s
  FROM events
),
h AS (
  SELECT host, COUNT(*) AS n_queued, MAX(age_s) AS oldest_s,
         SUM(age_s) // COUNT(*) AS mean_age_s
  FROM q GROUP BY host
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(n_queued AS BIGINT) AS n_queued,
       CAST(oldest_s AS BIGINT) AS oldest_s,
       CAST(mean_age_s AS BIGINT) AS mean_age_s,
       CAST(50 + host % 5 * 150 AS BIGINT) AS budget_per_round,
       CAST((n_queued + 50 + host % 5 * 150 - 1) // (50 + host % 5 * 150) AS BIGINT)
         AS drain_rounds,
       CASE WHEN (n_queued + 50 + host % 5 * 150 - 1) // (50 + host % 5 * 150) > 100
              THEN 'starving'
            WHEN (n_queued + 50 + host % 5 * 150 - 1) // (50 + host % 5 * 150) > 10
              THEN 'backlogged'
            ELSE 'healthy' END AS verdict
FROM h ORDER BY host
"""


@register("q177_frontier_age_audit", oracle=_Q177_ORACLE)
def q177_frontier_age_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host queue depth/age and rounds-to-drain vs politeness
    budget, with starving/backlogged/healthy verdicts: one bounded
    host fold, in-row drain math."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    q = ev.select(
        (F.col("event_id") % 67).alias("host"),
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 100000
        ).alias("age_s"),
    )
    h = q.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_queued"),
        F.max("age_s").alias("oldest_s"),
        F.expr("sum(age_s) div count(1)").alias("mean_age_s"),
    )
    budget = F.lit(50) + F.col("host") % 5 * 150
    drain = F.expr("(n_queued + 50 + host % 5 * 150 - 1) div (50 + host % 5 * 150)")
    return (
        h.select(
            F.col("host").cast("long").alias("host"),
            F.col("n_queued").cast("long").alias("n_queued"),
            F.col("oldest_s").cast("long").alias("oldest_s"),
            F.col("mean_age_s").cast("long").alias("mean_age_s"),
            budget.cast("long").alias("budget_per_round"),
            drain.cast("long").alias("drain_rounds"),
            F.when(drain > 100, F.lit("starving"))
            .when(drain > 10, F.lit("backlogged"))
            .otherwise(F.lit("healthy"))
            .alias("verdict"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q183: schedule fairness — host-skew salting (B5) protects THROUGHPUT
# from a dominant host, but a scheduler can be fast and still unfair:
# if big hosts absorb the whole round budget, small hosts starve (the
# q177 age audit sees the symptom; this measures the cause). Jain's
# fairness index (sum x)^2 / (n * sum x^2) over per-host scheduled
# counts is the standard scalar: 1000 milli = perfectly even, 1000/n =
# one host takes everything. The reference crawls one host, so
# fairness is undefined there.
#
# Scale shape: one partial-combining host fold (count per host), then
# a single 1-row aggregate over |hosts| rows — sums, sum of squares,
# max — and integer milli arithmetic in-row. (sum x)^2 <= (10^10)^2
# overflows int64 at full frontier scale; production computes the
# index per apportionment shard (q102's grain) where x sums are
# bounded by shard budget — documented, and the small-scale values
# here stay well inside int64.
# ---------------------------------------------------------------------------

_Q183_ORACLE = """
WITH h AS (
  SELECT event_id % 41 AS host, COUNT(*) AS x FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(x) AS BIGINT) AS n_scheduled,
       CAST(MAX(x) AS BIGINT) AS max_one_host,
       CAST(1000 * MAX(x) // SUM(x) AS BIGINT) AS max_share_milli,
       CAST(1000 * SUM(x) * SUM(x) // (COUNT(*) * SUM(x * x)) AS BIGINT)
         AS jain_milli
FROM h
"""


@register("q183_schedule_fairness", oracle=_Q183_ORACLE)
def q183_schedule_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain fairness index (integer milli) + max-share over per-host
    scheduled counts: one host fold, one 1-row rollup."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    h = ev.groupBy((F.col("event_id") % 41).alias("host")).agg(
        F.count(F.lit(1)).alias("x")
    )
    return h.agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("x").cast("long").alias("n_scheduled"),
        F.max("x").cast("long").alias("max_one_host"),
        F.expr("cast(1000 * max(x) div sum(x) as bigint)").alias("max_share_milli"),
        F.expr(
            "cast(1000 * sum(x) * sum(x) div (count(1) * sum(x * x)) as bigint)"
        ).alias("jain_milli"),
    )


# ---------------------------------------------------------------------------
# q190: priority-signal fusion — the frontier's packed `_pri` (B6) is
# one 64-bit integer, but a production crawl derives it from several
# signals: importance (OPIC cash / q101), freshness pressure (q100's
# change tiers), host health (q125), and a fairness correction
# (q183's max-share). This query AUDITS the fusion: derive each signal
# by the engine's integer rules, pack them into the priority fields
# (importance 16 bits << 32 | freshness 8 bits << 24 | health 8 bits
# << 16 | fair 16 bits), and verify the packed order equals the
# lexicographic order of the tuple — the property that makes ONE sort
# key encode a multi-criteria policy. All integer; both engines pack
# identically.
#
# Signals synth from `events` per URL u = e % 499: importance =
# h % 65536, freshness tier = h div 7 % 4, health = (u % 23) % 3,
# fairness penalty = u % 97 (hosts with more queued URLs pay more).
#
# Scale shape: one projection computes all four fields and the packed
# key in-row; the audit aggregate (count per (tier, health) cell plus
# min/max packed key) is bounded by the 4 x 3 signal domain. The
# frontier shuffles once for the rollup; ordering correctness is the
# in-row bit arithmetic.
# ---------------------------------------------------------------------------

_Q190_ORACLE = """
WITH b AS (
  SELECT event_id % 499 AS u,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
s AS (
  SELECT u, h % 65536 AS imp, (h // 7) % 4 AS fresh,
         (u % 23) % 3 AS health, u % 97 AS fair
  FROM b
),
p AS (
  SELECT *, (imp << 32) + (fresh << 24) + (health << 16) + fair AS pri
  FROM s
)
SELECT CAST(fresh AS BIGINT) AS fresh, CAST(health AS BIGINT) AS health,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(MIN(pri) AS BIGINT) AS pri_min,
       CAST(MAX(pri) AS BIGINT) AS pri_max,
       CAST(SUM(CASE WHEN (pri >> 32) = imp
                      AND ((pri >> 24) & 255) = fresh
                      AND ((pri >> 16) & 255) = health
                      AND (pri & 65535) = fair
                THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
FROM p GROUP BY 1, 2 ORDER BY fresh, health
"""


@register("q190_priority_fusion", oracle=_Q190_ORACLE)
def q190_priority_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack importance/freshness/health/fairness into one 64-bit
    priority and audit the field round-trip per signal cell — the
    multi-criteria-in-one-sort-key property B6 relies on."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    b = ev.select(
        (F.col("event_id") % 499).alias("u"),
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    s = b.select(
        "u",
        (F.col("h") % 65536).alias("imp"),
        (F.expr("h div 7") % 4).alias("fresh"),
        ((F.col("u") % 23) % 3).alias("health"),
        (F.col("u") % 97).alias("fair"),
    )
    p = s.withColumn(
        "pri",
        F.shiftleft("imp", 32) + F.shiftleft("fresh", 24) + F.shiftleft("health", 16)
        + F.col("fair"),
    )
    rt = (
        (F.shiftright("pri", 32) == F.col("imp"))
        & (F.shiftright("pri", 24).bitwiseAND(F.lit(255)) == F.col("fresh"))
        & (F.shiftright("pri", 16).bitwiseAND(F.lit(255)) == F.col("health"))
        & (F.col("pri").bitwiseAND(F.lit(65535)) == F.col("fair"))
    )
    return (
        p.groupBy(
            F.col("fresh").cast("long").alias("fresh"),
            F.col("health").cast("long").alias("health"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("pri").cast("long").alias("pri_min"),
            F.max("pri").cast("long").alias("pri_max"),
            F.sum(F.when(rt, 1).otherwise(0)).cast("long").alias("n_roundtrip_ok"),
        )
        .orderBy("fresh", "health")
    )


# ---------------------------------------------------------------------------
# q191: sitemap-robots cross-check — a site whose sitemap advertises
# URLs its own robots.txt disallows is misconfigured; fetching those
# URLs wastes budget AND violates the stricter-signal-wins etiquette
# (robots wins). This query joins advertised paths against the host's
# disallow prefixes and reports, per host, how much of the sitemap is
# robots-dead — the q110/q111 rule set applied to the q94 ingest
# surface. Synth: host k in 0..11 advertises paths /t/{i} for
# i in 0..(20 + k*5); disallow prefix '/t/1' for k % 3 == 0 hosts
# (kills /t/1, /t/10..19) and '/t/' for k % 7 == 5 (kills all).
#
# Scale shape: the sitemap table joins the disallow table on HOST
# (politeness-bounded key); prefix match is in-row starts_with over
# the handful of rules a host has; the rollup is per host. Same shape
# as B9's per-host prefix-array robots evaluation.
# ---------------------------------------------------------------------------

_Q191_ORACLE = """
WITH sm AS (
  SELECT CAST(e.k AS BIGINT) AS host, '/t/' || CAST(i.i AS VARCHAR) AS path
  FROM (SELECT UNNEST(range(12)) AS k) e
  JOIN (SELECT UNNEST(range(120)) AS i) i ON i.i < 20 + e.k * 5
),
rules AS (
  SELECT CAST(k AS BIGINT) AS host,
         CASE WHEN k % 7 = 5 THEN '/t/'
              WHEN k % 3 = 0 THEN '/t/1'
              ELSE NULL END AS dis
  FROM (SELECT UNNEST(range(12)) AS k)
),
j AS (
  SELECT sm.host, sm.path,
         CASE WHEN r.dis IS NOT NULL AND starts_with(sm.path, r.dis)
              THEN 1 ELSE 0 END AS dead
  FROM sm LEFT JOIN rules r ON r.host = sm.host
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_advertised,
       CAST(SUM(dead) AS BIGINT) AS n_robots_dead,
       CAST(1000 * SUM(dead) // COUNT(*) AS BIGINT) AS dead_milli,
       CASE WHEN SUM(dead) = COUNT(*) THEN 'all-dead'
            WHEN 1000 * SUM(dead) // COUNT(*) >= 200 THEN 'misconfigured'
            WHEN SUM(dead) > 0 THEN 'minor'
            ELSE 'clean' END AS verdict
FROM j GROUP BY host ORDER BY host
"""


@register("q191_sitemap_robots_crosscheck", oracle=_Q191_ORACLE)
def q191_sitemap_robots_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host share of sitemap-advertised URLs the host's own robots
    disallows (robots wins): host-keyed join, in-row prefix match,
    bounded rollup with misconfiguration verdicts."""
    hosts = spark.range(12).select(F.col("id").alias("k"))
    idx = spark.range(120).select(F.col("id").alias("i"))
    sm = (
        hosts.join(idx, idx["i"] < 20 + hosts["k"] * 5)
        .select(
            F.col("k").cast("long").alias("host"),
            F.concat(F.lit("/t/"), F.col("i").cast("string")).alias("path"),
        )
    )
    rules = hosts.select(
        F.col("k").cast("long").alias("host"),
        F.when(F.col("k") % 7 == 5, F.lit("/t/"))
        .when(F.col("k") % 3 == 0, F.lit("/t/1"))
        .alias("dis"),
    )
    j = sm.join(F.broadcast(rules), "host", "left").withColumn(
        "dead",
        F.when(
            F.col("dis").isNotNull() & F.col("path").startswith(F.col("dis")), 1
        ).otherwise(0),
    )
    g = j.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_advertised"),
        F.sum("dead").cast("long").alias("n_robots_dead"),
    )
    milli = F.expr("1000 * n_robots_dead div n_advertised").cast("long")
    return (
        g.select(
            "host",
            "n_advertised",
            "n_robots_dead",
            milli.alias("dead_milli"),
            F.when(F.col("n_robots_dead") == F.col("n_advertised"), F.lit("all-dead"))
            .when(milli >= 200, F.lit("misconfigured"))
            .when(F.col("n_robots_dead") > 0, F.lit("minor"))
            .otherwise(F.lit("clean"))
            .alias("verdict"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q199: seen-set anti-entropy — a 10^10-URL seen filter runs as
# replicated shards (the recrawl scheduler and the frontier dedupe
# each hold one), and replicas drift: a crashed round commits to one
# copy but not the other. Reconciling by shipping full tables is a
# 10^10-row exchange; the Merkle/anti-entropy shape (Dynamo, Cassandra
# repair) compares BUCKET DIGESTS first and exchanges rows only for
# buckets whose digests disagree.
#
# Scale shape: pass 1 computes (count, bit_xor(urlhash)) per bucket on
# each replica — partial-combining aggregates, one bounded-key shuffle
# per side. The digest table is O(#buckets) — a design constant (64
# here, ~2^20 in production) — so collecting the dirty-bucket list to
# the driver is O(1)-bounded work (the graph top-100 precedent).
# Pass 2 re-reads ONLY the dirty buckets: the replicas are stored
# partition-by-bucket, so the dirty-bucket IN-list becomes a
# PartitionFilter and the repair scan never touches clean data
# (plan-asserted in tests). The row diff is then anti-joins over the
# pruned slices — proportional to the DRIFT, never to the corpus.
#
# Fixture: two write-once replicas derived from the same 20k-key
# universe (u, h = 60-bit md5 of u, bucket = h % 64). Drift is
# LOCALIZED the way a crashed round's partial commit is: replica A is
# missing keys in bucket 7 with h % 13 == 0, replica B missing keys in
# bucket 42 with h % 11 == 0 — disjoint by bucket, deterministic, no
# RNG — so the pruning claim is falsifiable: 62 of 64 partitions must
# NOT appear in the repair scan. Digests use bit_xor(h):
# order-independent, partial-combining, identical in DuckDB and Spark.
# ---------------------------------------------------------------------------

Q199_REPLICA_A = "/tmp/voz_spark_q199_replica_a"
Q199_REPLICA_B = "/tmp/voz_spark_q199_replica_b"
_Q199_TAG = "q199:n20000:b64:v2"


def _q199_replica(spark: SparkSession, path: str, drop_bucket: int, drop_mod: int) -> DataFrame:
    """Write-once bucket-partitioned replica (the _materialized pattern
    with partitionBy so pass 2 can prune): keeps a data-column copy
    ``bucket_c`` because partitionBy lifts ``bucket`` into the path."""
    import os

    marker = os.path.join(path, "_VOZ_FIXTURE")
    try:
        with open(marker) as fh:
            have = fh.read()
    except OSError:
        have = None
    if have != _Q199_TAG:
        base = spark.range(20000).select(
            F.col("id").alias("u"),
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        rep = (
            base.withColumn("bucket_c", (F.col("h") % 64).cast("long"))
            .where(
                ~((F.col("bucket_c") == drop_bucket) & (F.col("h") % drop_mod == 0))
            )
            .withColumn("bucket", F.col("bucket_c"))
        )
        rep.repartition(4).write.mode("overwrite").partitionBy("bucket").parquet(path)
        with open(marker, "w") as fh:
            fh.write(_Q199_TAG)
    return spark.read.parquet(path)


_Q199_ORACLE = f"""
WITH a AS (SELECT u, h, bucket_c FROM read_parquet('{Q199_REPLICA_A}/*/*.parquet')),
b AS (SELECT u, h, bucket_c FROM read_parquet('{Q199_REPLICA_B}/*/*.parquet')),
da AS (SELECT bucket_c AS bucket, COUNT(*) AS n_a, bit_xor(h) AS xr_a FROM a GROUP BY 1),
db AS (SELECT bucket_c AS bucket, COUNT(*) AS n_b, bit_xor(h) AS xr_b FROM b GROUP BY 1),
dirty AS (
  SELECT da.bucket, n_a, n_b FROM da JOIN db USING (bucket)
  WHERE n_a <> n_b OR xr_a <> xr_b
),
ma AS (
  SELECT b.bucket_c AS bucket, COUNT(*) AS miss_a, MIN(b.u) AS first_a
  FROM b ANTI JOIN a USING (u)
  WHERE b.bucket_c IN (SELECT bucket FROM dirty) GROUP BY 1
),
mb AS (
  SELECT a.bucket_c AS bucket, COUNT(*) AS miss_b, MIN(a.u) AS first_b
  FROM a ANTI JOIN b USING (u)
  WHERE a.bucket_c IN (SELECT bucket FROM dirty) GROUP BY 1
)
SELECT dirty.bucket,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(COALESCE(miss_a, 0) AS BIGINT) AS n_missing_in_a,
       CAST(COALESCE(miss_b, 0) AS BIGINT) AS n_missing_in_b,
       CAST(COALESCE(first_a, -1) AS BIGINT) AS first_missing_in_a,
       CAST(COALESCE(first_b, -1) AS BIGINT) AS first_missing_in_b
FROM dirty LEFT JOIN ma USING (bucket) LEFT JOIN mb USING (bucket)
ORDER BY bucket
"""


@register("q199_seen_antientropy", oracle=_Q199_ORACLE)
def q199_seen_antientropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style replica reconciliation: per-bucket (count, xor)
    digests find drifted buckets; only those buckets are re-read
    (partition-pruned) and row-diffed via anti-joins."""
    a = _q199_replica(spark, Q199_REPLICA_A, 7, 13)
    b = _q199_replica(spark, Q199_REPLICA_B, 42, 11)
    da = a.groupBy(F.col("bucket_c").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.expr("bit_xor(h)").alias("xr_a"),
    )
    db = b.groupBy(F.col("bucket_c").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.expr("bit_xor(h)").alias("xr_b"),
    )
    dirty_rows = (
        da.join(db, "bucket")
        .where((F.col("n_a") != F.col("n_b")) | (F.col("xr_a") != F.col("xr_b")))
        .select("bucket", "n_a", "n_b")
        .collect()  # O(#buckets) bounded: 64 here, a design constant
    )
    buckets = [int(r["bucket"]) for r in dirty_rows]
    # pass 2: partition-pruned repair reads — only dirty buckets
    ar = a.where(F.col("bucket").isin(buckets)).select("u", "bucket_c")
    br = b.where(F.col("bucket").isin(buckets)).select("u", "bucket_c")
    ma = (
        br.join(ar.select("u"), "u", "left_anti")
        .groupBy(F.col("bucket_c").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("miss_a"),
            F.min("u").cast("long").alias("first_a"),
        )
    )
    mb = (
        ar.join(br.select("u"), "u", "left_anti")
        .groupBy(F.col("bucket_c").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("miss_b"),
            F.min("u").cast("long").alias("first_b"),
        )
    )
    dirty = spark.createDataFrame(dirty_rows, "bucket long, n_a long, n_b long")
    return (
        dirty.join(ma, "bucket", "left")
        .join(mb, "bucket", "left")
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.coalesce("miss_a", F.lit(0)).cast("long").alias("n_missing_in_a"),
            F.coalesce("miss_b", F.lit(0)).cast("long").alias("n_missing_in_b"),
            F.coalesce("first_a", F.lit(-1)).cast("long").alias("first_missing_in_a"),
            F.coalesce("first_b", F.lit(-1)).cast("long").alias("first_missing_in_b"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q201: explore/exploit crawl policy — which hosts get fetch slots
# next round? Pure exploitation (rank by observed yield) starves hosts
# the crawler has barely sampled; the bandit fix adds an exploration
# bonus that shrinks as a host accumulates trials (UCB shape) plus a
# small deterministic epsilon-explore set. The reference fetches every
# page of one forum unconditionally (src/main.py:153-200) — it has no
# yield model at all.
#
# Float discipline: the bonus is floor(1000 * sqrt(32.0 / n)). Every
# step is IEEE-754 correctly-rounded (int→double exact, one division,
# one sqrt, one multiply) so DuckDB and Spark produce bit-identical
# doubles and the floor lands identically — no libm-dependent ln/log
# anywhere (the ln N term of textbook UCB1 is frozen into the 32.0
# constant, recomputed once per epoch by the scheduler, which keeps
# the per-host math distributed and engine-portable). Yield means are
# integer milli (1000*s div n), never float-compared.
#
# Scale shape: one partial-combining rollup over the fetch log keyed
# by host; the policy columns are in-row expressions on the bounded
# per-host table; scheduling uses a closed-form cutoff — no global
# window, no driver-side ranking of 10^8 hosts.
# ---------------------------------------------------------------------------

_Q201_ORACLE = """
WITH f AS (
  SELECT event_id % 53 AS host,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
t AS (
  SELECT host,
         COUNT(*) AS n_trials,
         SUM(CASE WHEN h % 5 < host % 4 + 1 THEN 1 ELSE 0 END) AS n_success
  FROM f GROUP BY 1
),
p AS (
  SELECT host, n_trials, n_success,
         1000 * n_success // n_trials AS mean_milli,
         CAST(FLOOR(1000.0 * sqrt(32.0 / n_trials)) AS BIGINT) AS bonus_milli,
         CAST('0x' || substr(md5('host:' || CAST(host AS VARCHAR)), 1, 15) AS BIGINT)
           % 1000 < 50 AS explore
  FROM t
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(n_trials AS BIGINT) AS n_trials,
       CAST(n_success AS BIGINT) AS n_success,
       CAST(mean_milli AS BIGINT) AS mean_milli,
       bonus_milli,
       CAST(mean_milli + bonus_milli AS BIGINT) AS ucb_milli,
       CASE WHEN explore THEN 'explore' ELSE 'exploit' END AS decision,
       CASE WHEN explore OR mean_milli + bonus_milli >= 400 THEN 1 ELSE 0 END
         AS scheduled
FROM p ORDER BY ucb_milli DESC, host
"""


@register("q201_crawl_policy_ucb", oracle=_Q201_ORACLE)
def q201_crawl_policy_ucb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bandit crawl policy: per-host yield rollup, UCB-style bonus
    shrinking with trials (IEEE-exact sqrt, frozen ln-term), epsilon
    exploration by hash, closed-form scheduling cutoff — no window."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    f = ev.select(
        (F.col("event_id") % 53).alias("host"),
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    t = f.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_trials"),
        F.sum(
            F.when(F.col("h") % 5 < F.col("host") % 4 + 1, 1).otherwise(0)
        ).alias("n_success"),
    )
    mean_milli = F.expr("1000 * n_success div n_trials")
    bonus = F.floor(F.lit(1000.0) * F.sqrt(F.lit(32.0) / F.col("n_trials"))).cast(
        "long"
    )
    explore = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("host:"), F.col("host").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1000
        < 50
    )
    p = t.select(
        F.col("host").cast("long").alias("host"),
        F.col("n_trials").cast("long").alias("n_trials"),
        F.col("n_success").cast("long").alias("n_success"),
        mean_milli.cast("long").alias("mean_milli"),
        bonus.alias("bonus_milli"),
        explore.alias("explore"),
    )
    return p.select(
        "host",
        "n_trials",
        "n_success",
        "mean_milli",
        "bonus_milli",
        (F.col("mean_milli") + F.col("bonus_milli")).cast("long").alias("ucb_milli"),
        F.when(F.col("explore"), F.lit("explore"))
        .otherwise(F.lit("exploit"))
        .alias("decision"),
        F.when(
            F.col("explore") | (F.col("mean_milli") + F.col("bonus_milli") >= 400),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("scheduled"),
    ).orderBy(F.col("ucb_milli").desc(), "host")


# ---------------------------------------------------------------------------
# q202: count-min heavy hitters — "which hosts dominate the fetch
# log?" asked WITHOUT a per-host exact aggregate. At 10^8 distinct
# hosts the exact groupBy's hash table is the cost; the count-min
# sketch (Cormode & Muthukrishnan 2005) folds the stream into a
# depth×width cell grid (4×256 here; 4×2^20 in production) whose size
# is a DESIGN CONSTANT, independent of the key domain. Estimates are
# one-sided: est >= true always (collisions only add), and
# est <= true + eps*N with high probability.
#
# Scale shape: the build is ONE partial-combining aggregate over
# (depth, cell) — 1,024 distinct keys no matter how many hosts — so
# map-side combine collapses each task's contribution to <=1,024 rows
# before the only shuffle. The estimate pass joins a bounded CANDIDATE
# set (distinct hosts here; a sampled candidate stream in production)
# against the BROADCAST sketch — broadcast-safe by construction, the
# sketch is 1,024 rows at any corpus size. The exact per-host counts
# computed alongside are the AUDIT (this is the query that validates
# the sketch's error), not part of the production read path.
#
# Fixture: hosts planted Zipf-ish from events — hot_a 40%, hot_b 20%,
# a 211-host tail sharing the rest. Cell hashes are md5(depth|host),
# identical in DuckDB and Spark.
# ---------------------------------------------------------------------------

_Q202_DEPTH = 4
_Q202_WIDTH = 256

_Q202_ORACLE = f"""
WITH f AS (
  SELECT CASE WHEN event_id % 5 < 2 THEN 'hot_a'
              WHEN event_id % 5 = 2 THEN 'hot_b'
              ELSE 'h' || CAST(event_id % 211 AS VARCHAR) END AS host
  FROM events
),
tot AS (SELECT COUNT(*) AS n_total FROM f),
d AS (SELECT * FROM (VALUES (0),(1),(2),(3)) AS t(depth)),
cells AS (
  SELECT depth,
         CAST('0x' || substr(md5(CAST(depth AS VARCHAR) || '|' || host), 1, 15)
              AS BIGINT) % {_Q202_WIDTH} AS cell,
         COUNT(*) AS cell_n
  FROM f CROSS JOIN d GROUP BY 1, 2
),
truth AS (SELECT host, COUNT(*) AS true_n FROM f GROUP BY 1),
cand AS (
  SELECT host, depth,
         CAST('0x' || substr(md5(CAST(depth AS VARCHAR) || '|' || host), 1, 15)
              AS BIGINT) % {_Q202_WIDTH} AS cell
  FROM truth CROSS JOIN d
),
est AS (
  SELECT cand.host, MIN(cells.cell_n) AS est_n
  FROM cand JOIN cells USING (depth, cell) GROUP BY 1
)
SELECT truth.host,
       CAST(true_n AS BIGINT) AS true_n,
       CAST(est_n AS BIGINT) AS est_n,
       CAST(est_n - true_n AS BIGINT) AS overcount,
       CAST(CASE WHEN est_n * 100 >= n_total THEN 1 ELSE 0 END AS INT) AS is_heavy
FROM truth JOIN est USING (host) CROSS JOIN tot
ORDER BY est_n DESC, host
"""


@register("q202_countmin_heavy_hitters", oracle=_Q202_ORACLE)
def q202_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build (one bounded-key aggregate) + candidate
    estimates (broadcast 1,024-row sketch), audited against exact."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    f = ev.select(
        F.when(F.col("event_id") % 5 < 2, F.lit("hot_a"))
        .when(F.col("event_id") % 5 == 2, F.lit("hot_b"))
        .otherwise(
            F.concat(F.lit("h"), (F.col("event_id") % 211).cast("string"))
        )
        .alias("host")
    )

    def _cell(depth_col, host_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(depth_col.cast("string"), F.lit("|"), host_col)),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _Q202_WIDTH
        )

    depths = F.array(*[F.lit(i) for i in range(_Q202_DEPTH)])
    # build: explode the stream over the 4 hash rows, partial-combining
    # aggregate on the bounded (depth, cell) domain — the only shuffle
    # over the full log
    cells = (
        f.select("host", F.explode(depths).alias("depth"))
        .select("depth", _cell(F.col("depth"), F.col("host")).alias("cell"))
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )
    truth = f.groupBy("host").agg(F.count(F.lit(1)).alias("true_n"))
    tot = f.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    cand = truth.select("host", F.explode(depths).alias("depth")).select(
        "host", "depth", _cell(F.col("depth"), F.col("host")).alias("cell")
    )
    # the sketch is <=depth*width rows BY DESIGN — broadcast-safe at
    # any corpus scale (the q83 bounded-by-construction precedent)
    est = (
        cand.join(F.broadcast(cells), ["depth", "cell"])
        .groupBy("host")
        .agg(F.min("cell_n").alias("est_n"))
    )
    return (
        truth.join(est, "host")
        .crossJoin(F.broadcast(tot))
        .select(
            "host",
            F.col("true_n").cast("long").alias("true_n"),
            F.col("est_n").cast("long").alias("est_n"),
            (F.col("est_n") - F.col("true_n")).cast("long").alias("overcount"),
            F.when(F.col("est_n") * 100 >= F.col("n_total"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_heavy"),
        )
        .orderBy(F.col("est_n").desc(), "host")
    )


# ---------------------------------------------------------------------------
# q203: edge-partition replication audit — the link graph's pagerank/
# HITS/degree jobs (q101, q128, q189) move one message per VERTEX
# REPLICA per iteration, so the partitioner's replication factor IS
# the network bill. This query measures two partitionings of the same
# edge set side by side:
#   1d  — hash by src (Spark's default join/groupBy shape): a vertex's
#         out-edges land on 1 shard, but its in-edges land wherever
#         their srcs hash, so a popular dst replicates onto up to all
#         16 shards, and a hot SRC makes one shard own its entire
#         out-degree (the straggler).
#   2d  — grid vertex-cut (PowerGraph/GraphX 2D): shard = (src%4)*4 +
#         (dst%4); ANY vertex touches <=4 shards as src plus <=4 as
#         dst (<=2*sqrt(P) replicas vs P+1 for 1d), and a hot vertex's
#         edges spread over a full grid row/column — bounded balance
#         by construction, no salting needed.
#
# Scale shape: incidence = union of two projections, one distinct on
# (strategy, vertex, shard) — partial-combining; per-strategy rollups
# are bounded (2 strategies x 16 shards). Nothing driver-side.
#
# Fixture: 211-vertex digraph from events with vertex 0 hot as src
# (30% of edges) and vertex 1 hot as dst (10%) — the Zipf shape that
# makes 1d fall over.
# ---------------------------------------------------------------------------

_Q203_SHARDS = 16

_Q203_EDGES = """
  SELECT CASE WHEN event_id % 10 < 3 THEN 0
              ELSE CAST('0x' || substr(md5('s|' || CAST(event_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % 199 END AS src,
         CASE WHEN event_id % 10 = 3 THEN 1
              ELSE CAST('0x' || substr(md5('d|' || CAST(event_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % 199 END AS dst
  FROM events
"""

_Q203_ORACLE = f"""
WITH e0 AS ({_Q203_EDGES}),
e AS (SELECT src, dst FROM e0 WHERE src <> dst),
sh AS (
  SELECT '1d' AS strategy, src, dst, src % {_Q203_SHARDS} AS shard FROM e
  UNION ALL
  SELECT '2d', src, dst, (src % 4) * 4 + (dst % 4) FROM e
),
loads AS (
  SELECT strategy, shard, COUNT(*) AS n FROM sh GROUP BY 1, 2
),
lr AS (
  SELECT strategy, COUNT(*) AS n_shards_used, MAX(n) AS max_shard_edges,
         SUM(n) AS n_edges
  FROM loads GROUP BY 1
),
inc AS (
  SELECT DISTINCT strategy, v, shard FROM (
    SELECT strategy, src AS v, shard FROM sh
    UNION ALL
    SELECT strategy, dst, shard FROM sh
  )
),
ir AS (
  SELECT strategy, COUNT(*) AS sum_replicas, COUNT(DISTINCT v) AS n_vertices
  FROM inc GROUP BY 1
)
SELECT lr.strategy,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST(n_shards_used AS BIGINT) AS n_shards_used,
       CAST(sum_replicas AS BIGINT) AS sum_replicas,
       CAST(1000 * sum_replicas // n_vertices AS BIGINT) AS avg_replication_milli,
       CAST(max_shard_edges AS BIGINT) AS max_shard_edges,
       CAST(1000 * max_shard_edges * {_Q203_SHARDS} // n_edges AS BIGINT)
         AS load_skew_milli
FROM lr JOIN ir USING (strategy)
ORDER BY strategy
"""


@register("q203_edge_partition_audit", oracle=_Q203_ORACLE)
def q203_edge_partition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1d src-hash vs 2d grid vertex-cut over the same skewed edge
    set: replication factor (comm volume) and worst-shard load."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")

    def _h(salt: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("event_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 199
        )

    e = (
        ev.select(
            F.when(F.col("event_id") % 10 < 3, F.lit(0).cast("long"))
            .otherwise(_h("s|"))
            .alias("src"),
            F.when(F.col("event_id") % 10 == 3, F.lit(1).cast("long"))
            .otherwise(_h("d|"))
            .alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    # both strategies via one in-row explode — a union would re-scan
    # and re-derive the edge set per branch (4 scans total with the
    # incidence union below; this shape needs 2)
    sh = e.select(
        "src",
        "dst",
        F.explode(
            F.array(
                F.struct(
                    F.lit("1d").alias("strategy"),
                    (F.col("src") % _Q203_SHARDS).alias("shard"),
                ),
                F.struct(
                    F.lit("2d").alias("strategy"),
                    ((F.col("src") % 4) * 4 + (F.col("dst") % 4)).alias("shard"),
                ),
            )
        ).alias("t"),
    ).select("src", "dst", "t.strategy", "t.shard")
    loads = sh.groupBy("strategy", "shard").agg(F.count(F.lit(1)).alias("n"))
    lr = loads.groupBy("strategy").agg(
        F.count(F.lit(1)).alias("n_shards_used"),
        F.max("n").alias("max_shard_edges"),
        F.sum("n").alias("n_edges"),
    )
    inc = (
        sh.select(
            "strategy", "shard", F.explode(F.array("src", "dst")).alias("v")
        )
        .distinct()
    )
    ir = inc.groupBy("strategy").agg(
        F.count(F.lit(1)).alias("sum_replicas"),
        F.countDistinct("v").alias("n_vertices"),
    )
    return (
        lr.join(ir, "strategy")
        .select(
            "strategy",
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            F.col("n_shards_used").cast("long").alias("n_shards_used"),
            F.col("sum_replicas").cast("long").alias("sum_replicas"),
            F.expr("1000 * sum_replicas div n_vertices")
            .cast("long")
            .alias("avg_replication_milli"),
            F.col("max_shard_edges").cast("long").alias("max_shard_edges"),
            F.expr(f"1000 * max_shard_edges * {_Q203_SHARDS} div n_edges")
            .cast("long")
            .alias("load_skew_milli"),
        )
        .orderBy("strategy")
    )


# ---------------------------------------------------------------------------
# q208: priority aging without rewrites — starvation control says a
# queued URL's effective priority grows with waiting time:
# eff = base + slope(tier) * (R - enqueue_round) at scheduling round
# R. The naive implementation rewrites 10^10 priorities every round.
# The lazy form stores ONE static key at enqueue time,
# key = base - slope * enqueue_round, because within a tier
# eff = key + slope*R and slope*R is a per-round constant: the
# ordering BY KEY never changes, so aging costs zero writes. Across
# tiers the slopes differ, so the global top-k is the classic
# decomposed merge: each tier's top-k by static key (<= 3k rows),
# eff computed in-row on those, one bounded final sort.
#
# The oracle is the EAGER algorithm (recompute eff for every row,
# global ORDER BY) — two different algorithms, same rows, which is
# the whole claim. Scale shape: per-tier window over tier partitions
# (3 bounded partitions at any frontier size after per-partition
# top-k pushdown via rank filter), final sort on <= 60 rows.
# ---------------------------------------------------------------------------

_Q208_ROUND = 100
_Q208_K = 20

_Q208_FRONTIER = """
  SELECT event_id AS url_id,
         event_id % 3 AS tier,
         CAST('0x' || substr(md5('p|' || CAST(event_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 100000 AS base_pri,
         CAST('0x' || substr(md5('e|' || CAST(event_id AS VARCHAR)), 1, 15)
              AS BIGINT) % 100 AS enq_round,
         CASE event_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 25 ELSE 60 END AS slope
  FROM events
"""

_Q208_ORACLE = f"""
WITH f AS ({_Q208_FRONTIER}),
e AS (
  SELECT url_id, tier, base_pri, enq_round,
         base_pri + slope * ({_Q208_ROUND} - enq_round) AS eff_pri
  FROM f
),
r AS (
  SELECT url_id, tier, base_pri, enq_round, eff_pri,
         ROW_NUMBER() OVER (ORDER BY eff_pri DESC, url_id) AS rank
  FROM e
)
SELECT CAST(rank AS INT) AS rank,
       CAST(url_id AS BIGINT) AS url_id,
       CAST(tier AS BIGINT) AS tier,
       CAST(base_pri AS BIGINT) AS base_pri,
       CAST(enq_round AS BIGINT) AS enq_round,
       CAST(eff_pri AS BIGINT) AS eff_pri
FROM r WHERE rank <= {_Q208_K} ORDER BY rank
"""


@register("q208_priority_aging", oracle=_Q208_ORACLE)
def q208_priority_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy aged scheduling: per-tier top-k by the write-once static
    key, eff recomputed in-row only on the 3k survivors, bounded
    merge — equals the eager global recompute (the oracle)."""
    from pyspark.sql.window import Window

    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")

    def _h(salt: str, mod: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt), F.col("event_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % mod
        )

    f = ev.select(
        F.col("event_id").alias("url_id"),
        (F.col("event_id") % 3).alias("tier"),
        _h("p|", 100000).alias("base_pri"),
        _h("e|", 100).alias("enq_round"),
        F.expr(
            "CASE event_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 25 ELSE 60 END"
        ).alias("slope"),
    )
    # the write-once static key: ordering within a tier is R-invariant
    keyed = f.withColumn(
        "static_key", F.col("base_pri") - F.col("slope") * F.col("enq_round")
    )
    wt = Window.partitionBy("tier").orderBy(F.col("static_key").desc(), "url_id")
    survivors = keyed.withColumn("trn", F.row_number().over(wt)).where(
        F.col("trn") <= _Q208_K
    )
    # eff computed only on <= 3k survivor rows, then one bounded sort
    ranked = survivors.withColumn(
        "eff_pri",
        (
            F.col("base_pri")
            + F.col("slope") * (F.lit(_Q208_ROUND) - F.col("enq_round"))
        ).cast("long"),
    )
    wg = Window.orderBy(F.col("eff_pri").desc(), "url_id")
    return (
        ranked.withColumn("rank", F.row_number().over(wg))
        .where(F.col("rank") <= _Q208_K)
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col("url_id").cast("long").alias("url_id"),
            F.col("tier").cast("long").alias("tier"),
            F.col("base_pri").cast("long").alias("base_pri"),
            F.col("enq_round").cast("long").alias("enq_round"),
            F.col("eff_pri").cast("long").alias("eff_pri"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q211: bloom-filter sizing sweep — the engine's seen-filter FPR knob
# (config.bloom bits/key) priced empirically: every false positive in
# the prefilter costs an exact anti-join probe row, so FPR × frontier
# size is the knob's bill. This query builds the DECLARATIVE bloom
# model (k salted md5 positions mod m — the portable twin of
# bloom.py's numpy double-hash shards) over the seen set at two
# sizings (8 bits/key k=4, 16 bits/key k=8), then measures on a
# disjoint candidate stream: a candidate is a false positive iff ALL
# k of its positions are set. Outputs measured FPR and the bit-array
# fill factor per config.
#
# Scale shape: the set-bits table is one distinct over seen×k rows
# (partial-combining); the membership check is one join on position
# (uniform key) + a count==k group — never a per-row driver loop; m
# derives from the measured seen count via a broadcast 1-row scalar.
# The no-false-NEGATIVE contract (the correctness half) is pinned in
# tests by running the same model over the seen set itself.
# ---------------------------------------------------------------------------

_Q211_CONFIGS = ((8, 4), (16, 8))  # (bits_per_key, k)


def _q211_cfg_sql(bpk: int, k: int) -> str:
    hashes = "\n    UNION ALL ".join(
        f"SELECT u, CAST('0x' || substr(md5('b{i}|' || CAST(u AS VARCHAR)), 1, 15)"
        f" AS BIGINT) AS hv FROM {{src}}"
        for i in range(k)
    )
    return f"""
  pos_{bpk} AS (
    SELECT u, hv % (SELECT n_seen * {bpk} FROM nn) AS pos
    FROM ({hashes.format(src="seen")})
  ),
  bits_{bpk} AS (SELECT DISTINCT pos FROM pos_{bpk}),
  cpos_{bpk} AS (
    SELECT u, hv % (SELECT n_seen * {bpk} FROM nn) AS pos
    FROM ({hashes.format(src="cand")})
  ),
  hits_{bpk} AS (
    SELECT c.u, COUNT(*) AS nhit
    FROM cpos_{bpk} c JOIN bits_{bpk} b USING (pos) GROUP BY 1
  ),
  fp_{bpk} AS (SELECT COUNT(*) AS n_fp FROM hits_{bpk} WHERE nhit = {k}),
  fill_{bpk} AS (SELECT COUNT(*) AS n_set FROM bits_{bpk})"""


_Q211_ORACLE = f"""
WITH seen AS (SELECT event_id * 2 AS u FROM events),
cand AS (SELECT event_id * 2 + 1 AS u FROM events),
nn AS (SELECT COUNT(*) AS n_seen FROM seen),
nc AS (SELECT COUNT(*) AS n_cand FROM cand),
{",".join(_q211_cfg_sql(bpk, k) for bpk, k in _Q211_CONFIGS)}
SELECT * FROM (
  SELECT CAST(8 AS INT) AS bits_per_key, CAST(4 AS INT) AS k,
         CAST(n_seen AS BIGINT) AS n_seen,
         CAST(n_seen * 8 AS BIGINT) AS n_bits,
         CAST(n_set AS BIGINT) AS n_bits_set,
         CAST(1000 * n_set // (n_seen * 8) AS BIGINT) AS fill_milli,
         CAST(n_cand AS BIGINT) AS n_candidates,
         CAST(n_fp AS BIGINT) AS n_false_positive,
         CAST(1000000 * n_fp // n_cand AS BIGINT) AS fpr_micro
  FROM nn CROSS JOIN nc CROSS JOIN fp_8 CROSS JOIN fill_8
  UNION ALL
  SELECT 16, 8, n_seen, n_seen * 16, n_set,
         1000 * n_set // (n_seen * 16), n_cand, n_fp,
         1000000 * n_fp // n_cand
  FROM nn CROSS JOIN nc CROSS JOIN fp_16 CROSS JOIN fill_16
) ORDER BY bits_per_key
"""


def _q211_positions(df: DataFrame, k: int, m_col) -> DataFrame:
    """(u, pos) rows: k salted md5 positions mod m for each key."""
    salts = F.array(*[F.lit(f"b{i}|") for i in range(k)])
    return df.select("u", F.explode(salts).alias("salt"), m_col.alias("m")).select(
        "u",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("salt"), F.col("u").cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % F.col("m")
        ).alias("pos"),
    )


@register("q211_bloom_sizing_sweep", oracle=_Q211_ORACLE)
def q211_bloom_sizing_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative bloom model at two sizings over a seen set +
    disjoint candidate stream: measured FPR and fill factor."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    seen = ev.select((F.col("event_id") * 2).alias("u"))
    cand = ev.select((F.col("event_id") * 2 + 1).alias("u"))
    nn = seen.groupBy().agg(F.count(F.lit(1)).alias("n_seen"))
    nc = cand.groupBy().agg(F.count(F.lit(1)).alias("n_cand"))

    out = []
    for bpk, k in _Q211_CONFIGS:
        s = seen.crossJoin(F.broadcast(nn))
        c = cand.crossJoin(F.broadcast(nn))
        m = (F.col("n_seen") * bpk).cast("long")
        # the built filter is referenced twice (membership join + fill
        # count) — persist it, exactly as the production filter IS
        # materialized state (the q25/q81 double-reference lesson)
        bits = _q211_positions(s, k, m).select("pos").distinct().persist()
        hits = (
            _q211_positions(c, k, m)
            .join(bits, "pos")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("nhit"))
            .where(F.col("nhit") == k)
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_fp"))
        )
        fill = bits.groupBy().agg(F.count(F.lit(1)).alias("n_set"))
        out.append(
            F.broadcast(nn)
            .crossJoin(F.broadcast(nc))
            .crossJoin(F.broadcast(hits))
            .crossJoin(F.broadcast(fill))
            .select(
                F.lit(bpk).cast("int").alias("bits_per_key"),
                F.lit(k).cast("int").alias("k"),
                F.col("n_seen").cast("long").alias("n_seen"),
                (F.col("n_seen") * bpk).cast("long").alias("n_bits"),
                F.col("n_set").cast("long").alias("n_bits_set"),
                F.expr(f"1000 * n_set div (n_seen * {bpk})")
                .cast("long")
                .alias("fill_milli"),
                F.col("n_cand").cast("long").alias("n_candidates"),
                F.col("n_fp").cast("long").alias("n_false_positive"),
                F.expr("1000000 * n_fp div n_cand").cast("long").alias("fpr_micro"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("bits_per_key")


# ---------------------------------------------------------------------------
# q213: max-min fair budget allocation (water-filling) — q102 splits
# the round budget PROPORTIONALLY to demand, which lets three hot
# hosts swallow it; the max-min fair allocation instead raises one
# water level L: every host gets min(demand, L), with L the largest
# level the budget funds, and the integer remainder going one unit
# each to the lowest-numbered still-capped hosts (deterministic).
# This is the allocation that maximizes the minimum service — no host
# can gain without a poorer host losing.
#
# L has a closed form over the demand-sorted host table: with hosts
# sorted ascending by demand (prefix sums S_j), the largest j* where
# S_j + (n-j)*d_j <= B leaves L = (B - S_j*) div (n - j*). Everything
# is one window pass over the POLITENESS-BOUNDED host table (the
# frontier never enters the window) and pure integer math, mirrored
# exactly in the oracle. Σ alloc == B exactly — pinned.
#
# Scale shape: one partial-combining host rollup over the log; the
# sort/window/cutoff run on the bounded per-host table only (q169's
# discipline); B and L broadcast as 1-row scalars.
# ---------------------------------------------------------------------------

_Q213_HOST = "CASE WHEN event_id % 10 < 4 THEN event_id % 3 ELSE 3 + event_id % 38 END"

_Q213_ORACLE = f"""
WITH f AS (SELECT {_Q213_HOST} AS host FROM events),
t AS (SELECT host, COUNT(*) AS demand FROM f GROUP BY 1),
s AS (SELECT COUNT(*) AS n, SUM(demand) // 3 AS budget FROM t),
o AS (
  SELECT host, demand,
         ROW_NUMBER() OVER (ORDER BY demand, host) AS j,
         SUM(demand) OVER (ORDER BY demand, host
                           ROWS UNBOUNDED PRECEDING) AS sj
  FROM t
),
jstar AS (
  SELECT COALESCE(MAX(j), 0) AS js FROM o CROSS JOIN s
  WHERE sj + (n - j) * demand <= budget
),
lvl AS (
  SELECT CASE WHEN js = 0 THEN budget // n
              ELSE (budget - (SELECT sj FROM o WHERE j = js))
                   // (n - js) END AS level,
         CASE WHEN js = 0 THEN 0
              ELSE (SELECT sj FROM o WHERE j = js) END AS s_base,
         js
  FROM jstar CROSS JOIN s
),
alloc0 AS (
  SELECT o.host, o.demand,
         lvl.level,
         LEAST(o.demand, lvl.level) AS base_alloc,
         o.demand > lvl.level AS capped
  FROM o CROSS JOIN lvl
),
rem AS (
  SELECT budget - SUM(base_alloc) AS r FROM alloc0 CROSS JOIN s
  GROUP BY budget
),
ranked AS (
  SELECT host, demand, level, base_alloc, capped,
         CASE WHEN capped THEN ROW_NUMBER() OVER (
           PARTITION BY capped ORDER BY host) ELSE NULL END AS crank
  FROM alloc0
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(demand AS BIGINT) AS demand,
       CAST(level AS BIGINT) AS level,
       CAST(base_alloc + CASE WHEN capped AND crank <= r THEN 1 ELSE 0 END
            AS BIGINT) AS alloc,
       CAST(CASE WHEN capped THEN 1 ELSE 0 END AS INT) AS capped
FROM ranked CROSS JOIN rem
ORDER BY host
"""


def waterfill_alloc(t: DataFrame, budget_div: int) -> DataFrame:
    """Max-min fair allocation over a bounded (host, demand) table.

    budget = sum(demand) div budget_div. Returns (host, demand, level,
    alloc, capped) with Σ alloc == budget exactly (integer remainder
    to the lowest-numbered capped hosts). All windows run on the
    bounded host table — the caller guarantees t is host-grained.
    """
    from pyspark.sql.window import Window

    s = t.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"sum(demand) div {budget_div}").alias("budget"),
    )
    wo = Window.orderBy("demand", "host")
    o = t.withColumn("j", F.row_number().over(wo)).withColumn(
        "sj", F.sum("demand").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    oc = o.crossJoin(F.broadcast(s))
    jstar = (
        oc.where(
            F.col("sj") + (F.col("n") - F.col("j")) * F.col("demand")
            <= F.col("budget")
        )
        .groupBy()
        .agg(F.coalesce(F.max("j"), F.lit(0)).alias("js"))
    )
    sbase = (
        o.join(F.broadcast(jstar), F.col("j") == F.col("js"), "inner")
        .select(F.col("sj").alias("s_at_js"))
    )
    lvl = (
        F.broadcast(jstar)
        .crossJoin(F.broadcast(s))
        .crossJoin(
            F.broadcast(
                sbase.groupBy().agg(
                    F.coalesce(F.max("s_at_js"), F.lit(0)).alias("s_base")
                )
            )
        )
        .select(
            F.when(F.col("js") == 0, F.expr("budget div n"))
            .otherwise(F.expr("(budget - s_base) div (n - js)"))
            .alias("level")
        )
    )
    alloc0 = o.crossJoin(F.broadcast(lvl)).select(
        "host",
        "demand",
        "level",
        F.least("demand", "level").alias("base_alloc"),
        (F.col("demand") > F.col("level")).alias("capped"),
    )
    rem = (
        alloc0.crossJoin(F.broadcast(s))
        .groupBy("budget")
        .agg((F.first("budget") - F.sum("base_alloc")).alias("r"))
        .select("r")
    )
    wc = Window.partitionBy("capped").orderBy("host")
    ranked = alloc0.withColumn(
        "crank",
        F.when(F.col("capped"), F.row_number().over(wc)).otherwise(F.lit(None)),
    )
    return ranked.crossJoin(F.broadcast(rem)).select(
        F.col("host").cast("long").alias("host"),
        F.col("demand").cast("long").alias("demand"),
        F.col("level").cast("long").alias("level"),
        (
            F.col("base_alloc")
            + F.when(F.col("capped") & (F.col("crank") <= F.col("r")), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
        F.when(F.col("capped"), 1).otherwise(0).cast("int").alias("capped"),
    )


@register("q213_waterfill_budget", oracle=_Q213_ORACLE)
def q213_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) fetch-budget allocation over the
    bounded host table: closed-form level, exact integer remainder."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    t = (
        ev.select(F.expr(_Q213_HOST).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("demand"))
    )
    return waterfill_alloc(t, 3).orderBy("host")


# ---------------------------------------------------------------------------
# q217: ban closure through redirects — a domain ban list only works
# if it survives redirection: a URL on an innocuous host that 301s
# into a banned host must be treated as banned, or the crawler
# launders banned content through one hop of indirection. This query
# resolves every URL to its redirect terminal by POINTER DOUBLING
# (the q96 algorithm: squaring the functional map, log2(max chain)
# rounds — 3 rounds cover chains of 8) and rolls up, per host, how
# many URLs are banned directly vs transitively (clean host, banned
# terminal).
#
# Fixture is closed-form integer arithmetic (u terminal iff u%7==0,
# else u -> u-1; host = u%20; banned hosts {7, 13}), generated
# identically by spark.range and DuckDB range — no files. The oracle
# intentionally mirrors the ITERATIVE squaring (unrolled materialized
# self-joins, the q96 discipline), not the fixture's closed form —
# the algorithm is what's under test.
#
# Scale shape: each doubling round is ONE equi-join of the map with
# itself on a uniform key; 10^10 URLs resolve in ~33 rounds with no
# driver involvement; the ban check is an in-row predicate (a
# broadcast semi-join against the ban table in production).
# ---------------------------------------------------------------------------

_Q217_N = 1000
_Q217_ROUNDS = 3  # 2^3 = 8 >= max chain length 7


def _q217_m_sql() -> str:
    steps = [
        f"m0 AS MATERIALIZED (SELECT u AS src, CASE WHEN u % 7 = 0 THEN u"
        f" ELSE u - 1 END AS dst FROM range({_Q217_N}) t(u))"
    ]
    for r in range(1, _Q217_ROUNDS + 1):
        steps.append(
            f"m{r} AS MATERIALIZED (SELECT a.src, b.dst"
            f" FROM m{r - 1} a JOIN m{r - 1} b ON a.dst = b.src)"
        )
    return ",\n".join(steps)


_Q217_ORACLE = f"""
WITH {_q217_m_sql()},
r AS (
  SELECT src, dst,
         src % 20 AS host,
         dst % 20 AS term_host
  FROM m{_Q217_ROUNDS}
)
SELECT CAST(host AS BIGINT) AS host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN src % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terminal,
       CAST(CASE WHEN host IN (7, 13) THEN COUNT(*) ELSE 0 END AS BIGINT)
         AS n_direct_banned,
       CAST(SUM(CASE WHEN host NOT IN (7, 13) AND term_host IN (7, 13)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_transitive_banned
FROM r GROUP BY host ORDER BY host
"""


@register("q217_redirect_ban_closure", oracle=_Q217_ORACLE)
def q217_redirect_ban_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every URL through the redirect map by pointer doubling,
    then count direct vs redirect-laundered bans per host."""
    m = spark.range(_Q217_N).select(
        F.col("id").alias("src"),
        F.when(F.col("id") % 7 == 0, F.col("id")).otherwise(F.col("id") - 1).alias(
            "dst"
        ),
    )
    for _ in range(_Q217_ROUNDS):
        b = m.select(F.col("src").alias("bsrc"), F.col("dst").alias("bdst"))
        m = m.join(b, m["dst"] == b["bsrc"]).select(
            "src", F.col("bdst").alias("dst")
        )
    r = m.select(
        "src",
        "dst",
        (F.col("src") % 20).alias("host"),
        (F.col("dst") % 20).alias("term_host"),
    )
    banned = F.col("host").isin(7, 13)
    return (
        r.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.when(F.col("src") % 7 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_terminal"),
            F.sum(F.when(banned, 1).otherwise(0)).cast("long").alias("n_direct_banned"),
            F.sum(
                F.when(~banned & F.col("term_host").isin(7, 13), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_transitive_banned"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q219: the scheduling policy stack — the round planner's host-level
# decisions composed end-to-end: q201's UCB policy decides WHICH
# hosts get fetch slots this round (explore/exploit), the water-fill
# allocator (q213's machinery, shared helper) decides HOW MANY each
# scheduled host gets from a budget of Σdemand/4 — max-min fair, so
# the UCB winners cannot starve the long tail — and the drain
# forecast says how many rounds each queue needs at that rate.
# Unscheduled hosts appear with alloc 0: the report is the complete
# per-host round plan, the engine analogue of the reference's single
# hard-coded "fetch everything" loop (src/main.py:153-200).
#
# Oracle: q201's FULL SQL embedded as a CTE (the q175 composition
# discipline — the downstream stage is gated on the upstream stage's
# own oracled output), then the water-fill SQL over the scheduled
# subset. Engine side reuses q201's DataFrame and the shared
# waterfill_alloc helper — composition parity at both layers.
#
# Scale shape: everything after q201's one host rollup runs on the
# bounded host table; windows are host-bounded; budget/level are
# broadcast scalars; ceil-division drain is in-row.
# ---------------------------------------------------------------------------

_Q219_ORACLE = f"""
WITH policy AS ({_Q201_ORACLE}),
t AS (
  SELECT host, n_trials AS demand FROM policy WHERE scheduled = 1
),
s AS (SELECT COUNT(*) AS n, SUM(demand) // 4 AS budget FROM t),
o AS (
  SELECT host, demand,
         ROW_NUMBER() OVER (ORDER BY demand, host) AS j,
         SUM(demand) OVER (ORDER BY demand, host
                           ROWS UNBOUNDED PRECEDING) AS sj
  FROM t
),
jstar AS (
  SELECT COALESCE(MAX(j), 0) AS js FROM o CROSS JOIN s
  WHERE sj + (n - j) * demand <= budget
),
lvl AS (
  SELECT CASE WHEN js = 0 THEN budget // n
              ELSE (budget - (SELECT sj FROM o WHERE j = js))
                   // (n - js) END AS level
  FROM jstar CROSS JOIN s
),
alloc0 AS (
  SELECT o.host, o.demand, lvl.level,
         LEAST(o.demand, lvl.level) AS base_alloc,
         o.demand > lvl.level AS capped
  FROM o CROSS JOIN lvl
),
rem AS (
  SELECT budget - SUM(base_alloc) AS r FROM alloc0 CROSS JOIN s GROUP BY budget
),
ranked AS (
  SELECT host, demand, level, base_alloc, capped,
         CASE WHEN capped THEN ROW_NUMBER() OVER (
           PARTITION BY capped ORDER BY host) ELSE NULL END AS crank
  FROM alloc0
),
fill AS (
  SELECT host, demand, level,
         base_alloc + CASE WHEN capped AND crank <= r THEN 1 ELSE 0 END AS alloc,
         CASE WHEN capped THEN 1 ELSE 0 END AS capped
  FROM ranked CROSS JOIN rem
)
SELECT CAST(p.host AS BIGINT) AS host,
       CAST(p.ucb_milli AS BIGINT) AS ucb_milli,
       p.decision,
       CAST(p.scheduled AS INT) AS scheduled,
       CAST(COALESCE(f.demand, p.n_trials) AS BIGINT) AS demand,
       CAST(COALESCE(f.alloc, 0) AS BIGINT) AS alloc,
       CAST(COALESCE(f.capped, 0) AS INT) AS capped,
       CAST(CASE WHEN COALESCE(f.alloc, 0) = 0 THEN -1
                 ELSE (f.demand + f.alloc - 1) // f.alloc END AS BIGINT)
         AS rounds_to_drain
FROM policy p LEFT JOIN fill f ON f.host = p.host
ORDER BY host
"""


@register("q219_schedule_policy_stack", oracle=_Q219_ORACLE)
def q219_schedule_policy_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB host selection -> max-min fair budget over the selected
    hosts -> per-host drain forecast; one row per host."""
    pol = q201_crawl_policy_ucb(spark, sf_dir)
    t = pol.where(F.col("scheduled") == 1).select(
        "host", F.col("n_trials").alias("demand")
    )
    fill = waterfill_alloc(t, 4)
    return (
        pol.join(
            fill.select(
                "host",
                F.col("demand").alias("f_demand"),
                F.col("alloc").alias("f_alloc"),
                F.col("capped").alias("f_capped"),
            ),
            "host",
            "left",
        )
        .select(
            F.col("host").cast("long").alias("host"),
            F.col("ucb_milli").cast("long").alias("ucb_milli"),
            "decision",
            F.col("scheduled").cast("int").alias("scheduled"),
            F.coalesce("f_demand", "n_trials").cast("long").alias("demand"),
            F.coalesce("f_alloc", F.lit(0)).cast("long").alias("alloc"),
            F.coalesce("f_capped", F.lit(0)).cast("int").alias("capped"),
            F.when(F.coalesce("f_alloc", F.lit(0)) == 0, F.lit(-1))
            .otherwise(F.expr("(f_demand + f_alloc - 1) div f_alloc"))
            .cast("long")
            .alias("rounds_to_drain"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# q226: crawl-trap detection — the frontier-hygiene audit that keeps a
# 10^10-URL crawl from drowning in infinite URL spaces (calendar
# pages, session-id query params, faceted-search combinatorics:
# Heydon & Najork's classic "spider trap" problem). A trap is a URL
# TEMPLATE (path with digit runs and query values normalized away)
# that accumulates many distinct URLs whose fetched content barely
# varies: the crawler spends fetches and gets nothing new.
#
# Fixture (synthesized from events, q222 discipline): three URL
# classes per host — a calendar trap (/cal/<date>, every URL distinct,
# content CONSTANT per host), real item pages (/item/<id>, content
# varies with the URL), and a session-id trap (/p/view?session=<id>,
# unbounded URLs, content constant per host).
#
# Scale shape: template normalization is an in-row regexp; the audit
# is ONE partial-combining aggregate on the (host, template) key
# (bounded: templates per host is small by construction of
# normalization — that is the point of templating); distinct URL /
# content counts partial-aggregate map-side. The trap rule is
# integer-only: >= 5 URLs AND 1000 * n_content <= 200 * n_urls
# (content-to-URL ratio <= 1/5).
# ---------------------------------------------------------------------------

_Q226_URLS_DUCK = """
  SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
         CASE event_id % 3
           WHEN 0 THEN '/cal/' || strftime(ts, '%Y-%m-%d')
           WHEN 1 THEN '/item/' || CAST(event_id % 500 AS VARCHAR)
           ELSE '/p/view?session=' || CAST(event_id AS VARCHAR)
         END AS path,
         CASE event_id % 3
           WHEN 0 THEN 'empty-calendar-' || CAST(user_id % 20 AS VARCHAR)
           WHEN 1 THEN 'item-' || CAST(event_id % 500 AS VARCHAR)
           ELSE 'page-' || CAST(user_id % 20 AS VARCHAR)
         END AS content_key
  FROM events
"""

_Q226_ORACLE = f"""
WITH urls AS ({_Q226_URLS_DUCK}),
t AS (
  SELECT host,
         regexp_replace(regexp_replace(path, '=[^&]*', '=V', 'g'),
                        '[0-9]+', 'N', 'g') AS template,
         path, content_key
  FROM urls
),
agg AS (
  SELECT host, template,
         COUNT(DISTINCT path) AS n_urls,
         COUNT(DISTINCT content_key) AS n_content
  FROM t GROUP BY host, template
)
SELECT host, template,
       CAST(n_urls AS BIGINT) AS n_urls,
       CAST(n_content AS BIGINT) AS n_content,
       CAST(CASE WHEN n_urls >= 5 AND 1000 * n_content <= 200 * n_urls
            THEN 1 ELSE 0 END AS INT) AS is_trap,
       CAST(n_urls - n_content AS BIGINT) AS wasted_fetches
FROM agg
ORDER BY host, template
"""


@register("q226_crawl_trap_detection", oracle=_Q226_ORACLE)
def q226_crawl_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(host, template) URL-space audit: templates with many
    distinct URLs but near-constant content are flagged as crawl
    traps; wasted_fetches counts the URLs that returned nothing new."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    host = F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"))
    cls = F.col("event_id") % 3
    urls = ev.select(
        host.alias("host"),
        F.when(cls == 0, F.concat(F.lit("/cal/"), F.date_format("ts", "yyyy-MM-dd")))
        .when(cls == 1, F.concat(F.lit("/item/"), (F.col("event_id") % 500).cast("string")))
        .otherwise(
            F.concat(F.lit("/p/view?session="), F.col("event_id").cast("string"))
        )
        .alias("path"),
        F.when(
            cls == 0,
            F.concat(F.lit("empty-calendar-"), (F.col("user_id") % 20).cast("string")),
        )
        .when(cls == 1, F.concat(F.lit("item-"), (F.col("event_id") % 500).cast("string")))
        .otherwise(F.concat(F.lit("page-"), (F.col("user_id") % 20).cast("string")))
        .alias("content_key"),
    )
    t = urls.select(
        "host",
        F.regexp_replace(
            F.regexp_replace("path", r"=[^&]*", "=V"), r"[0-9]+", "N"
        ).alias("template"),
        "path",
        "content_key",
    )
    agg = t.groupBy("host", "template").agg(
        F.countDistinct("path").alias("n_urls"),
        F.countDistinct("content_key").alias("n_content"),
    )
    return agg.select(
        "host",
        "template",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_content").cast("long").alias("n_content"),
        F.when(
            (F.col("n_urls") >= 5)
            & (1000 * F.col("n_content") <= 200 * F.col("n_urls")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("is_trap"),
        (F.col("n_urls") - F.col("n_content")).cast("long").alias("wasted_fetches"),
    ).orderBy("host", "template")


# ---------------------------------------------------------------------------
# q228: consistent-hash RING routing audit (Karger et al. 1997) — the
# third stable-routing strategy beside q157's rendezvous hashing and
# the modulo baseline. A ring with V virtual nodes per shard maps a
# key to the first ring position clockwise >= hash(key) (wrapping to
# the ring's global minimum). The audit computes, for K=16 shards
# growing to K+1: per-shard host/URL load under the ring, ring churn
# (hosts that move — provably they ALL move onto the NEW shard), and
# the modulo baseline's churn (~K/(K+1) of all hosts scatter between
# SURVIVOR shards, invalidating politeness state fleet-wide).
#
# Scale shape: the ring is a DESIGN-constant array (K*V = 128 / 136
# sorted (pos, shard) structs) built by one tiny aggregate and
# broadcast as a 1-row cross join; per-host assignment is an in-row
# first-match lookup over that array (no join fan-out, no window);
# the host rollup is the only real shuffle (q157 shape). Hash = the
# house md5 60-bit integer idiom, bit-identical in both engines.
# ---------------------------------------------------------------------------

_Q228_HOSTS = 997
_Q228_K = 16
_Q228_V = 8  # virtual nodes per shard

_Q228_H60_DUCK = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

_Q228_ORACLE = f"""
WITH hosts AS (
  SELECT event_id % {_Q228_HOSTS} AS host, CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM events GROUP BY 1
),
hh AS (
  SELECT host, n_urls,
         {_Q228_H60_DUCK.format(x="CAST(host AS VARCHAR)")} AS h
  FROM hosts
),
vn AS (
  SELECT s, v,
         {_Q228_H60_DUCK.format(x="'ring:' || CAST(s AS VARCHAR) || ':' || CAST(v AS VARCHAR)")} AS pos
  FROM (SELECT unnest(range(0, {_Q228_K + 1})) AS s) shards,
       (SELECT unnest(range(0, {_Q228_V})) AS v) vns
),
ring16 AS (
  SELECT list(struct_pack(pos := pos, shard := s) ORDER BY pos) AS ring
  FROM vn WHERE s < {_Q228_K}
),
ring17 AS (
  SELECT list(struct_pack(pos := pos, shard := s) ORDER BY pos) AS ring
  FROM vn
),
asg AS (
  SELECT host, n_urls,
         COALESCE(list_filter(r16.ring, x -> x.pos >= h)[1].shard,
                  r16.ring[1].shard) AS shard,
         COALESCE(list_filter(r17.ring, x -> x.pos >= h)[1].shard,
                  r17.ring[1].shard) AS shard_after_grow,
         host
  FROM hh, ring16 r16, ring17 r17
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN shard_after_grow <> shard THEN 1 ELSE 0 END) AS BIGINT)
         AS ring_moved,
       CAST(SUM(CASE WHEN shard_after_grow <> shard
                      AND shard_after_grow <> {_Q228_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS ring_moved_to_survivor,
       CAST(SUM(CASE WHEN host % {_Q228_K} <> host % {_Q228_K + 1}
                THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved_from_here
FROM asg
GROUP BY shard
ORDER BY shard
"""


@register("q228_consistent_ring_audit", oracle=_Q228_ORACLE)
def q228_consistent_ring_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring (V=8 vnodes) host->shard routing with
    K -> K+1 churn per shard vs the modulo baseline;
    ring_moved_to_survivor must be 0 (the consistent-hashing
    guarantee)."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    hosts = (
        ev.select((F.col("event_id") % _Q228_HOSTS).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
    hh = hosts.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("host").cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    vn = spark.range(_Q228_K + 1).select(
        F.col("id").cast("int").alias("s"),
        F.explode(F.expr(f"sequence(0, {_Q228_V - 1})")).alias("v"),
    ).select(
        "s",
        "v",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ring:"),
                        F.col("s").cast("string"),
                        F.lit(":"),
                        F.col("v").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("pos"),
    )
    ring16 = vn.where(F.col("s") < _Q228_K).agg(
        F.sort_array(F.collect_list(F.struct("pos", F.col("s").alias("shard")))).alias(
            "ring16"
        )
    )
    ring17 = vn.agg(
        F.sort_array(F.collect_list(F.struct("pos", F.col("s").alias("shard")))).alias(
            "ring17"
        )
    )
    lookup = (
        "coalesce(get(filter({r}, x -> x.pos >= h), 0).shard, get({r}, 0).shard)"
    )
    asg = (
        hh.crossJoin(F.broadcast(ring16))
        .crossJoin(F.broadcast(ring17))
        .select(
            "host",
            "n_urls",
            F.expr(lookup.format(r="ring16")).alias("shard"),
            F.expr(lookup.format(r="ring17")).alias("shard_after_grow"),
        )
    )
    return (
        asg.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hosts"),
            F.sum("n_urls").cast("long").alias("n_urls"),
            F.sum(
                F.when(F.col("shard_after_grow") != F.col("shard"), 1).otherwise(0)
            )
            .cast("long")
            .alias("ring_moved"),
            F.sum(
                F.when(
                    (F.col("shard_after_grow") != F.col("shard"))
                    & (F.col("shard_after_grow") != _Q228_K),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("ring_moved_to_survivor"),
            F.sum(
                F.when(
                    F.col("host") % _Q228_K != F.col("host") % (_Q228_K + 1), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("mod_moved_from_here"),
        )
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_hosts",
            "n_urls",
            "ring_moved",
            "ring_moved_to_survivor",
            "mod_moved_from_here",
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q238: robust metric anomaly detection — the crawl-ops monitoring
# gate that pages a human: per-day fetch volume judged against the
# MEDIAN and the MAD (median absolute deviation), the robust
# statistics that a single broken day cannot drag (unlike mean/std).
# A planted +500 spike on 2024-01-15 (q222 in-query synthesis) makes
# the alarm fire deterministically.
#
# Exactness: medians use the proven percentile/quantile_cont idiom
# (relational.py q-median) with ROUND(…,4) pinning; the outlier rule
# compares against the ROUNDED med/mad so both engines decide
# identically.
#
# Scale shape: one day rollup (bounded by calendar days), two 1-row
# median aggregates over that bounded table, broadcast back — the
# raw fact table is scanned once.
# ---------------------------------------------------------------------------

_Q238_SPIKE_DAY = "2024-01-15"
_Q238_SPIKE = 500


_Q238_ORACLE = f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         COUNT(*) + CASE WHEN strftime(ts, '%Y-%m-%d') = '{_Q238_SPIKE_DAY}'
                    THEN {_Q238_SPIKE} ELSE 0 END AS n
  FROM events GROUP BY strftime(ts, '%Y-%m-%d')
),
med AS (SELECT ROUND(CAST(quantile_cont(n, 0.5) AS DOUBLE), 4) AS m FROM daily),
dev AS (SELECT day, n, ABS(n - m) AS ad FROM daily, med),
mad AS (SELECT ROUND(CAST(quantile_cont(ad, 0.5) AS DOUBLE), 4) AS md FROM dev)
SELECT d.day, CAST(d.n AS BIGINT) AS n,
       ROUND(d.ad, 4) AS abs_dev,
       CAST(CASE WHEN d.ad > 3 * GREATEST(mad.md, 1.0) THEN 1 ELSE 0 END AS INT)
         AS is_outlier
FROM dev d, mad
ORDER BY day
"""


def anomaly_policy(daily0: DataFrame) -> DataFrame:
    """The spike-injection + median/MAD outlier policy over a
    (day, n0) rollup — shared by batch q238 and streaming q242 (the
    stream≡batch equality through the SAME oracle is q242's gate)."""
    daily = daily0.select(
        "day",
        (
            F.col("n0")
            + F.when(F.col("day") == _Q238_SPIKE_DAY, _Q238_SPIKE).otherwise(0)
        ).alias("n"),
    )
    med = daily.agg(F.round(F.expr("percentile(n, 0.5)"), 4).alias("m"))
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day", "n", F.abs(F.col("n") - F.col("m")).alias("ad")
    )
    mad = dev.agg(F.round(F.expr("percentile(ad, 0.5)"), 4).alias("md"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "day",
            F.col("n").cast("long").alias("n"),
            F.round("ad", 4).alias("abs_dev"),
            F.when(F.col("ad") > 3 * F.greatest(F.col("md"), F.lit(1.0)), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_outlier"),
        )
        .orderBy("day")
    )


@register("q238_metric_anomaly_days", oracle=_Q238_ORACLE)
def q238_metric_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day fetch volume vs median/MAD with a planted spike; a day
    is an outlier when |n - med| > 3 * max(MAD, 1)."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n0")
    )
    return anomaly_policy(daily)


# ---------------------------------------------------------------------------
# q239: backfill gap planning — the data-eng audit run before any
# "is the warehouse complete?" claim: expected partitions = every
# (event_type, day) in the table's calendar span; observed = the
# partitions actually present (with planted holes: 'view' is blanked
# on Jan 10-12 and 'error' on Jan 20, q222 in-query synthesis);
# missing partitions grouped into CONTIGUOUS gap runs (the
# gaps-and-islands idiom on dates) — the unit a backfill job actually
# schedules.
#
# Scale shape: presence is one distinct rollup (bounded: types x
# days); the expected calendar is generated in-row from the 1-row
# span aggregate; the anti-join and the island window run on the
# bounded partition domain, never on raw facts.
# ---------------------------------------------------------------------------

_Q239_HOLES = "(event_type = 'view' AND day BETWEEN '2024-01-10' AND '2024-01-12') OR (event_type = 'error' AND day = '2024-01-20')"


@register(
    "q239_backfill_gaps",
    oracle=f"""
WITH present0 AS (
  SELECT DISTINCT event_type, strftime(ts, '%Y-%m-%d') AS day FROM events
),
present AS (
  SELECT * FROM present0 WHERE NOT ({_Q239_HOLES})
),
span AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
),
expected AS (
  SELECT t.event_type, strftime(gs.d, '%Y-%m-%d') AS day
  FROM (SELECT DISTINCT event_type FROM events) t,
       span, LATERAL (SELECT unnest(generate_series(span.d0, span.d1,
                                     INTERVAL 1 DAY))::DATE AS d) gs
),
missing AS (
  SELECT e.event_type, e.day FROM expected e
  LEFT JOIN present p ON p.event_type = e.event_type AND p.day = e.day
  WHERE p.day IS NULL
),
isl AS (
  SELECT event_type, day,
         CAST(strptime(day, '%Y-%m-%d') AS DATE)
           - CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS INT)
           AS grp
  FROM missing
)
SELECT event_type, MIN(day) AS gap_start, MAX(day) AS gap_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM isl
GROUP BY event_type, grp
ORDER BY event_type, gap_start
""",
)
def q239_backfill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing (event_type, day) partitions vs the expected calendar,
    grouped into contiguous gap runs — the backfill work list."""
    from pyspark.sql.window import Window

    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    present = (
        ev.select("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .where(f"NOT ({_Q239_HOLES})")
    )
    span = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    expected = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"),
        )
        .select("event_type", F.date_format("d", "yyyy-MM-dd").alias("day"))
    )
    missing = expected.join(present, ["event_type", "day"], "left_anti")
    w = Window.partitionBy("event_type").orderBy("day")
    isl = missing.withColumn(
        "grp",
        F.expr("CAST(to_date(day) AS DATE)")
        - F.expr("CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS INT)"),
    )
    return (
        isl.groupBy("event_type", "grp")
        .agg(
            F.min("day").alias("gap_start"),
            F.max("day").alias("gap_end"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .select("event_type", "gap_start", "gap_end", "n_days")
        .orderBy("event_type", "gap_start")
    )


# ---------------------------------------------------------------------------
# q241: recrawl scheduling from observed change history — the revisit
# policy layer of an incremental crawler (Cho & Garcia-Molina 2003,
# "Effective page refresh policies for Web crawlers"): estimate each
# URL's change rate from k revisit observations and assign the
# revisit interval. The paper's Poisson estimator lambda-hat =
# -ln(1 - X/n) is DISCRETIZED into an integer interval table here
# (X changes out of 5 -> 32/16/8/4/2 days) so both engines decide
# bit-identically; the table preserves the estimator's monotonicity,
# which is all the scheduler consumes. Complements q146 (conditional
# GET savings) and q170 (cache-header policy): those price a revisit,
# this decides WHEN to revisit.
#
# Fixture: per doc a planted change class (doc_id % 4: static / slow
# / medium / fast) drives deterministic md5 change observations at
# visits 2..6 (q222 in-query synthesis, q58 no-RNG discipline).
#
# Scale shape: the whole policy is IN-ROW — the 5 observations are a
# transform over sequence(2,6) folded to a count, the interval a CASE
# — zero explode, zero shuffle before the display sort (q68/q227
# shape).
# ---------------------------------------------------------------------------

_Q241_CLASSES = ["static", "slow", "medium", "fast"]


def _q241_changed(engine: str) -> str:
    h = (
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT"
        if engine == "duckdb"
        else "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return f"""CASE doc_id % 4
      WHEN 0 THEN 0
      WHEN 1 THEN CASE WHEN {h} % 5 = 0 THEN 1 ELSE 0 END
      WHEN 2 THEN CASE WHEN {h} % 2 = 0 THEN 1 ELSE 0 END
      ELSE CASE WHEN {h} % 10 <> 0 THEN 1 ELSE 0 END END"""


_Q241_INTERVAL = """CASE WHEN n_changed = 0 THEN 32
     WHEN n_changed = 1 THEN 16
     WHEN n_changed = 2 THEN 8
     WHEN n_changed = 3 THEN 4
     ELSE 2 END"""


@register(
    "q241_recrawl_schedule",
    oracle=f"""
WITH obs AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'static' WHEN 1 THEN 'slow'
              WHEN 2 THEN 'medium' ELSE 'fast' END AS rate_class,
         COALESCE(list_sum(list_transform(range(2, 7),
                  i -> {_q241_changed("duckdb")})), 0) AS n_changed
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, rate_class,
       CAST(5 AS BIGINT) AS n_obs,
       CAST(n_changed AS BIGINT) AS n_changed,
       CAST({_Q241_INTERVAL} AS BIGINT) AS revisit_days
FROM obs
ORDER BY doc_id
""",
)
def q241_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL revisit interval from 5 deterministic change
    observations: 0 changes -> 32d down to >=4 -> 2d (the CGM
    estimator's monotone discretization), all in-row."""
    from voz_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    obs = d.select(
        "doc_id",
        F.expr(
            "CASE doc_id % 4 WHEN 0 THEN 'static' WHEN 1 THEN 'slow'"
            " WHEN 2 THEN 'medium' ELSE 'fast' END"
        ).alias("rate_class"),
        F.expr(
            f"aggregate(transform(sequence(2, 6), i -> {_q241_changed('spark')}),"
            " 0, (a, x) -> a + x)"
        ).alias("n_changed"),
    )
    return obs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "rate_class",
        F.lit(5).cast("long").alias("n_obs"),
        F.col("n_changed").cast("long").alias("n_changed"),
        F.expr(f"CAST({_Q241_INTERVAL} AS BIGINT)").alias("revisit_days"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q244: host-level mirror detection — MinHash lifted from documents
# (q24/q25) to HOSTS: a mirror site carries (nearly) the same shingle
# UNION as its origin even when no single page pair survives the
# doc-level near-dup gate, so the sketch is aggregated per host and
# the banded join runs on the ~10^7-host domain instead of the
# 10^10-doc domain. A planted mirror ('m3' serving exactly h3's docs)
# must come out 8/8.
#
# Scale shape: the host sketch is ONE aggregate over (host, shingle)
# distinct rows — 8 MIN()s computed together; candidates come from 4
# two-minhash bands (the q25 band discipline — never all-pairs over
# hosts); the verify step compares the two 8-value sketches in-row.
# ---------------------------------------------------------------------------

_Q244_K = 8
_Q244_HOST_DUCK = (
    "CASE WHEN doc_id % 19 = 3 AND mirror = 1 THEN 'm3' "
    "ELSE 'h' || CAST(doc_id % 19 AS VARCHAR) END"
)
_Q244_MH_DUCK = ",\n         ".join(
    f"MIN(md5(shingle || '#{j}')) AS mh{j}" for j in range(_Q244_K)
)
_Q244_MATCH = " + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(_Q244_K))
_Q244_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]


def _q244_shingles_duck() -> str:
    from voz_spark.dataprep import _shingles_sql

    return _shingles_sql()


@register(
    "q244_host_mirror_minhash",
    oracle=f"""
WITH sh AS ({{sh}}),
hosted AS (
  SELECT {_Q244_HOST_DUCK} AS host, shingle
  FROM sh, (SELECT unnest([0, 1]) AS mirror) m
  WHERE mirror = 0 OR doc_id % 19 = 3
),
hs AS (SELECT DISTINCT host, shingle FROM hosted),
sk AS (
  SELECT host, {_Q244_MH_DUCK}
  FROM hs GROUP BY host
),
cand AS (
  {" UNION ".join(
    f"SELECT a.host AS host_a, b.host AS host_b FROM sk a JOIN sk b"
    f" ON a.mh{i} = b.mh{i} AND a.mh{j} = b.mh{j} AND a.host < b.host"
    for i, j in _Q244_BANDS
  )}
)
SELECT c.host_a, c.host_b,
       CAST({_Q244_MATCH} AS BIGINT) AS n_match,
       CAST(1000 * ({_Q244_MATCH}) // {_Q244_K} AS BIGINT) AS est_milli
FROM cand c JOIN sk a ON a.host = c.host_a JOIN sk b ON b.host = c.host_b
ORDER BY host_a, host_b
""".replace("{sh}", _q244_shingles_duck()),
)
def q244_host_mirror_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded host-level MinHash: candidate host pairs sharing any
    2-minhash band, sketch-match count + milli similarity; the
    planted mirror scores 8/8."""
    from voz_spark.dataprep import _spark_shingles
    from voz_spark.session import load_table

    sh = _spark_shingles(load_table(spark, sf_dir, "documents"))
    base = sh.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 19).cast("string")).alias("host"),
        "shingle",
    )
    mirror = sh.where(F.col("doc_id") % 19 == 3).select(
        F.lit("m3").alias("host"), "shingle"
    )
    hs = base.unionByName(mirror).distinct()
    sk = hs.groupBy("host").agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"mh{j}")
            for j in range(_Q244_K)
        ]
    ).persist()
    a = sk.alias("a")
    b = sk.alias("b")
    cands = None
    for i, j in _Q244_BANDS:
        c = a.join(
            b,
            (F.col(f"a.mh{i}") == F.col(f"b.mh{i}"))
            & (F.col(f"a.mh{j}") == F.col(f"b.mh{j}"))
            & (F.col("a.host") < F.col("b.host")),
        ).select(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        cands = c if cands is None else cands.unionByName(c)
    cand = cands.distinct()
    sa = sk.select([F.col("host").alias("host_a")] + [F.col(f"mh{j}").alias(f"a{j}") for j in range(_Q244_K)])
    sb = sk.select([F.col("host").alias("host_b")] + [F.col(f"mh{j}").alias(f"b{j}") for j in range(_Q244_K)])
    match = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(_Q244_K)
    )
    return (
        cand.join(sa, "host_a")
        .join(sb, "host_b")
        .select(
            "host_a",
            "host_b",
            match.cast("long").alias("n_match"),
            F.expr(
                "CAST(1000 * ("
                + " + ".join(
                    f"CASE WHEN a{j} = b{j} THEN 1 ELSE 0 END" for j in range(_Q244_K)
                )
                + f") div {_Q244_K} AS BIGINT)"
            ).alias("est_milli"),
        )
        .orderBy("host_a", "host_b")
    )


# ---------------------------------------------------------------------------
# q245: time-decayed host reputation — the freshness-weighted health
# score a scheduler consults (recent successes matter, last month's
# barely): score = sum over successful fetches of 1024 >> age_weeks —
# EXACT integer exponential decay (half-life = one week) via bit
# shift, no floats anywhere, so both engines agree bit-for-bit and
# partials merge (a sum of shifted integers is combinable map-side).
#
# Scale shape: one 1-row max-day aggregate broadcast back, then ONE
# partial-combining host rollup; the decay weight is in-row.
# ---------------------------------------------------------------------------


@register(
    "q245_decayed_host_reputation",
    oracle="""
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS d1 FROM events),
e AS (
  SELECT 'h' || CAST(user_id % 20 AS VARCHAR) AS host,
         CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS ok,
         LEAST(date_diff('day', CAST(ts AS DATE), mx.d1) // 7, 10) AS age_w
  FROM events, mx
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(ok) AS BIGINT) AS n_success,
       CAST(SUM(ok * (1024 >> age_w)) AS BIGINT) AS rep_score
FROM e GROUP BY host
ORDER BY host
""",
)
def q245_decayed_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host success reputation with integer half-life-per-week
    decay (1024 >> age_weeks) — exact, mergeable, float-free."""
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("d1"))
    e = ev.crossJoin(F.broadcast(mx)).select(
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string")).alias("host"),
        F.when(F.col("event_type") != "error", 1).otherwise(0).alias("ok"),
        F.least(
            F.expr("datediff(d1, CAST(ts AS DATE)) div 7"), F.lit(10)
        ).alias("age_w"),
    )
    return (
        e.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("ok").cast("long").alias("n_success"),
            F.sum(F.expr("ok * shiftright(1024, CAST(age_w AS INT))"))
            .cast("long")
            .alias("rep_score"),
        )
        .orderBy("host")
    )
