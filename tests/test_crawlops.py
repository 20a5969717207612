"""Semantics pins for the crawl-maintenance waves (q96-q102,
q107-q113, q116-q117): each operator's distributed formulation is
checked against a brute-force recomputation of the same fixture in
plain Python."""

from __future__ import annotations

import pytest

from voz_spark.crawlops import (
    _crawl_log_rows,
    _link_rows,
    _redirect_rows,
    _snapshot_rows,
    q96_redirect_resolution,
    q97_mirror_hosts,
    q98_anchor_text,
    q99_trap_detection,
    q100_recrawl_tiers,
)


def test_q96_pointer_doubling_matches_naive_walk(spark, sf_dir):
    """Pointer doubling (3 joins) must equal the naive step-by-step
    walk: same final URL and hop count for acyclic sources, cycle
    flag for any source whose walk revisits a node."""
    nxt = {r["src_url"]: r["dst_url"] for r in _redirect_rows()}

    def walk(src: str):
        cur, hops, seen = src, 0, {src}
        while cur in nxt:
            cur = nxt[cur]
            hops += 1
            if cur in seen:
                return "(cycle)", -1, True
            seen.add(cur)
        return cur, hops, False

    got = {r.src_url: (r.final_url, r.hops, r.is_cycle)
           for r in q96_redirect_resolution(spark, sf_dir).collect()}
    assert set(got) == set(nxt)
    for src in nxt:
        assert got[src] == walk(src), src
    assert any(c for _, _, c in got.values())  # cycles exist and are flagged
    assert any(h == 7 for _, h, _ in got.values())  # longest chain resolved


def test_q97_mirrors_found_boilerplate_ignored(spark, sf_dir):
    rows = {(r.host_a, r.host_b): r for r in q97_mirror_hosts(spark, sf_dir).collect()}
    # the two constructed mirror pairs, and nothing else: the
    # all-hosts boilerplate page must not connect unrelated hosts
    assert set(rows) == {("h0.voz.test", "h1.voz.test"), ("h2.voz.test", "h3.voz.test")}
    full = rows[("h0.voz.test", "h1.voz.test")]
    partial = rows[("h2.voz.test", "h3.voz.test")]
    assert full.shared == 110 and partial.shared == 60
    # jaccard_milli = shared*1000 // (size_a + size_b - shared); sizes
    # include the boilerplate page (121 distinct contents per host)
    assert full.jaccard_milli == 110 * 1000 // (121 + 121 - 110)
    assert partial.jaccard_milli == 60 * 1000 // (121 + 121 - 60)
    assert full.jaccard_milli > partial.jaccard_milli


def test_q98_top_anchor_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    counts: Counter = Counter()
    for r in _link_rows():
        counts[(r["dst_url"], r["anchor"])] += 1
    got = q98_anchor_text(spark, sf_dir).collect()
    by_dst: dict[str, list] = {}
    for r in got:
        by_dst.setdefault(r.dst_url, []).append(r)
    for dst, rs in by_dst.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        want = sorted(
            ((a, n) for (d, a), n in counts.items() if d == dst),
            key=lambda t: (-t[1], t[0]),
        )[:3]
        assert [(r.anchor, r.n_links) for r in rs] == want
        # every link for one dst comes from hosts s0..s16 — host
        # counts can never exceed 17 or the link count
        assert all(0 < r.n_hosts <= min(17, r.n_links) for r in rs)


def test_q99_traps_flagged_healthy_hosts_not(spark, sf_dir):
    rows = {r.host: r for r in q99_trap_detection(spark, sf_dir).collect()}
    assert rows["cal.trap.test"].is_trap  # 336 urls, 1 template
    assert rows["cal.trap.test"].n_templates == 1
    # 300 urls; the thread number AND the session id both collapse,
    # so the whole host is one exploding template
    assert rows["sid.trap.test"].is_trap
    assert rows["sid.trap.test"].n_templates == 1
    assert rows["sid.trap.test"].max_template_urls == 300
    for h in range(6):
        r = rows[f"h{h}.voz.test"]
        assert not r.is_trap
        assert r.n_urls == 40


@pytest.mark.parametrize(
    "cls,period,tier,changes",
    [(0, 0, "cold", 0), (1, 4, "cool", 2), (2, 2, "warm", 4), (3, 1, "hot", 8)],
)
def test_q100_change_classes_map_to_tiers(spark, sf_dir, cls, period, tier, changes):
    rows = {r.url: r for r in q100_recrawl_tiers(spark, sf_dir).collect()}
    url = f"https://t.voz.test/t/{cls:04d}"  # url u has class u % 4
    r = rows[url]
    assert r.n_snapshots == 9
    assert r.n_changes == changes
    assert r.rate_milli == changes * 1000 // 8
    assert r.tier == tier
    # fixture sanity: the class pattern really does change with that period
    hist = [s["content_id"] for s in _snapshot_rows() if s["url"] == url]
    assert sum(1 for a, b in zip(hist, hist[1:]) if a != b) == changes


def test_q99_fixture_has_no_trap_false_positives_in_template_rule():
    """The hex rule must not eat the healthy hosts' paths: their
    templates keep distinct words, so each healthy host retains many
    templates."""
    import re

    healthy = [r["path"] for r in _crawl_log_rows() if r["host"] == "h0.voz.test"]
    templates = {
        re.sub(r"[0-9]+", "N", re.sub(r"[0-9a-f]{16,}", "H", p)) for p in healthy
    }
    assert len(templates) >= 5


def test_q101_integer_pagerank_matches_bruteforce(spark, sf_dir):
    """The distributed power iteration must equal a plain-Python
    fixed-point iteration with the same integer arithmetic."""
    from collections import defaultdict

    from voz_spark.crawlops import _Q101_ROUNDS, _linkgraph_rows, q101_opic_importance

    edges = [(r["src"], r["dst"]) for r in _linkgraph_rows()]
    outdeg: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    rank = {v: 1_000_000 for v in nodes}
    for _ in range(_Q101_ROUNDS):
        s: dict[int, int] = defaultdict(int)
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {v: 150_000 + (850 * s.get(v, 0)) // 1000 for v in nodes}
    got = {r.node_id: r.rank_micro for r in q101_opic_importance(spark, sf_dir).collect()}
    assert got == rank
    # dangling nodes leak cash, so totals contract toward the base;
    # importance still differentiates: top node beats the base rank
    assert max(got.values()) > 150_000 > 0
    assert min(got.values()) >= 150_000


def test_q102_allocation_sums_to_budget_and_excludes_traps(spark, sf_dir):
    from voz_spark.crawlops import _Q102_BUDGET, q102_budget_apportionment

    rows = q102_budget_apportionment(spark, sf_dir).collect()
    hosts = {r.host for r in rows}
    assert "cal.trap.test" not in hosts and "sid.trap.test" not in hosts
    assert hosts == {f"h{h}.voz.test" for h in range(6)}
    assert sum(r.allocated for r in rows) == _Q102_BUDGET  # exact, always
    for r in rows:
        assert r.allocated in (r.quota, r.quota + 1)
        # proportionality: 6 equal-weight hosts (40 urls + /about each)
        assert r.quota == _Q102_BUDGET * r.n_urls // sum(x.n_urls for x in rows)


def test_q107_psl_longest_match_semantics(spark, sf_dir):
    from voz_spark.crawlops import q107_registrable_domain

    got = {r.host: (r.public_suffix, r.registrable_domain)
           for r in q107_registrable_domain(spark, sf_dir).collect()}
    assert got["www.shop.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["a.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["b.example.org.uk"] == ("org.uk", "example.org.uk")
    assert got["www.example.com"] == ("com", "example.com")
    assert got["deep.a.b.example.net"] == ("net", "example.net")
    # github.io is itself a public suffix: user sites are DISTINCT
    assert got["user1.github.io"] == ("github.io", "user1.github.io")
    assert got["user2.github.io"] == ("github.io", "user2.github.io")
    assert got["www.user1.github.io"] == ("github.io", "user1.github.io")
    assert got["news.example.com.vn"] == ("com.vn", "example.com.vn")
    assert got["plain.vn"] == ("vn", "plain.vn")
    # unknown TLD falls back to the last label
    assert got["internal.corpnet"] == ("corpnet", "internal.corpnet")
    assert got["a.b.internal.corpnet"] == ("corpnet", "internal.corpnet")


def test_q108_extraction_matches_python_reparse(spark, sf_dir):
    """The regex extraction must agree with an independent Python
    re-parse of the same fixture HTML."""
    import hashlib
    import re

    from voz_spark.crawlops import _html_rows, q108_html_extract

    src = {r["url"]: r["html"] for r in _html_rows()}
    rows = {r.url: r for r in q108_html_extract(spark, sf_dir).collect()}
    assert set(rows) == set(src)
    for url, html in src.items():
        r = rows[url]
        assert r.title == re.search(r"<title>([^<]*)</title>", html).group(1)
        assert r.n_links == len(re.findall(r'href="([^"]*)"', html))
        assert r.n_images == len(re.findall(r'<img src="([^"]*)"', html))
        text = re.sub(r"[ ]+", " ", re.sub(r"<[^>]+>", " ", html)).strip()
        assert r.n_words == len(text.split(" "))
        assert r.text_md5 == hashlib.md5(text.encode()).hexdigest()
    # thread pages really extract content: some page has links+images
    assert any(r.n_images >= 2 for r in rows.values())


def test_q109_templates_cluster_by_page_kind(spark, sf_dir):
    """Within the fixture, template identity is determined by the
    page-structure knobs (kind, post count, quote block) — never by
    host or text content; every cluster spans multiple hosts."""
    import hashlib
    import re

    from voz_spark.crawlops import _html_rows, q109_dom_templates

    fp = {}
    for r in _html_rows():
        key = hashlib.md5(
            ",".join(re.findall(r"<([a-z]+)[^>]*>", r["html"])).encode()
        ).hexdigest()
        host = re.match(r"https://([^/]+)/", r["url"]).group(1)
        fp.setdefault(key, []).append(host)
    want = {k: (len(v), len(set(v))) for k, v in fp.items() if len(v) >= 2}
    got = {r.template_md5: (r.n_pages, r.n_hosts) for r in q109_dom_templates(spark, sf_dir).collect()}
    assert got == want
    assert len(got) >= 3  # several structural clusters exist
    assert any(n_hosts >= 2 for _, n_hosts in got.values())


def test_q110_block_semantics(spark, sf_dir):
    from voz_spark.crawlops import q110_robots_parse

    rows = q110_robots_parse(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault((r.host, r.user_agent), []).append((r.rule_type, r.value))
    # multi-UA block: h0 has vozbot AND altbot sharing the same rules
    assert by[("h0.voz.test", "vozbot")] == by[("h0.voz.test", "altbot")]
    assert ("disallow", "/vozbot-only/") in by[("h0.voz.test", "vozbot")]
    # h1 (h%3==1): no vozbot block at all
    assert ("h1.voz.test", "vozbot") not in by
    # sitemap is host-global (empty UA), exactly one per host
    for h in range(8):
        assert by[(f"h{h}.voz.test", "")] == [
            ("sitemap", f"https://h{h}.voz.test/sitemap.xml")
        ]
    # crawl-delay stays attached to the * block
    assert ("crawl-delay", "2") in by[("h1.voz.test", "*")]
    # the leading comment never leaks into the rules
    assert all("#" not in v for rules in by.values() for _, v in rules)


def test_q111_google_precedence_semantics(spark, sf_dir):
    from voz_spark.crawlops import q111_robots_effective

    got = {(r.host, r.path): (r.allowed, r.matched_rule)
           for r in q111_robots_effective(spark, sf_dir).collect()}
    # h0 has a vozbot group -> it OVERRIDES * entirely: /private/x is
    # allowed (vozbot rules: disallow /vozbot-only/, allow /)
    assert got[("h0.voz.test", "/private/x")] == (True, "/")
    assert got[("h0.voz.test", "/vozbot-only/z")] == (False, "/vozbot-only/")
    # h1 has no vozbot group -> * applies: longest match wins
    assert got[("h1.voz.test", "/private/x")] == (False, "/private/")
    assert got[("h1.voz.test", "/private/pub/y")] == (True, "/private/pub/")
    # no matching rule -> default allowed
    assert got[("h1.voz.test", "/ok/page")] == (True, "")
    # equal-length allow vs disallow -> allow wins (h4 has no vozbot
    # group, so its * block's /dup/ pair applies)
    assert got[("h4.voz.test", "/dup/x")] == (True, "/dup/")
    # h2 (h%3==2): '*' disallows everything, but vozbot group exists
    # and allows / — vozbot overrides
    assert got[("h2.voz.test", "/ok/page")] == (True, "/")


def test_q112_localized_error_pages_flagged_via_cluster(spark, sf_dir):
    import re

    from voz_spark.crawlops import _Q112_ERR_RE, _soft404_rows, q112_soft404_pages

    rows = {r.url: r for r in q112_soft404_pages(spark, sf_dir).collect()}
    src = {r["url"]: r["html"] for r in _soft404_rows()}
    gone = {u for u in src if "/t/gone" in u}
    # exactly the error-template pages are flagged — including the 6
    # localized ones with no marker text of their own
    assert set(rows) == gone
    no_marker = {u for u in gone if not re.search(_Q112_ERR_RE, src[u].lower())}
    assert len(no_marker) == 6
    for u in no_marker:
        assert rows[u].is_soft404 and not rows[u].own_err_text
    # content pages never flagged
    assert all("/t/gone" in u for u in rows)


def test_q113_joint_rule_merges_copies_not_label_noise(spark, sf_dir):
    from voz_spark.crawlops import _mm_rows, q113_multimodal_dedup

    caps = {r["image_id"]: r["caption"] for r in _mm_rows()}
    pairs = q113_multimodal_dedup(spark, sf_dir).collect()
    assert pairs, "joint duplicates must exist"
    from voz_spark.synth import image_id

    from voz_spark.synth import image_phash

    def band_hit(i: int) -> bool:
        a, b = image_phash(i - 1), image_phash(i)
        return any(((a >> (16 * k)) & 0xFFFF) == ((b >> (16 * k)) & 0xFFFF) for k in range(4))

    # LSH recall semantics: a planted pair is a guaranteed candidate
    # only when at least one 16-bit band matches (pigeonhole covers
    # hamming <= 3; above that, a miss is possible and documented)
    joint_ids = {image_id(i) for i in range(560) if i % 14 == 3 and i > 0 and band_hit(i)}
    noise_ids = {image_id(i) for i in range(560) if i % 7 == 3 and i % 14 != 3}
    merged = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    # every band-reachable caption-copy near-dup merges; no
    # unrelated-caption pair does
    assert joint_ids and joint_ids <= merged
    assert not (noise_ids & merged)
    for r in pairs:
        assert r.caption_lev <= 10 and r.hamming <= 10
        assert caps[r.id_a] != caps[r.id_b]  # they are variants, not equal


def test_q116_diff_statuses_and_token_accounting(spark, sf_dir):
    from voz_spark.crawlops import _corpus_version_rows, q116_corpus_diff

    v1 = {r["doc_id"]: r for r in _corpus_version_rows(1)}
    v2 = {r["doc_id"]: r for r in _corpus_version_rows(2)}
    want = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for d in set(v1) | set(v2):
        if d not in v1:
            want["added"] += 1
        elif d not in v2:
            want["removed"] += 1
        elif v1[d]["content_id"] != v2[d]["content_id"]:
            want["changed"] += 1
        else:
            want["unchanged"] += 1
    rows = {r.status: r for r in q116_corpus_diff(spark, sf_dir).collect()}
    assert {s: r.n_docs for s, r in rows.items()} == want
    assert all(v > 0 for v in want.values())  # all four statuses exercised
    assert rows["added"].tokens_v1 == 0 and rows["removed"].tokens_v2 == 0
    # changed docs gained exactly 7 tokens each in the fixture
    assert rows["changed"].token_delta == 7 * want["changed"]
    assert rows["unchanged"].token_delta == 0


def test_q117_canonicalization_cases(spark, sf_dir):
    from voz_spark.crawlops import q117_url_canonicalize

    got = {r.url: r for r in q117_url_canonicalize(spark, sf_dir).collect()}
    c = {u: r.canon_url for u, r in got.items()}
    # case + default port + tracking strip + param sort, all at once
    assert c["HTTP://Voz.Test:80/t/123?utm_source=fb&b=2&a=1"] == "http://voz.test/t/123?a=1&b=2"
    # the clean form is the fixed point
    assert c["http://voz.test/t/123?a=1&b=2"] == "http://voz.test/t/123?a=1&b=2"
    assert not got["http://voz.test/t/123?a=1&b=2"].was_changed
    # the two messy forms of one page collapse to ONE frontier key
    assert c["HTTPS://IMG.Voz.Test:443/i/9?fbclid=XYZ"] == c["https://img.voz.test/i/9"]
    # path case preserved; only tracking params dropped
    assert c["https://voz.test/CaseSensitive/Path?z=9&y=8&utm_campaign=x"] == \
        "https://voz.test/CaseSensitive/Path?y=8&z=9"
    # non-default port kept
    assert c["http://voz.test:8080/alt-port?a=1"] == "http://voz.test:8080/alt-port?a=1"
    # empty query and all-tracking query both drop the '?'
    assert c["https://voz.test/t/7?"] == "https://voz.test/t/7"
    assert c["http://voz.test/t/55?utm_source=a&utm_medium=b&fbclid=c"] == "http://voz.test/t/55"
    assert got["http://voz.test/t/55?utm_source=a&utm_medium=b&fbclid=c"].n_params_kept == 0
    # param VALUES keep their case; sort is bytewise ('M=2' < 'm=1')
    assert c["https://a.voz.test/p?m=1&M=2"] == "https://a.voz.test/p?M=2&m=1"


def test_q125_streaks_and_tiers(spark, sf_dir):
    from voz_spark.crawlops import q125_fetch_health

    rows = {r.host: r for r in q125_fetch_health(spark, sf_dir).collect()}
    assert rows["ok.voz.test"].backoff_tier == "normal"
    assert rows["ok.voz.test"].max_error_streak == 0
    # flaky: 12/60 isolated errors (20%) -> watch, streak of exactly 1
    flaky = rows["flaky.voz.test"]
    assert (flaky.n_errors, flaky.max_error_streak, flaky.backoff_tier) == (12, 1, "watch")
    # outage: one contiguous 12-error window -> slow via the STREAK
    # rule even though the 20% rate alone would only be 'watch'
    outage = rows["outage.voz.test"]
    assert (outage.n_errors, outage.max_error_streak, outage.backoff_tier) == (12, 12, "slow")
    assert outage.error_rate_milli == flaky.error_rate_milli  # same rate, different verdict
    dead = rows["dead.voz.test"]
    assert (dead.error_rate_milli, dead.backoff_tier) == (1000, "suspend")


def test_q132_matches_bruteforce_reciprocity(spark, sf_dir):
    """Pin q132 against an independent pure-Python recount of the
    directed host-pair link log and its integer reciprocity rule."""
    import collections

    import duckdb

    from voz_spark.crawlops import (
        _Q132_H,
        _Q132_MIN_EACH,
        _Q132_RECIP_MILLI,
        q132_link_farm_pairs,
    )

    rows = duckdb.sql(
        f"SELECT user_id, event_id FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    fwd = collections.Counter()
    rev = collections.Counter()
    for uid, eid in rows:
        s, d = uid % _Q132_H, eid % _Q132_H
        if s == d:
            continue
        if s < d:
            fwd[(s, d)] += 1
        else:
            rev[(d, s)] += 1
    want = {}
    for key in set(fwd) | set(rev):
        f_, r_ = fwd[key], rev[key]
        if f_ >= _Q132_MIN_EACH and r_ >= _Q132_MIN_EACH:
            milli = (1000 * min(f_, r_)) // max(f_, r_)
            if milli >= _Q132_RECIP_MILLI:
                want[key] = (f_, r_, milli)
    got = {
        (r.host_a, r.host_b): (r.fwd, r.rev, r.recip_milli)
        for r in q132_link_farm_pairs(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_q132_plan_single_hash_aggregate_exchange(spark, sf_dir):
    """q132's one-shuffle claim: exactly one hashpartitioning Exchange
    (the pair-key aggregate); the final orderBy adds only a
    rangepartitioning exchange."""
    import re

    from voz_spark.crawlops import q132_link_farm_pairs

    d = q132_link_farm_pairs(spark, sf_dir)
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    kinds = re.findall(r"Arguments: (\w+partitioning)", plan)
    assert kinds.count("hashpartitioning") == 1, plan
    assert all(k in ("hashpartitioning", "rangepartitioning") for k in kinds), plan


def test_q135_flags_exactly_the_planted_mime_lies(spark, sf_dir):
    """Every planted lie (jpeg-over-HTML at idx%13==4, html-over-PDF at
    idx%17==9) is flagged with the sniffed truth; no honest row is."""
    from voz_spark.crawlops import _Q135_N, q135_content_type_mismatch

    got = {r.fetch_id: r for r in q135_content_type_mismatch(spark, sf_dir).collect()}
    expect = {}
    for idx in range(_Q135_N):
        if idx % 13 == 4:
            expect[f"f{idx:07d}"] = ("image/jpeg", "text/html")
        elif idx % 17 == 9:
            expect[f"f{idx:07d}"] = ("text/html", "application/pdf")
    assert {k: (r.declared_type, r.sniffed_type) for k, r in got.items()} == expect


def test_q135_plan_has_no_shuffle_before_the_sort(spark, sf_dir):
    """The sniff is in-row: the only exchange is the final orderBy's
    rangepartitioning."""
    import re

    from voz_spark.crawlops import q135_content_type_mismatch

    d = q135_content_type_mismatch(spark, sf_dir)
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    kinds = re.findall(r"Arguments: (\w+partitioning)", plan)
    assert kinds.count("hashpartitioning") == 0, plan


def test_q138_locale_clusters_prefer_en_and_split_translated_fr(spark, sf_dir):
    """Untranslated pages cluster across all three locales with the
    'en' URL canonical; pages whose fr variant is translated (page%10
    == 7) cluster as en+vi only — the fr singleton drops below the
    n_urls>1 floor."""
    from voz_spark.session import load_table
    from voz_spark.crawlops import q138_locale_dup_clusters

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = q138_locale_dup_clusters(spark, sf_dir).collect()
    full_pages = 0
    for r in rows:
        assert r.n_urls == len(r.locales.split(","))
        if "en" in r.locales.split(","):
            assert "/en/" in r.canonical_url
        if r.locales == "en,fr,vi":
            full_pages += 1
            page = int(r.canonical_url.rsplit("/", 1)[1])
            assert page % 10 != 7
        elif r.locales == "en,vi":
            page = int(r.canonical_url.rsplit("/", 1)[1])
            # translated-fr pages, plus a possible ragged tail page
            # that never received its fr row
            assert page % 10 == 7 or (page + 1) * 3 > n_docs
    assert full_pages > 0


def test_q139_roi_matches_bruteforce_first_serve(spark, sf_dir):
    """Distributed first-serve attribution equals a plain-Python scan:
    each fingerprint credits the host on its smallest (fetch_id, host)
    key, ROI is integer milli, and totals reconcile."""
    from voz_spark.session import load_table
    from voz_spark.crawlops import _Q139_C, _Q139_H, q139_crawl_roi

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id").collect()
    first: dict = {}
    fetches: dict = {}
    for r in ev:
        host = r.user_id % _Q139_H
        fp = r.event_id % _Q139_C
        fetches[host] = fetches.get(host, 0) + 1
        key = (r.event_id, host)
        if fp not in first or key < first[fp]:
            first[fp] = key
    credits: dict = {}
    for _, h in first.values():
        credits[h] = credits.get(h, 0) + 1
    got = {r.host: r for r in q139_crawl_roi(spark, sf_dir).collect()}
    assert set(got) == set(fetches)
    for h, r in got.items():
        assert r.n_fetches == fetches[h]
        assert r.n_discoveries == credits.get(h, 0)
        assert r.roi_milli == 1000 * credits.get(h, 0) // fetches[h]
    assert sum(r.n_discoveries for r in got.values()) == len(first)


def test_q142_violations_match_bruteforce_gap_scan(spark, sf_dir):
    """Distributed per-host gap audit equals a plain-Python sort+scan
    of the same fetch log with the same integer-microsecond rule."""
    from voz_spark.session import load_table
    from voz_spark.crawlops import _Q142_DELAYS, _Q142_H, q142_politeness_audit

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    by_host: dict = {}
    for r in ev:
        by_host.setdefault(r.user_id % _Q142_H, []).append((r.ts, r.event_id))
    got = {r.host: r for r in q142_politeness_audit(spark, sf_dir).collect()}
    assert set(got) == set(by_host)
    for h, rows in by_host.items():
        rows.sort()
        gaps = [
            ((b[0] - a[0]).days * 86_400 + (b[0] - a[0]).seconds) * 1_000_000
            + (b[0] - a[0]).microseconds
            for a, b in zip(rows, rows[1:])
        ]
        need_us = (h % _Q142_DELAYS + 1) * 1_000_000
        r = got[h]
        assert r.n_fetches == len(rows)
        assert r.n_gaps == len(gaps)
        assert r.n_violations == sum(1 for g in gaps if g < need_us)
        assert r.min_gap_us == (min(gaps) if gaps else -1)
        assert r.required_delay_s == h % _Q142_DELAYS + 1


def test_q144_selection_matches_browser_rule(spark, sf_dir):
    """The in-row srcset pick equals a plain-Python reimplementation
    of the browser rule (smallest width >= target, else largest) over
    the same arithmetic fixture."""
    import duckdb

    from voz_spark.crawlops import q144_srcset_consolidation

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    widths = [320, 480, 800, 1200, 1600]
    from collections import defaultdict

    pages, urls = defaultdict(int), defaultdict(set)
    for i in range(n_docs):
        cands = widths[: i % 4 + 2]
        target = 360 + (i % 5) * 160
        geq = [w for w in cands if w >= target]
        w = min(geq) if geq else max(cands)
        pages[w] += 1
        urls[w].add(f"https://cdn.example/i{i}-{w}w.jpg")
    got = {r.chosen_w: r for r in q144_srcset_consolidation(spark, sf_dir).collect()}
    assert set(got) == set(pages)
    for w in pages:
        assert got[w].n_pages == pages[w]
        assert got[w].n_urls == len(urls[w])


def test_q145_control_origin_never_merges(spark, sf_dir):
    """Shard copies consolidate under cdn#; the static.other.example
    control stays a separate family with zero redundancy, and counts
    match a brute-force recount."""
    import duckdb

    from voz_spark.crawlops import q145_cdn_shard_consolidation

    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    from collections import defaultdict

    fam = defaultdict(lambda: defaultdict(set))  # norm -> content -> hosts
    n_urls = defaultdict(int)
    for i in range(n_docs):
        c, shard = i // 7, i % 7
        host = (
            "static.other.example"
            if c % 5 == 2 and shard == 0
            else f"cdn{shard}.assets.example"
        )
        norm = "static.other.example" if host.startswith("static") else "cdn#.assets.example"
        fam[norm][c].add(host)
        n_urls[norm] += 1
    got = {r.norm_host: r for r in q145_cdn_shard_consolidation(spark, sf_dir).collect()}
    assert set(got) == set(fam)
    for norm, contents in fam.items():
        r = got[norm]
        assert r.n_contents == len(contents)
        assert r.n_urls == n_urls[norm]
        assert r.n_redundant_urls == n_urls[norm] - len(contents)
        assert r.n_multi_host_contents == sum(1 for h in contents.values() if len(h) > 1)
        assert r.max_raw_hosts == max(len(h) for h in contents.values())
    assert got["static.other.example"].n_redundant_urls == 0
    assert got["cdn#.assets.example"].n_redundant_urls > 0


def test_q146_savings_match_bruteforce_scan(spark, sf_dir):
    """The distributed per-URL fingerprint lag equals a plain-Python
    sort+scan: same unchanged counts and 304-eligible bytes."""
    from collections import defaultdict

    from voz_spark.crawlops import q146_revisit_savings
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts").collect()
    by_url = defaultdict(list)
    for r in ev:
        u = r.event_id % 997
        fp = u * 10 + (r.event_id // 101) % 5
        by_url[u].append((r.ts, r.event_id, fp))
    stats = defaultdict(lambda: [0, 0, 0, 0])  # fetches, refetches, unchanged, bytes
    for u, rows in by_url.items():
        rows.sort()
        h = u % 23
        nb = 1000 + u % 50 * 100
        stats[h][0] += len(rows)
        stats[h][1] += len(rows) - 1
        for a, b in zip(rows, rows[1:]):
            if a[2] == b[2]:
                stats[h][2] += 1
                stats[h][3] += nb
    got = {r.host: r for r in q146_revisit_savings(spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for h, (nf, nr, nu, nbytes) in stats.items():
        r = got[h]
        assert (r.n_fetches, r.n_refetches, r.n_unchanged) == (nf, nr, nu)
        assert r.bytes_304_eligible == nbytes
        assert r.change_rate_milli == (-1 if nr == 0 else 1000 * (nr - nu) // nr)


# ---------------------------------------------------------------- q157


def test_q157_hrw_matches_pure_python_and_moves_only_to_new_shard(spark, sf_dir):
    """The rendezvous assignment must equal a pure-Python HRW mirror
    host-by-host, and on a K -> K+1 grow every moved host must land on
    the NEW shard (the minimal-disruption property), with total churn
    near 1/(K+1)."""
    import hashlib

    from pyspark.sql import functions as F

    from voz_spark.crawlops import _Q157_HOSTS, _Q157_K
    from voz_spark.session import load_table

    def hrw(host: int, k: int) -> int:
        keys = [hashlib.md5(f"{host}:{s}".encode()).hexdigest() for s in range(k)]
        return keys.index(max(keys))

    hosts = sorted(
        r["host"]
        for r in load_table(spark, sf_dir, "events")
        .select((F.col("event_id") % _Q157_HOSTS).alias("host"))
        .distinct()
        .collect()
    )
    a16 = {h: hrw(h, _Q157_K) for h in hosts}
    a17 = {h: hrw(h, _Q157_K + 1) for h in hosts}
    moved = [h for h in hosts if a16[h] != a17[h]]
    # minimal disruption: movers go ONLY to the new shard
    assert all(a17[h] == _Q157_K for h in moved)
    # expected churn is |hosts|/(K+1); allow generous slack on a small N
    exp = len(hosts) / (_Q157_K + 1)
    assert 0.3 * exp <= len(moved) <= 2.5 * exp

    from voz_spark.crawlops import q157_fetch_shard_routing

    rows = q157_fetch_shard_routing(spark, sf_dir).collect()
    got = {r["shard"]: (r["n_hosts"], r["n_moved_on_grow"]) for r in rows}
    from collections import Counter

    n_hosts = Counter(a16.values())
    n_moved = Counter(a16[h] for h in moved)
    assert got == {s: (n_hosts[s], n_moved.get(s, 0)) for s in n_hosts}


# ---------------------------------------------------------------- q158


def test_q158_pools_match_union_find(spark, sf_dir):
    """The star-contraction pools must equal a plain union-find over
    the same host<->IP edge rule, and the h % 7 == 0 bridge hosts must
    actually merge adjacent triples (some pool spans > 3 hosts)."""
    from pyspark.sql import functions as F

    from voz_spark.crawlops import _Q158_IP_OFFSET, q158_ip_pool_politeness
    from voz_spark.session import load_table

    hs = [
        int(r["doc_id"])
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for h in hs:
        union(h, h // 3 + _Q158_IP_OFFSET)
        if h % 7 == 0:
            union(h, (h + 5) // 3 + _Q158_IP_OFFSET)
    comp: dict[int, list[int]] = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    want = {
        min(members): (
            sum(1 for n in members if n < _Q158_IP_OFFSET),
            sum(1 for n in members if n >= _Q158_IP_OFFSET),
        )
        for members in comp.values()
    }
    rows = q158_ip_pool_politeness(spark, sf_dir).collect()
    got = {r["pool_id"]: (r["n_hosts"], r["n_ips"]) for r in rows}
    assert got == want
    assert max(h for h, _ in got.values()) > 3  # bridges really chain


# ---------------------------------------------------------------- q160


def test_q160_matches_sequential_greedy(spark, sf_dir):
    """The window formulation must equal a sequential per-host greedy
    walk (take in arrival order while cumulative bytes fit), and every
    host with deferrals must have scheduled bytes within one URL's
    size of its budget (no early stop)."""
    from pyspark.sql import functions as F

    from voz_spark.crawlops import _Q160_HOSTS, q160_byte_budget_round
    from voz_spark.session import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.col("ts").cast("string").alias("ts"))
        .collect()
    )
    queues: dict[int, list[tuple[str, int, int]]] = {}
    for r in rows:
        e = r["event_id"]
        queues.setdefault(e % _Q160_HOSTS, []).append(
            (r["ts"], e, 1000 + e % 50 * 100)
        )
    want = {}
    for host, q in queues.items():
        budget = (host % 4 + 1) * 100_000
        cum = n_sched = bytes_sched = 0
        for _, _, b in sorted(q):
            cum += b
            if cum <= budget:
                n_sched += 1
                bytes_sched += b
        want[host] = (budget, n_sched, len(q) - n_sched, bytes_sched)
    got = {
        r["host"]: (
            r["budget_bytes"],
            r["n_scheduled"],
            r["n_deferred"],
            r["bytes_scheduled"],
        )
        for r in q160_byte_budget_round(spark, sf_dir).collect()
    }
    assert got == want
    for host, (budget, n, nd, by) in got.items():
        if nd > 0:
            assert budget - by < 1000 + 49 * 100  # packed to within max URL size


# ---------------------------------------------------------------- q162


def test_q162_verdicts_and_bruteforce_recount(spark, sf_dir):
    """The mined verdicts must be exactly page=content-bearing,
    utm/ref=neutral, and the group counts must match a brute-force
    Python recount of the identical URL-synth rule. For page — whose
    fingerprint varies 1:1 with its value — every multi-value group
    must violate."""
    import hashlib

    from pyspark.sql import functions as F

    from voz_spark.crawlops import q162_tracking_param_mining
    from voz_spark.session import load_table

    us = [
        r["event_id"]
        for r in load_table(spark, sf_dir, "events").select("event_id").collect()
    ]
    groups: dict[tuple, tuple[set, set]] = {}
    for u in us:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        path = f"p{u % 97}"
        page, utm = str(h % 4), str(h // 4 % 7)
        has_ref, ref = (h // 28) % 3 == 0, str(h // 84 % 5)
        fp = hashlib.md5(f"{path}:{page}".encode()).hexdigest()
        tail = f"&ref={ref}" if has_ref else ""
        ex = [
            ("page", page, f"{path}?utm={utm}{tail}"),
            ("utm", utm, f"{path}?page={page}{tail}"),
        ]
        if has_ref:
            ex.append(("ref", ref, f"{path}?page={page}&utm={utm}"))
        for param, val, stripped in ex:
            vs, fs = groups.setdefault((param, stripped), (set(), set()))
            vs.add(val)
            fs.add(fp)
    want = {}
    for (param, _), (vs, fs) in groups.items():
        n, m, v = want.get(param, (0, 0, 0))
        want[param] = (
            n + 1,
            m + (len(vs) > 1),
            v + (len(vs) > 1 and len(fs) > 1),
        )
    rows = q162_tracking_param_mining(spark, sf_dir).collect()
    got = {
        r["param"]: (r["n_groups"], r["n_multi_value_groups"], r["n_violating_groups"])
        for r in rows
    }
    assert got == want
    verdicts = {r["param"]: r["verdict"] for r in rows}
    assert verdicts == {
        "page": "content-bearing",
        "utm": "neutral",
        "ref": "neutral",
    }
    page = next(r for r in rows if r["param"] == "page")
    assert page["n_violating_groups"] == page["n_multi_value_groups"] > 0


def test_q166_template_verdicts(spark, sf_dir):
    """The three planted URL families land in the three verdict
    classes: calendar trap (constant fingerprint under unbounded
    digit URLs), sort-order redundancy (~6 URLs per listing), real
    content (1 URL per fingerprint)."""
    from voz_spark.crawlops import q166_url_template_mining

    rows = {r["template"]: r for r in q166_url_template_mining(spark, sf_dir).collect()}
    assert set(rows) == {"/cal/{d}/{d}/{d}", "/forum/t{d}/p{d}", "/list/{d}/sort-{d}"}
    assert rows["/cal/{d}/{d}/{d}"]["verdict"] == "trap"
    assert rows["/cal/{d}/{d}/{d}"]["n_fingerprints"] == 1
    assert rows["/forum/t{d}/p{d}"]["verdict"] == "content"
    assert rows["/forum/t{d}/p{d}"]["n_urls"] == rows["/forum/t{d}/p{d}"]["n_fingerprints"]
    assert rows["/list/{d}/sort-{d}"]["verdict"] == "redundant"


# ---------------------------------------------------------------- q167


def test_q167_majority_alt_election_and_grading(spark, sf_dir):
    """Every image's canonical alt must be the strict 6-vote majority
    variant (d+1)%5 — beating the 3-vote slot-0 variant even when the
    loser sorts lexicographically first — and the grade must follow
    the planted class of the WINNING alt."""
    from voz_spark.crawlops import q167_alt_text_mining

    def alt_for(d: int, v: int) -> str:
        return [
            "",
            f"IMG_{d:04d}.jpg",
            "photo",
            f"rig build log {d} with custom loop",
            f"desk setup photo from thread {d}",
        ][v]

    rows = {r["img_url"]: r for r in q167_alt_text_mining(spark, sf_dir).collect()}
    assert len(rows) == 100
    classes = {0: "empty", 1: "filename", 2: "generic", 3: "descriptive", 4: "descriptive"}
    for d in range(100):
        r = rows[f"https://cdn{d % 4}.voz.test/img/{d:04d}.jpg"]
        win = (d + 1) % 5
        assert r["canon_alt"] == alt_for(d, win)
        assert (r["n_votes"], r["n_pages"], r["n_variants"]) == (6, 9, 2)
        assert r["alt_class"] == classes[win]
    # d=4: winner "" (empty) must beat the 3-vote descriptive variant;
    # d=0: winner IMG_0000.jpg must beat "" although "" sorts first.
    assert rows["https://cdn0.voz.test/img/0004.jpg"]["canon_alt"] == ""
    assert rows["https://cdn0.voz.test/img/0000.jpg"]["canon_alt"] == "IMG_0000.jpg"


# ---------------------------------------------------------------- q168


def test_q168_cache_state_and_shard_recount(spark, sf_dir):
    """The shard/state work orders must match a brute-force Python
    replay of the identical host-fold + TTL rule, and every host id
    must land in exactly one state."""
    from voz_spark.crawlops import q168_dns_prefetch_plan
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    per_host: dict[int, int] = {}
    for r in ev:
        hid = r["event_id"] % 211
        per_host[hid] = per_host.get(hid, 0) + 1
    want: dict[tuple, list] = {}
    for hid, n in per_host.items():
        if hid % 3 == 0:
            state = "new"
        elif 60 * hid > 300 + 300 * (hid % 7):
            state = "expired"
        else:
            state = "fresh"
        k = (hid % 8, state)
        agg = want.setdefault(k, [0, 0, 0])
        agg[0] += 1
        agg[1] += n
        agg[2] = max(agg[2], n)
    rows = q168_dns_prefetch_plan(spark, sf_dir).collect()
    got = {
        (r["shard"], r["cache_state"]): [r["n_hosts"], r["n_urls"], r["max_urls_one_host"]]
        for r in rows
    }
    assert got == want
    # hid 0 (new), hid 50 (expired: 3000s old > 600s ttl), hid 10
    # (fresh: 600s old <= 1200s ttl) — the three planted exemplars.
    assert ("new" if 0 % 3 == 0 else "?") == "new"
    states = {s for (_, s) in got}
    assert states == {"new", "expired", "fresh"}


# ---------------------------------------------------------------- q169


def test_q169_tier_budgets_and_recount(spark, sf_dir):
    """Tier populations must match a brute-force replay of the
    histogram-cutoff rule: hot <= 10% of the frontier, hot+warm <= 40%,
    tiers partition the frontier, and priority ranges are disjoint and
    ordered hot < warm < cold."""
    import hashlib

    from voz_spark.crawlops import q169_frontier_spill_tiers
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    bins: dict[int, list] = {}
    for r in ev:
        e = r["event_id"]
        p = int(hashlib.md5(str(e).encode()).hexdigest()[:15], 16) % 65536
        b = bins.setdefault(p, [0, 0])
        b[0] += 1
        b[1] += 500 + e % 100 * 10
    n = sum(c for c, _ in bins.values())
    cum = 0
    hot_cut = warm_cut = -1
    for p in sorted(bins):
        cum += bins[p][0]
        if cum * 10 <= n:
            hot_cut = p
        if cum * 10 <= n * 4:
            warm_cut = p
    want = {}
    for p, (c, b) in bins.items():
        tier = "hot" if p <= hot_cut else ("warm" if p <= warm_cut else "cold")
        agg = want.setdefault(tier, [0, 0, 0, 65536, -1])
        agg[0] += 1
        agg[1] += c
        agg[2] += b
        agg[3] = min(agg[3], p)
        agg[4] = max(agg[4], p)
    rows = q169_frontier_spill_tiers(spark, sf_dir).collect()
    got = {
        r["tier"]: [r["n_bins"], r["n_urls"], r["n_bytes"], r["p_min"], r["p_max"]]
        for r in rows
    }
    assert got == want
    assert set(got) == {"hot", "warm", "cold"}
    assert got["hot"][1] * 10 <= n
    assert (got["hot"][1] + got["warm"][1]) * 10 <= n * 4
    assert got["hot"][1] + got["warm"][1] + got["cold"][1] == n
    assert got["hot"][4] < got["warm"][3] and got["warm"][4] < got["cold"][3]


# ---------------------------------------------------------------- q170


def test_q170_rfc9111_parse_and_policy_recount(spark, sf_dir):
    """Effective-TTL parsing must honor s-maxage precedence and
    no-store/no-cache zeroing; per-host policy must match a
    brute-force Python replay of the identical header-synth rule."""
    import hashlib

    from voz_spark.crawlops import q170_cache_header_policy
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    want: dict[int, list] = {}
    for r in ev:
        e = r["event_id"]
        h = int(hashlib.md5(str(e).encode()).hexdigest()[:15], 16)
        v = e % 5
        if v in (1, 3):  # no-store / no-cache
            ttl, unc, dflt = 0, 1, 0
        elif v == 0:
            ttl, unc, dflt = h % 86400, 0, 0
        elif v == 2:
            ttl, unc, dflt = (h // 7) % 7200, 0, 0  # s-maxage wins
        else:
            ttl, unc, dflt = 3600, 0, 1
        agg = want.setdefault(e % 53, [0, 0, 0, 0, 0])
        agg[0] += 1
        agg[1] += unc
        agg[2] += dflt
        agg[3] += ttl
        agg[4] = max(agg[4], ttl)
    rows = q170_cache_header_policy(spark, sf_dir).collect()
    assert len(rows) == len(want)
    for r in rows:
        n, unc, dflt, tsum, tmax = want[r["host"]]
        assert [r["n_urls"], r["n_uncacheable"], r["n_default"], r["ttl_sum"], r["ttl_max"]] == [
            n, unc, dflt, tsum, tmax
        ]
        policy = (
            "always-refetch" if unc * 2 >= n else ("short-ttl" if tsum // n < 1800 else "long-ttl")
        )
        assert r["policy"] == policy


# ---------------------------------------------------------------- q171


def test_q171_planted_mojibake_detected_exactly(spark, sf_dir):
    """Exactly the planted corruption set (doc_id%7==3, else %11==5)
    must be rejected — every corrupted doc crosses the 5-milli gate on
    this corpus (texts are dense in 'a'/'e') and no clean doc scores a
    single artifact."""
    from voz_spark.crawlops import q171_mojibake_gate
    from voz_spark.session import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = {r["doc_id"]: r for r in q171_mojibake_gate(spark, sf_dir).collect()}
    assert len(rows) == len(texts)
    for d, text in texts.items():
        r = rows[d]
        if d % 7 == 3:
            assert r["n_moji"] == text.count("a")
        elif d % 11 == 5:
            assert r["n_moji"] == text.count("e")
        else:
            assert r["n_moji"] == 0 and r["verdict"] == "clean"
        planted = d % 7 == 3 or d % 11 == 5
        if planted and 1000 * r["n_moji"] // r["n_chars"] >= 5:
            assert r["verdict"] == "reject"
    planted_ids = {d for d in texts if d % 7 == 3 or d % 11 == 5}
    rejected = {d for d, r in rows.items() if r["verdict"] == "reject"}
    assert rejected <= planted_ids
    assert len(rejected) >= len(planted_ids) * 9 // 10  # corpus is a/e-dense


# ---------------------------------------------------------------- q172


def test_q172_p95_recount_and_slow_hosts(spark, sf_dir):
    """p50/p95 bins must match a brute-force percentile replay, the
    interval rule must be 2x the p95 bin upper bound floored at
    200 ms, and exactly the hosts with host % 13 == 2 may be slow."""
    import hashlib

    from voz_spark.crawlops import q172_latency_politeness
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    lats: dict[int, list] = {}
    for r in ev:
        e = r["event_id"]
        host = e % 97
        h = int(hashlib.md5(str(e).encode()).hexdigest()[:15], 16)
        lats.setdefault(host, []).append(50 + h % (3000 if host % 13 == 2 else 1000))
    rows = {r["host"]: r for r in q172_latency_politeness(spark, sf_dir).collect()}
    assert len(rows) == len(lats)
    for host, ls in lats.items():
        bins = sorted(x // 50 for x in ls)
        n = len(bins)
        cum = 0
        p50 = p95 = None
        seen = {}
        for b in bins:
            seen[b] = seen.get(b, 0) + 1
        cumc = 0
        for b in sorted(seen):
            cumc += seen[b]
            if p50 is None and 2 * cumc >= n:
                p50 = b
            if p95 is None and 20 * cumc >= 19 * n:
                p95 = b
        r = rows[host]
        assert (r["p50_bin"], r["p95_bin"]) == (p50, p95)
        assert r["interval_ms"] == max(200, (p95 + 1) * 50 * 2)
        assert r["verdict"] == ("slow" if (p95 + 1) * 50 >= 1500 else "normal")
        if r["verdict"] == "slow":
            assert host % 13 == 2


# ---------------------------------------------------------------- q175


def test_q175_binding_consistency_with_q172(spark, sf_dir):
    """effective_ms must be the exact max of the declared and adaptive
    intervals, the binding label must name the winner, and the rows
    must agree 1:1 with q172's adaptive output."""
    from voz_spark.crawlops import q172_latency_politeness, q175_effective_crawl_delay

    adaptive = {
        r["host"]: r["interval_ms"] for r in q172_latency_politeness(spark, sf_dir).collect()
    }
    rows = q175_effective_crawl_delay(spark, sf_dir).collect()
    assert {r["host"] for r in rows} == set(adaptive)
    for r in rows:
        want_robots = 5000 if r["host"] % 5 == 0 else (1000 if r["host"] % 5 == 1 else 0)
        assert r["robots_ms"] == want_robots
        assert r["adaptive_ms"] == adaptive[r["host"]]
        assert r["effective_ms"] == max(want_robots, r["adaptive_ms"])
        if r["binding"] == "robots":
            assert want_robots >= r["adaptive_ms"] and want_robots > 0
        elif r["binding"] == "latency":
            assert r["adaptive_ms"] > max(200, want_robots) or (
                r["adaptive_ms"] > 200 and want_robots < r["adaptive_ms"]
            )
        else:
            assert r["effective_ms"] == 200 or r["adaptive_ms"] == 200
    assert {r["binding"] for r in rows} >= {"robots", "latency"}


# ---------------------------------------------------------------- q177


def test_q177_drain_math_recount(spark, sf_dir):
    """Queue stats and rounds-to-drain must match a brute-force replay;
    verdicts must follow the drain thresholds exactly."""
    import hashlib

    from voz_spark.crawlops import q177_frontier_age_audit
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    agg: dict[int, list] = {}
    for r in ev:
        e = r["event_id"]
        host = e % 67
        age = int(hashlib.md5(str(e).encode()).hexdigest()[:15], 16) % 100000
        a = agg.setdefault(host, [0, 0, 0])
        a[0] += 1
        a[1] = max(a[1], age)
        a[2] += age
    rows = {r["host"]: r for r in q177_frontier_age_audit(spark, sf_dir).collect()}
    assert len(rows) == len(agg)
    for host, (n, oldest, s) in agg.items():
        r = rows[host]
        budget = 50 + host % 5 * 150
        drain = (n + budget - 1) // budget
        assert (r["n_queued"], r["oldest_s"], r["mean_age_s"]) == (n, oldest, s // n)
        assert (r["budget_per_round"], r["drain_rounds"]) == (budget, drain)
        assert r["verdict"] == (
            "starving" if drain > 100 else ("backlogged" if drain > 10 else "healthy")
        )


# ---------------------------------------------------------------- q183


def test_q183_jain_recount_and_bounds(spark, sf_dir):
    """The fairness scalar must match a brute-force Jain computation
    and respect its analytic bounds: 1000/n <= jain <= 1000, and
    max_share >= 1/n."""
    from voz_spark.crawlops import q183_schedule_fairness
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id").collect()
    counts: dict[int, int] = {}
    for r in ev:
        h = r["event_id"] % 41
        counts[h] = counts.get(h, 0) + 1
    xs = list(counts.values())
    n, sx, sxx, mx = len(xs), sum(xs), sum(x * x for x in xs), max(xs)
    r = q183_schedule_fairness(spark, sf_dir).collect()[0]
    assert (r["n_hosts"], r["n_scheduled"], r["max_one_host"]) == (n, sx, mx)
    assert r["max_share_milli"] == 1000 * mx // sx
    assert r["jain_milli"] == 1000 * sx * sx // (n * sxx)
    assert 1000 // n <= r["jain_milli"] <= 1000
    # events spread near-uniformly over 41 hosts -> high fairness
    assert r["jain_milli"] >= 900


# ---------------------------------------------------------------- q190


def test_q190_packed_key_is_lexicographic_and_roundtrips(spark, sf_dir):
    """Every cell must round-trip all four fields from the packed key,
    and the packed order must equal tuple order: pri_min/pri_max per
    (fresh, health) cell must be consistent with the field widths."""
    import hashlib

    from voz_spark.crawlops import q190_priority_fusion
    from voz_spark.session import load_table

    rows = q190_priority_fusion(spark, sf_dir).collect()
    assert rows, "no cells"
    total = 0
    for r in rows:
        assert r["n_roundtrip_ok"] == r["n_urls"]  # lossless packing
        total += r["n_urls"]
        # packed key decomposes: fresh/health fields of min and max match the cell
        for pri in (r["pri_min"], r["pri_max"]):
            assert (pri >> 24) & 255 == r["fresh"]
            assert (pri >> 16) & 255 == r["health"]
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events
    # spot-replay one event end to end
    e = load_table(spark, sf_dir, "events").select("event_id").limit(1).collect()[0][0]
    h = int(hashlib.md5(str(e).encode()).hexdigest()[:15], 16)
    u = e % 499
    pri = ((h % 65536) << 32) + (((h // 7) % 4) << 24) + (((u % 23) % 3) << 16) + u % 97
    cell = next(
        r for r in rows if r["fresh"] == (h // 7) % 4 and r["health"] == (u % 23) % 3
    )
    assert cell["pri_min"] <= pri <= cell["pri_max"]


# ---------------------------------------------------------------- q191


def test_q191_planted_misconfigurations(spark, sf_dir):
    """Hosts k%7==5 must be all-dead ('/t/' kills everything), k%3==0
    hosts lose exactly the /t/1* paths, everyone else is clean."""
    from voz_spark.crawlops import q191_sitemap_robots_crosscheck

    rows = {r["host"]: r for r in q191_sitemap_robots_crosscheck(spark, sf_dir).collect()}
    assert set(rows) == set(range(12))
    for k, r in rows.items():
        n = 20 + k * 5
        assert r["n_advertised"] == n
        if k % 7 == 5:
            assert r["verdict"] == "all-dead" and r["n_robots_dead"] == n
        elif k % 3 == 0:
            dead = sum(1 for i in range(n) if str(i).startswith("1"))
            assert r["n_robots_dead"] == dead
            assert r["verdict"] in ("misconfigured", "minor")
        else:
            assert r["verdict"] == "clean" and r["n_robots_dead"] == 0
