"""Semantics tests for the round-3 selection/curation wave: q223
(prefix-filter exact similarity join), q224 (BPE merge rounds), q225
(target-affinity selection), q226 (crawl-trap detection), q227
(boilerplate strip). Each is pinned against an independent pure-Python
replay; q223 additionally against the brute-force all-pairs truth (the
no-false-negative completeness guarantee prefix filtering claims)."""

import hashlib
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _shingle_sets(docs):
    out = {}
    for r in docs:
        tk = re.split(r"\s+", r["text"].strip())
        out[r["doc_id"]] = {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        }
    return out


def test_q223_complete_and_exact_vs_bruteforce(spark, sf_dir):
    """Brute-force every doc pair's exact Jaccard; the prefix-filter
    join must return EXACTLY the pairs with J >= 1/2 (3i >= na+nb) —
    completeness (no false negatives, the theorem) AND no extras
    (verification) — with exact intersection sizes."""
    from voz_spark.dataprep import q223_prefix_filter_join
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ss = _shingle_sets(docs)
    ids = sorted(ss)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = len(ss[a]), len(ss[b])
            inter = len(ss[a] & ss[b])
            if 3 * inter >= na + nb and na and nb:
                want[(a, b)] = (inter, na, nb)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["na"], r["nb"])
        for r in q223_prefix_filter_join(spark, sf_dir).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture plants near-dups


def _bpe_python(word_counts, rounds):
    syms = {w: list(w) for w in word_counts}
    merges = []
    for rnd in range(1, rounds + 1):
        pc = Counter()
        for w, wt in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wt
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, c))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_q224_bpe_vs_python(spark, sf_dir):
    """Replay 3 greedy-leftmost BPE rounds in Python (argmax by count
    desc then lexicographic) and compare the merge table exactly."""
    from voz_spark.corpus_ops import q224_bpe_merge_rounds
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    wc = Counter()
    for r in docs:
        wc.update(re.split(r"\s+", r["text"].strip()))
    want = _bpe_python(wc, 3)
    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in q224_bpe_merge_rounds(spark, sf_dir).collect()
    ]
    assert got == want
    assert [r for r, _, _, _ in got] == [1, 2, 3]
    assert all(c > 0 for _, _, _, c in got)


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q225_target_affinity_vs_python(spark, sf_dir):
    """Replay the hashed-bigram micro-probability scoring; the top-50
    rows' integer (score, n_bigrams) must match, and the selected doc
    set must equal the replay's top-50 under the same quantized key."""
    from voz_spark.corpus_ops import q225_target_affinity_selection
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    inst = defaultdict(list)  # doc -> bucket list (instances)
    for r in docs:
        tk = re.split(r"\s+", r["text"].strip())
        for i in range(len(tk) - 1):
            inst[r["doc_id"]].append(_h60(tk[i] + " " + tk[i + 1]) % 256)
    seed = {d: b for d, b in inst.items() if d % 20 == 0}
    pool = {d: b for d, b in inst.items() if d % 20 != 0}
    tc, rc = Counter(), Counter()
    for b in seed.values():
        tc.update(b)
    for b in pool.values():
        rc.update(b)
    tn = sum(tc.values())
    rn = sum(rc.values())
    tp = {k: 1000000 * v // tn for k, v in tc.items()}
    rp = {k: 1000000 * v // rn for k, v in rc.items()}
    scores = {
        d: (sum(tp.get(b, 0) - rp[b] for b in bl), len(bl))
        for d, bl in pool.items()
    }
    quant = lambda d: (
        (Decimal(scores[d][0]) / Decimal(scores[d][1])).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        ),
        -d,
    )
    top = sorted(pool, key=lambda d: quant(d), reverse=True)[:50]
    rows = q225_target_affinity_selection(spark, sf_dir).collect()
    assert len(rows) == 50
    for r in rows:
        s, n = scores[r["doc_id"]]
        assert (r["score"], r["n_bigrams"]) == (s, n)
    assert {r["doc_id"] for r in rows} == set(top)


def test_q226_trap_detection_vs_python(spark, sf_dir):
    """Replay URL synthesis + per-(host, template) aggregation; the
    calendar and session templates must be flagged, items must not."""
    from voz_spark.crawlops import q226_crawl_trap_detection
    from voz_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id").collect()
    urls, contents = defaultdict(set), defaultdict(set)
    for r in ev:
        h = f"h{r['user_id'] % 20}"
        c = r["event_id"] % 3
        if c == 0:
            path = "/cal/" + r["ts"].strftime("%Y-%m-%d")
            ck = f"empty-calendar-{r['user_id'] % 20}"
        elif c == 1:
            path = f"/item/{r['event_id'] % 500}"
            ck = f"item-{r['event_id'] % 500}"
        else:
            path = f"/p/view?session={r['event_id']}"
            ck = f"page-{r['user_id'] % 20}"
        tmpl = re.sub(r"[0-9]+", "N", re.sub(r"=[^&]*", "=V", path))
        urls[(h, tmpl)].add(path)
        contents[(h, tmpl)].add(ck)
    rows = {(r["host"], r["template"]): r for r in q226_crawl_trap_detection(spark, sf_dir).collect()}
    assert set(rows) == set(urls)
    for k in urls:
        nu, nc = len(urls[k]), len(contents[k])
        r = rows[k]
        assert (r["n_urls"], r["n_content"], r["wasted_fetches"]) == (nu, nc, nu - nc)
        assert r["is_trap"] == int(nu >= 5 and 1000 * nc <= 200 * nu)
    # the planted semantics: session traps always fire at any sf with
    # enough events; item pages never do
    traps = {k[1] for k, r in rows.items() if r["is_trap"] == 1}
    assert "/p/view?session=V" in traps
    assert "/item/N" not in traps


_NAV = "<a> home </a> <a> about </a> <a> contact </a>"
_AD = "buy now <a> click here today </a>"
_FOOT = "<a> privacy </a> <a> terms </a> copyright"


def test_q227_boilerplate_vs_python(spark, sf_dir):
    """Replay page synthesis + link-density classification; planted
    nav/ad/footer lines must always drop, full 8-word content chunks
    must always survive, and the cleaned-text md5 must match."""
    from voz_spark.corpus_ops import q227_boilerplate_strip
    from voz_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text").collect()
    want = {}
    for d in docs:
        w = re.split(r"\s+", d["text"].strip())
        chunks = [" ".join(w[i * 8 : i * 8 + 8]) for i in range((len(w) + 7) // 8)]
        lines = [_NAV] + chunks[:1] + [_AD] + chunks[1:] + [_FOOT]
        feats = []
        for l in lines:
            toks = [x for x in re.split(r"\s+", l) if x and not x.startswith("<")]
            nl = sum(
                len([x for x in re.split(r"\s+", s.strip()) if x])
                for s in re.findall(r"<a>(.*?)</a>", l)
            )
            feats.append((l, len(toks), nl))
        kept = [f for f in feats if f[1] >= 4 and 1000 * f[2] <= 500 * f[1]]
        clean = " ".join(f[0] for f in kept)
        want[d["doc_id"]] = (
            len(lines),
            len(kept),
            len(lines) - len(kept),
            sum(f[1] for f in kept),
            sum(f[2] for f in feats),
            hashlib.md5(clean.encode()).hexdigest(),
        )
        # planted invariants
        assert all(f not in kept for f in feats if f[0] in (_NAV, _AD, _FOOT))
        for f in feats:
            if f[0] in chunks and f[1] == 8 and f[2] == 0:
                assert f in kept
    rows = {r["doc_id"]: r for r in q227_boilerplate_strip(spark, sf_dir).collect()}
    assert set(rows) == set(want)
    for did, (nl, nk, nd, kw, lw, md) in want.items():
        r = rows[did]
        assert (
            r["n_lines"], r["n_kept"], r["n_dropped"],
            r["kept_words"], r["link_words"], r["clean_md5"],
        ) == (nl, nk, nd, kw, lw, md)
