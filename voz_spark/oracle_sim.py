"""Pure-Python sequential reference simulator (SURVEY §5.2 item 1).

Reimplements the reference walker's semantics exactly — seed order
(src/main.py:207), page loop (src/thread_crawler.py:161-172), limit
(src/box_crawler.py:84-87), sticky filter (:64-69), cache-skip dedup
(src/thread_crawler.py:46-59), per-host politeness budget
(src/browser.py:57-59 generalized to budget-per-round), robots (new
per north_rule), min-size gate (src/image_processor.py:87-90) — over
the same deterministic synthetic world (voz_spark.synth) the Spark
engine crawls.

It shares `canonicalize_one` and every synth.* function with the
engine, so any ordering/seen-set divergence the tests catch is a real
distributed-semantics bug, never fixture drift.

No Spark, no numpy state — plain dicts/lists, the de-facto "what the
sequential reference would have done".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from voz_spark import synth
from voz_spark.canon import canonicalize_one, host_of
from voz_spark.config import DEFAULT, CrawlConfig
from voz_spark.rounds import img_space_for


@dataclass
class SimState:
    schedule: list[tuple[int, str]] = field(default_factory=list)  # (round, canon)
    results: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    rounds: int = 0


def _robots_blocked(canon: str, rules: list[dict]) -> bool:
    host = host_of(canon)
    path = "/" + canon.split("/", 3)[3] if canon.count("/") >= 3 else "/"
    for r in rules:
        if not r["allowed"] and r["host"] == host and path.startswith(r["path_prefix"]):
            return True
    return False


def simulate(
    n_seeds: int = 30,
    n_images: int = 2000,
    thread_limit: int | None = None,
    include_sticky: bool = False,
    cfg: CrawlConfig = DEFAULT,
    max_rounds: int | None = None,
) -> SimState:
    img_space = img_space_for(n_images)
    rules = synth.robots_rules()
    budgets = {
        r["host"]: r["max_fetches_per_round"]
        for r in synth.host_budgets(cfg.default_host_budget, cfg.round_window_ms)
    }

    seeds = synth.seed_rows(n_seeds)
    if not include_sticky:
        seeds = [s for s in seeds if not s["is_sticky"]]
    if thread_limit is not None:
        seeds = seeds[:thread_limit]

    # frontier rows: (url, base, seed_rank, page_no, post_no, attempt)
    frontier = [(s["url"], None, s["seed_rank"], 0, 0, 0) for s in seeds]
    st = SimState()
    round_id = 0

    while frontier and (max_rounds is None or round_id < max_rounds):
        round_id += 1
        # canonicalize + in-batch dedup keeping best priority
        best: dict[str, tuple] = {}
        for url, base, rank, page, post, att in frontier:
            canon = canonicalize_one(url, base)
            key = (rank, page, post, att)
            if canon not in best or key < best[canon][:4]:
                best[canon] = (rank, page, post, att, canon)
        # dedup against seen
        new = [v for c, v in best.items() if c not in st.seen]
        # robots split
        blocked = [v for v in new if _robots_blocked(v[4], rules)]
        allowed = [v for v in new if not _robots_blocked(v[4], rules)]
        # per-host budget scheduling in priority order
        by_host: dict[str, list[tuple]] = {}
        for v in allowed:
            by_host.setdefault(host_of(v[4]), []).append(v)
        scheduled, pending = [], []
        for host, items in by_host.items():
            items.sort(key=lambda v: (v[0], v[1], v[2], v[4]))
            b = budgets.get(host, cfg.default_host_budget)
            scheduled.extend(items[:b])
            pending.extend(items[b:])
        # fetch in global priority order (the crawl-order invariant)
        scheduled.sort(key=lambda v: (v[0], v[1], v[2], v[4]))
        next_frontier = [(v[4], None, v[0], v[1], v[2], v[3]) for v in pending]
        retried: set[str] = set()
        for rank, page, post, att, canon in scheduled:
            st.schedule.append((round_id, canon))
            parsed = synth.parse_image_url(canon)
            if parsed is None:
                children = synth.expand_children(canon, img_space)
                for child, page_no, post_no in children:
                    next_frontier.append((child, canon, rank, page_no, post_no, 0))
                st.results.append(
                    {
                        "round_id": round_id,
                        "canon_url": canon,
                        "status": "ok",
                        "kind": "thread" if page == 0 else "page",
                        "n_children": len(children),
                    }
                )
            else:
                img_id, _fmt = parsed
                idx = int(img_id[3:])
                # B8: transient network flake precedes everything (the
                # request itself fails — no 404/size information exists)
                if synth.is_transient_fail(idx, att):
                    status = "fetch_error"
                elif not synth.is_fetchable_image(idx, n_images):
                    status = "missing"
                else:
                    w, h = synth.image_dims(idx)
                    status = "gated" if (w < cfg.min_image_dim or h < cfg.min_image_dim) else "ok"
                # A12/B8 retry loop: failed fetches re-enter the next
                # round's frontier with attempt+1 and stay OUT of seen
                # until success or permanent failure
                if status in ("fetch_error", "missing") and att + 1 < cfg.max_retries:
                    next_frontier.append((canon, None, rank, page, post, att + 1))
                    retried.add(canon)
                st.results.append(
                    {
                        "round_id": round_id,
                        "canon_url": canon,
                        "status": status,
                        "kind": "image",
                        "n_children": 0,
                    }
                )
        for rank, page, post, att, canon in blocked:
            st.results.append(
                {
                    "round_id": round_id,
                    "canon_url": canon,
                    "status": "robots",
                    "kind": "image",
                    "n_children": 0,
                }
            )
        st.seen.update(v[4] for v in scheduled if v[4] not in retried)
        st.seen.update(v[4] for v in blocked)
        frontier = next_frontier

    st.rounds = round_id
    return st
