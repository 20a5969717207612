"""Deterministic synthetic crawl world (seed=42, no external data).

Mirrors FIXTURES.md §1-3: a seed list shaped like the reference's
``threads_list.json`` (src/box_crawler.py:147-156), a link graph that
replaces live XenForo HTML (thread → page-N → image URLs, page URL
template at src/thread_crawler.py:163), and an ``images`` table per
BASELINE.json ``input_hint``:

    images(image_id string, bytes binary, w int, h int, fmt string,
           caption string, phash bigint)

Every function here is PURE and shared verbatim by the Spark engine
(inside Arrow-batched UDFs) and the sequential oracle simulator, so
crawl-ordering parity is by construction.

Graph properties exercised on purpose (FIXTURES.md §3):
- duplicate image URLs across pages (slot 0 is the thread's header
  image on every page) → dedup path;
- ~5% of image indexes point past the images table → fetch-failure;
- some image paths live under /blocked/ on the dominant host →
  robots path;
- one dominant image host (~70% of URLs) + 3 minor hosts → skew /
  salting path;
- page URLs alternate absolute/relative → canonicalization path.
"""

from __future__ import annotations

import re

import numpy as np

from voz_spark.codec import png_encode, vqz_encode

BASE = "https://voz.test"
DOMINANT_IMG_HOST = "img.voz.test"
MINOR_IMG_HOSTS = ["cdn0.voz.test", "cdn1.voz.test", "cdn2.voz.test"]

_THREAD_RE = re.compile(r"^https://voz\.test/t/[^/]+\.(\d+)/$")
_PAGE_RE = re.compile(r"^https://voz\.test/t/[^/]+\.(\d+)/page-(\d+)$")
_IMG_RE = re.compile(r"^https://([^/]+)(?:/blocked)?/img/(\d{10})\.(png|vqz)$")

IMAGES_PER_PAGE = 3


def splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public-domain splitmix64 constants)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


# --- seed list -------------------------------------------------------------


def thread_id(seed_rank: int) -> int:
    return 1000 + seed_rank


def thread_url(tid: int) -> str:
    return f"{BASE}/t/build-pc-advice.{tid}/"


def total_pages(tid: int) -> int:
    return 1 + splitmix64(tid) % 8  # 1..8 pages


def seed_rows(n_seeds: int) -> list[dict]:
    # packed-priority bound (frontier._canonicalize): seed_rank < 2^31
    assert n_seeds <= 1 << 31, f"seed_rank must fit 31 bits, got {n_seeds}"
    rows = []
    for r in range(n_seeds):
        tid = thread_id(r)
        s = splitmix64(tid * 3 + 1)
        rows.append(
            {
                "seed_rank": r,
                "thread_id": str(tid),
                "title": f"Tư vấn cấu hình ngân sách {5 + s % 40} triệu #{tid}",
                "url": thread_url(tid),
                "author": f"user{s % 50:03d}",
                "created_date": f"2024-{1 + s % 12:02d}-{1 + s % 28:02d}T10:00:00Z",
                "reply_count": int(s % 300),
                "view_count": int(s % 9000),
                "is_sticky": (s % 33) == 0,
            }
        )
    return rows


# --- link graph ------------------------------------------------------------


def image_index(tid: int, page: int, slot: int, img_space: int) -> int:
    if slot == 0:
        # header image: identical on every page of the thread → guaranteed
        # duplicate URL across pages (dedup test)
        return splitmix64(tid) % img_space
    return splitmix64(tid * 1_000_003 + page * 1009 + slot) % img_space


def image_id(idx: int) -> str:
    return f"img{idx:010d}"


def image_fmt(idx: int) -> str:
    return "png" if idx % 2 == 0 else "vqz"


def image_host(idx: int) -> str:
    h = splitmix64(idx * 7 + 5)
    if h % 10 < 7:
        return DOMINANT_IMG_HOST
    return MINOR_IMG_HOSTS[h % len(MINOR_IMG_HOSTS)]


def image_blocked(idx: int) -> bool:
    """~4% of dominant-host images live under the robots-disallowed
    /blocked/ prefix."""
    return image_host(idx) == DOMINANT_IMG_HOST and idx % 23 == 0


def image_url(idx: int) -> str:
    host = image_host(idx)
    prefix = "/blocked" if image_blocked(idx) else ""
    return f"https://{host}{prefix}/img/{idx:010d}.{image_fmt(idx)}"


def page_child_url(tid: int, n: int) -> str:
    """Absolute for odd page numbers, relative otherwise (B1 test)."""
    if n % 2 == 1:
        return f"{BASE}/t/build-pc-advice.{tid}/page-{n}"
    return f"/t/build-pc-advice.{tid}/page-{n}"


def expand_children(canon_url: str, img_space: int) -> list[tuple[str, int, int]]:
    """Children of a canonical URL: (child_url_maybe_relative, page_no,
    post_no). Thread root (page 1) yields page 2..P plus page-1 images;
    a page yields its images; an image yields nothing.

    Reference semantics: page loop src/thread_crawler.py:161-172, image
    extraction :285-297, next-page discovery src/box_crawler.py:176-186.
    """
    m = _THREAD_RE.match(canon_url)
    if m:
        tid = int(m.group(1))
        out = []
        for n in range(2, total_pages(tid) + 1):
            out.append((page_child_url(tid, n), n, 0))
        for slot in range(IMAGES_PER_PAGE):
            out.append((image_url(image_index(tid, 1, slot, img_space)), 1, slot + 1))
    else:
        m = _PAGE_RE.match(canon_url)
        if not m:
            return []
        tid, n = int(m.group(1)), int(m.group(2))
        out = [
            (image_url(image_index(tid, n, slot, img_space)), n, slot + 1)
            for slot in range(IMAGES_PER_PAGE)
        ]
    # packed-priority bounds (frontier._canonicalize packs page_no and
    # post_no into 14 bits each): a value at 2^14 would silently carry
    # into the neighboring field and corrupt dedup winner selection and
    # crawl order — fail loudly here instead.
    for _, page_no, post_no in out:
        assert page_no < 1 << 14 and post_no < 1 << 14, (
            f"priority bounds exceeded: page={page_no} post={post_no} for {canon_url}"
        )
    return out


def parse_image_url(canon_url: str) -> tuple[str, str] | None:
    """→ (image_id, fmt) if the URL is an image URL, else None."""
    m = _IMG_RE.match(canon_url)
    if not m:
        return None
    return image_id(int(m.group(2))), m.group(3)


def is_fetchable_image(idx: int, n_images: int) -> bool:
    return idx < n_images


# --- images table ----------------------------------------------------------


def image_dims(idx: int) -> tuple[int, int]:
    w = 16 + splitmix64(idx * 2 + 11) % 49
    h = 16 + splitmix64(idx * 2 + 12) % 49
    return int(w), int(h)


def image_pattern_idx(idx: int) -> int:
    """Planted near-duplicates for the perceptual-dedup surface: every
    idx % 7 == 3 image re-renders the *previous* image's pattern at its
    own resolution with its own noise — a rescaled/re-noised copy, the
    thing a content (not URL) dedup must catch."""
    return idx - 1 if idx % 7 == 3 and idx > 0 else idx


def _image_field(pattern_idx: int, w: int, h: int) -> np.ndarray:
    """Smooth per-channel 2-D cosine field (float, (h, w, 3)): real
    low-frequency structure so DCT perceptual hashing is meaningful.
    Parameters depend only on pattern_idx — the same pattern sampled at
    a different (w, h) is the 'same picture at a different size'."""
    yy = (np.arange(h) + 0.5)[:, None] / h
    xx = (np.arange(w) + 0.5)[None, :] / w
    out = np.empty((h, w, 3))
    # dense low-frequency spectrum (like natural images' 1/f falloff):
    # every 8×8 DCT bin gets a random-signed coefficient well above the
    # noise floor, so each perceptual-hash bit is structure-determined
    for c in range(3):
        rng = np.random.default_rng(splitmix64(pattern_idx * 97 + 17 + c) & 0x7FFFFFFF)
        j = np.arange(8)
        amp = 50.0 / (1.0 + j[:, None] + j[None, :])
        coef = amp * rng.choice([-1.0, 1.0], (8, 8)) * rng.uniform(0.6, 1.0, (8, 8))
        coef[0, 0] = 0.0
        cy = np.cos(np.pi * yy * j[None, :])  # (h, 5) DCT-basis-like modes
        cx = np.cos(np.pi * xx.T * j[None, :])  # (w, 5)
        out[..., c] = 128.0 + cy @ coef @ cx.T
    return out


def image_pixels(idx: int) -> np.ndarray:
    w, h = image_dims(idx)
    rng = np.random.default_rng(splitmix64(idx) & 0x7FFFFFFF)
    # low-frequency field + bounded noise: compressible, realistic-ish,
    # and structurally dominant so phash variants stay hamming-close
    field = _image_field(image_pattern_idx(idx), w, h)
    noise = rng.integers(-12, 13, (h, w, 3))
    return np.clip(field + noise, 0, 255).astype(np.uint8)


def image_bytes(idx: int) -> bytes:
    px = image_pixels(idx)
    return png_encode(px) if image_fmt(idx) == "png" else vqz_encode(px)


def image_caption(idx: int) -> str:
    s = splitmix64(idx * 13 + 7)
    return f"Ảnh {image_id(idx)}: cấu hình i{3 + s % 3 * 2} ngân sách {5 + s % 45} triệu"


def image_phash(idx: int) -> int:
    """TRUE 64-bit DCT perceptual hash of the image's pixels (signed
    int64, per the input-table contract) — not a synthetic random id:
    re-deriving it from the decoded bytes must reproduce it (exactly
    for png; within a few bits for the lossy vqz codec)."""
    from voz_spark.phash import phash64

    return phash64(image_pixels(idx))


def image_row(idx: int) -> dict:
    w, h = image_dims(idx)
    return {
        "image_id": image_id(idx),
        "bytes": image_bytes(idx),
        "w": w,
        "h": h,
        "fmt": image_fmt(idx),
        "caption": image_caption(idx),
        "phash": image_phash(idx),
    }


# --- policy tables ---------------------------------------------------------


def robots_rules() -> list[dict]:
    """Synthetic robots.txt knowledge (north_rule new capability; the
    reference evades robots instead — src/browser.py:40-44)."""
    return [
        {"host": DOMINANT_IMG_HOST, "path_prefix": "/blocked/", "allowed": False},
    ]


def budget_from_interval(min_interval_ms: int, round_window_ms: int) -> int:
    """B4 pacing model (reference REQUEST_DELAY + uniform(0,1) per
    fetch, src/browser.py:57-59): one crawl round spans
    `round_window_ms` of wall-clock; a host contacted at most once per
    `min_interval_ms` therefore admits floor(window / interval)
    fetches per round (≥ 1 so no host starves forever)."""
    return max(1, round_window_ms // min_interval_ms)


def host_budgets(default_budget: int, round_window_ms: int = 64_000) -> list[dict]:
    """Per-host politeness table. Each host carries its
    `min_interval_ms` (the reference's per-request delay, generalized
    per host); the per-round fetch budget is DERIVED from it via
    budget_from_interval — not an independent constant — so changing
    the round window rescales every host's budget coherently."""
    rows = [
        {"host": "voz.test", "min_interval_ms": 4000},
        {"host": DOMINANT_IMG_HOST, "min_interval_ms": 1000},
    ] + [{"host": h, "min_interval_ms": 2000} for h in MINOR_IMG_HOSTS]
    for r in rows:
        r["max_fetches_per_round"] = budget_from_interval(
            r["min_interval_ms"], round_window_ms
        )
    return rows


# --- transient fetch failures (A12/B8 retry loop) --------------------------

_TRANSIENT_MULT = 1_000_003
_TRANSIENT_ADD = 17
_TRANSIENT_MOD = 20


def is_transient_fail(idx: int, attempt: int) -> bool:
    """Deterministic 'network flake': ~5% of images fail their FIRST
    fetch attempt and succeed on retry (reference: requests exceptions
    retried max_retries times, src/image_processor.py:56,138-142).
    Pure integer arithmetic so the Spark engine can evaluate the same
    predicate JVM-side (see frontier.transient_fail_col)."""
    return attempt == 0 and (idx * _TRANSIENT_MULT + _TRANSIENT_ADD) % _TRANSIENT_MOD == 0
