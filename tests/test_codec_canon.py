"""Unit tests: image codecs (decode/PSNR invariants) and URL
canonicalization (B1 semantics shared by engine + simulator)."""

from __future__ import annotations

import numpy as np
import pytest

from voz_spark import synth
from voz_spark.canon import canonicalize_one, host_of
from voz_spark.codec import png_decode, png_encode, psnr, vqz_decode, vqz_encode, decode_image


def test_png_roundtrip_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_vqz_psnr_above_floor():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    assert psnr(img, vqz_decode(vqz_encode(img))) >= 40.0


def test_psnr_identical_is_inf():
    img = np.zeros((8, 8, 3), np.uint8)
    assert psnr(img, img) == float("inf")


def test_unknown_format_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")


def test_synth_images_decode_and_validate():
    for idx in [0, 1, 17, 255]:
        row = synth.image_row(idx)
        decoded = decode_image(row["bytes"], row["fmt"])
        expected = synth.image_pixels(idx)
        if row["fmt"] == "png":
            assert np.array_equal(decoded, expected)
        else:
            assert psnr(expected, decoded) >= 40.0


@pytest.mark.parametrize(
    "url,base,expect",
    [
        ("HTTPS://VOZ.test/t/Foo.123/", None, "https://voz.test/t/Foo.123/"),
        ("https://voz.test:443/a", None, "https://voz.test/a"),
        ("https://voz.test:8443/a", None, "https://voz.test:8443/a"),
        ("/t/x.9/page-2", "https://voz.test/t/x.9/", "https://voz.test/t/x.9/page-2"),
        ("page-3", "https://voz.test/t/x.9/", "https://voz.test/t/x.9/page-3"),
        ("https://voz.test/a//b///c#frag", None, "https://voz.test/a/b/c"),
        ("https://voz.test", None, "https://voz.test/"),
        ("https://voz.test/a?q=1#f", None, "https://voz.test/a?q=1"),
    ],
)
def test_canonicalize(url, base, expect):
    assert canonicalize_one(url, base) == expect


def test_host_of():
    assert host_of("https://IMG.voz.test/img/1.png") == "img.voz.test"


def test_expand_children_deterministic():
    tid = 1003
    url = synth.thread_url(tid)
    a = synth.expand_children(url, 500)
    b = synth.expand_children(url, 500)
    assert a == b and len(a) > 0
    # header image (slot 0 → post_no 1) duplicated across pages
    pages = [c for c in a if "page-" in c[0]]
    if pages:
        page2 = canonicalize_one(pages[0][0], url)
        imgs_p2 = synth.expand_children(page2, 500)
        header_p1 = [c[0] for c in a if c[2] == 1]
        header_p2 = [c[0] for c in imgs_p2 if c[2] == 1]
        assert header_p1 == header_p2


def test_canon_fast_path_is_fixed_point():
    """Any URL matching the JVM fast-path shape must be a fixed point
    of canonicalize_one — otherwise the fast path would change engine
    semantics."""
    import re

    from voz_spark.frontier import _CANON_FASTPATH_TAIL

    tail_re = re.compile(_CANON_FASTPATH_TAIL)

    def is_fast(url: str) -> bool:
        if not url.startswith("https://"):
            return False
        tail = url[8:]
        return bool(tail_re.match(tail)) and "//" not in tail

    # every synthetic-world URL + adversarial shapes
    cases = [synth.thread_url(synth.thread_id(i)) for i in range(50)]
    cases += [synth.image_url(i) for i in range(200)]
    cases += [
        "https://voz.test/a/b?q=1",
        "https://voz.test/UPPER/Case",
        "https://VOZ.test/x",          # not fast (uppercase host)
        "https://voz.test:8443/x",     # not fast (port)
        "https://voz.test/a//b",       # not fast (double slash)
        "https://voz.test/a#frag",     # not fast (fragment)
        "http://voz.test/x",           # not fast (http scheme prefix check)
    ]
    n_fast = 0
    for u in cases:
        if is_fast(u):
            n_fast += 1
            assert canonicalize_one(u) == u, u
    assert n_fast >= 250  # the synthetic world rides the fast path
