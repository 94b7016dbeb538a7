"""Property-based robustness tests (hypothesis): at 100 TB every
malformed input that CAN occur WILL occur, and the extraction stage's
contract is that a bad document degrades to a flagged row — which only
holds if the kernel primitives never crash the Python worker outright
on garbage. These run the hot kernel entry points over adversarial
inputs; the invariants are "no exception, sane output type".
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])


@SETTINGS
@given(st.text(max_size=400))
def test_parse_and_serialize_never_raise(html):
    from fundus_spark.kernel import parse_html
    from fundus_spark.kernel.transform import serialize_html, serialize_xml

    doc = parse_html(html)
    assert doc.tag == "html"
    serialize_html(doc)
    serialize_xml(doc)


@SETTINGS
@given(st.text(max_size=400))
def test_fragment_never_raises(fragment):
    from fundus_spark.kernel.transform import _fragment

    el = _fragment(fragment)
    assert el is None or hasattr(el, "tag")


@SETTINGS
@given(st.text(max_size=300))
def test_normalize_whitespace_idempotent(text):
    from fundus_spark.kernel.text import normalize_whitespace

    once = normalize_whitespace(text)
    assert normalize_whitespace(once) == once


@SETTINGS
@given(st.text(max_size=300))
def test_heuristic_language_contract(text):
    from fundus_spark.kernel.lang import heuristic_language

    lang = heuristic_language(text)
    assert lang is None or (isinstance(lang, str) and 2 <= len(lang) <= 3)


@SETTINGS
@given(st.text(max_size=200))
def test_date_parsing_contract(value):
    """Reference-faithful contract (utility.py:590-600): dateutil may
    raise ParserError/OverflowError on garbage — the per-attribute
    suppress handler catches those — but never anything outside the
    stage's catchable family, and successes are datetimes."""
    import datetime

    from fundus_spark.kernel.generics import generic_date_parsing

    try:
        got = generic_date_parsing(value)
    except Exception as err:  # noqa: BLE001 — asserting the family
        assert isinstance(err, (ValueError, OverflowError, TypeError)), err
        return
    assert got is None or isinstance(got, datetime.datetime)


@SETTINGS
@given(st.binary(max_size=300))
def test_media_header_never_raises(payload):
    from fundus_spark.kernel.media import parse_media_header

    header = parse_media_header(payload)
    assert header is None or header.format in ("bmp", "png", "gif", "wav", "avi", "jpeg")


@SETTINGS
@given(st.binary(max_size=300))
def test_media_pixel_decode_never_raises(payload):
    """Round-4 real decoders: adversarial bytes (with and without
    plausible magic) must yield rows/samples or None, never a worker
    crash."""
    from fundus_spark.kernel.media import decode_image_luma, decode_wav_samples

    from fundus_spark.kernel.media import decode_avi_frames

    for p in (
        payload,
        b"BM" + payload,
        b"\x89PNG\r\n\x1a\n" + payload,
        b"RIFF" + payload[:4] + b"WAVE" + payload,
        b"RIFF" + payload[:4] + b"AVI " + payload,
        b"\xff\xd8" + payload,
        b"GIF89a" + payload,
    ):
        rows = decode_image_luma(p)
        assert rows is None or all(isinstance(v, int) for r in rows for v in r)
        samples = decode_wav_samples(p)
        assert samples is None or isinstance(samples, list)
        frames = decode_avi_frames(p)
        assert frames is None or isinstance(frames, list)


@SETTINGS
@given(st.text(max_size=300), st.text(max_size=80))
def test_robots_never_raises(robots_txt, path):
    from fundus_spark.kernel.robots import RobotsMatcher

    m = RobotsMatcher(robots_txt)
    allowed = m.can_fetch("AnyBot", "https://x.example/" + path)
    assert isinstance(allowed, bool)
    delay = m.crawl_delay("AnyBot")
    assert delay is None or isinstance(delay, float)


@SETTINGS
@given(st.binary(max_size=400))
def test_pdf_extract_never_raises(payload):
    from fundus_spark.kernel.pdf import extract_pdf_text

    got = extract_pdf_text(payload)
    assert got is None or isinstance(got, str)


@SETTINGS
@given(st.text(max_size=400))
def test_full_extraction_generic_rule_degrades(html):
    """The whole kernel path the Arrow stage runs per row: with
    error_handling='suppress' a garbage document must yield a dict,
    never an exception."""
    from fundus_spark.kernel import run_extraction
    from fundus_spark.rules import resolve

    out = run_extraction(resolve(None), html, None, error_handling="suppress", failures=[])
    assert isinstance(out, dict)


@SETTINGS
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=10**6),
    st.sampled_from([(1, 1), (2, 2), (2, 1)]),
    st.booleans(),
)
def test_jpeg_block_constant_round_trip_property(w, h, seed, subsampling, gray):
    """Any dimensions x seed x sampling x colorspace: block-constant
    JPEG content round-trips bit-exactly (the oracle contract holds
    across the whole parameter space, not just the fixture sizes)."""
    from fundus_spark.kernel.jpeg import build_jpeg, decode_jpeg_luma

    got = decode_jpeg_luma(build_jpeg(w, h, seed=seed, gray=gray, subsampling=subsampling))
    want = [[(seed + 3 * (x // 8) + 7 * (y // 8)) % 256 for x in range(w)] for y in range(h)]
    assert got == want


@SETTINGS
@given(st.binary(max_size=300), st.integers(min_value=0, max_value=240))
def test_jpeg_decoder_never_raises_on_spliced_bytes(payload, cut):
    """Adversarial fuzz with a REAL prefix: splice random bytes into a
    valid stream at an arbitrary point — decode must return a grid or
    None, never raise (the shape a crawl's half-fetched JPEGs take)."""
    from fundus_spark.kernel.jpeg import build_jpeg, decode_jpeg_luma, parse_jpeg_header

    for good in (
        build_jpeg(16, 12, seed=3),
        build_jpeg(16, 12, seed=3, progressive=True, successive=True),
    ):
        spliced = good[: min(cut, len(good))] + payload
        res = decode_jpeg_luma(spliced)
        assert res is None or all(isinstance(v, int) for r in res for v in r)
        parse_jpeg_header(spliced)  # must not raise either
