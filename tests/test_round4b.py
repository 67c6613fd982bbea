"""Round-4 decode-hot-path canonicalization fast paths — exact equivalence.

The crawl decode stage spends its per-link budget in
``canonicalize_url(raw, base) + url_sha1 + host_of`` (three urlsplit chains
per outlink).  ``canonical_and_host`` (``raycrawl/core/urltools.py``)
replaces the composition with two string-only fast paths — ``_fast_canonical``
(the URL is provably already canonical) and ``_light_canonical`` (the common
messy shapes: uppercase host, default port, ``.``/``..``/``//`` segments,
empty query, fragment) — falling through to the original urllib path for
anything outside the proven shapes.  These tests pin EXACT equivalence with
the slow path (same canonical string, same host, same raised exception) over
curated edge cases and hypothesis-generated corpora, plus the
base-independence predicate that gates the per-batch memo in
``crawler.py::decode_submit``.

Reference analog: the location-normalization dictionary pass
(``Cansin_Location_Detection.py:122-193``) — same "normalize before keying"
contract, here required to be bit-identical between two implementations.
"""

from hypothesis import given, settings, strategies as st

from raycrawl.core.urltools import (
    _fast_canonical,
    _light_canonical,
    canonical_and_host,
    canonicalize_url,
    host_of,
    host_of_canonical,
    is_base_independent,
    url_sha1,
)


def _slow(url, base=None):
    cu = canonicalize_url(url, base=base)
    return cu, host_of(cu)


def _both(url, base=None):
    """Run fast and slow composition; normalize exceptions for comparison."""
    try:
        fast = ("ok",) + canonical_and_host(url, base=base)
    except Exception as e:  # noqa: BLE001 — parity includes the error type
        fast = ("err", type(e).__name__)
    try:
        slow = ("ok",) + _slow(url, base=base)
    except Exception as e:  # noqa: BLE001
        slow = ("err", type(e).__name__)
    return fast, slow


BASES = (
    None,
    "http://base.example/dir/page",
    "https://other.example/",
    "http://base.example/dir/",
)

EDGE_URLS = [
    # already-canonical (the _fast_canonical shape)
    "http://h3.web.test/p/7",
    "https://example.com/a/b-c_d.e~f",
    "http://example.com/",
    # host-only / trailing slash / duplicate slashes
    "http://example.com",
    "http://example.com/a/",
    "http://example.com//a///b",
    # case + default/explicit/zero-padded ports
    "HTTP://EXAMPLE.COM/A",
    "http://Example.Com:80/a",
    "https://example.com:443/a",
    "http://example.com:0080/a",
    "http://example.com:8080/a",
    "http://example.com:0/a",
    "http://example.com:/a",
    "http://example.com:99999/a",  # urlsplit raises → parity on the raise
    # dot segments, incl. popping above root and dotted-but-not-dot segments
    "http://example.com/a/./b",
    "http://example.com/a/../b",
    "http://example.com/../a",
    "http://example.com/a/..",
    "http://example.com/a/.",
    "http://example.com/...",
    "http://example.com/..a",
    "http://example.com/.hidden",
    # query / fragment shapes
    "http://example.com/a?",
    "http://example.com/a?#frag",
    "http://example.com/a#b?c",
    "http://example.com/a#b#c",
    "http://example.com/a?z=2&a=1",
    "http://example.com/a?utm_source=x&b=1",
    "http://example.com/a?&",
    "http://example.com?",
    # userinfo / IPv6 / odd netlocs → slow path, still equivalent
    "http://user@example.com/a",
    "http://user:pw@example.com:8080/a",
    "http://[::1]/a",
    "http://[::1]:8080/a",
    "http://::1/a",
    "http://example.com./a",
    "http://-a-/a",
    "http://exa_mple.com/a",
    # empty-netloc absolutes (base-DEPENDENT through urljoin)
    "http:///x",
    "http://",
    "http://#f",
    "http://?q",
    # percent-encoding preserved verbatim, unicode path, ':'/'@' in path
    "http://example.com/a%2Fb",
    "http://example.com/a%2fb",
    "http://example.com/café/ü",
    "http://example.com/a:b",
    "http://example.com/a@b",
    # whitespace / control chars (urlsplit strips \t\r\n; strip() the ends)
    "  http://example.com/a  ",
    "http://example.com/a\tb",
    "http://exam\nple.com/a",
    "http://example.com/a b",
    # relative forms joined against base
    "/rooted/path",
    "sibling",
    "../up",
    "//proto.relative/x",
    "?q=1",
    "#frag",
    "",
    # non-http schemes
    "ftp://example.com/a",
    "mailto:x@example.com",
    "HTTPS://example.com/a",
]


def test_canonical_and_host_edge_corpus():
    for url in EDGE_URLS:
        for base in BASES:
            fast, slow = _both(url, base)
            assert fast == slow, (url, base, fast, slow)


def test_fast_paths_cover_the_synthetic_messy_corpus():
    """Every spelling ``webgraph._messy`` emits must hit a string-only path —
    the perf contract: the synthetic crawl's decode loop never pays urllib."""
    import numpy as np

    from raycrawl.core.webgraph import _messy

    rng = np.random.default_rng(7)
    for i in range(200):
        u = _messy(f"http://h{i % 9}.web.test/p/{i}", rng)
        assert _fast_canonical(u) or _light_canonical(u), u


_HOSTS = st.one_of(
    st.from_regex(r"[a-z0-9]([a-z0-9.\-]{0,12}[a-z0-9])?", fullmatch=True),
    st.from_regex(r"[A-Za-z0-9.\-]{1,16}", fullmatch=True),
    st.just("h0.web.test"),
)
_SEGS = st.lists(
    st.one_of(
        st.from_regex(r"[A-Za-z0-9_.\-~%]{1,8}", fullmatch=True),
        st.sampled_from([".", "..", "...", "a b", "a@b", "[x]", "café", ""]),
    ),
    max_size=5,
)
_PORT = st.one_of(st.none(), st.integers(0, 70000).map(str), st.just("080"))
_QUERY = st.one_of(
    st.none(),
    st.just(""),
    st.from_regex(r"[a-z]=[0-9](&[a-z]=[0-9]){0,2}", fullmatch=True),
    st.just("utm_source=x&b=1"),
)
_FRAG = st.one_of(st.none(), st.just(""), st.just("frag"), st.just("b?c"))


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "ftp"]))
    host = draw(_HOSTS)
    port = draw(_PORT)
    path = "/".join(draw(_SEGS))
    lead = draw(st.sampled_from(["/", "", "//"]))
    url = f"{scheme}://{host}"
    if port is not None:
        url += f":{port}"
    url += lead + path
    q = draw(_QUERY)
    if q is not None:
        url += "?" + q
    f = draw(_FRAG)
    if f is not None:
        url += "#" + f
    return url


@settings(max_examples=400, deadline=None)
@given(url=_urls(), base=st.sampled_from(BASES))
def test_canonical_and_host_equivalence_structured(url, base):
    fast, slow = _both(url, base)
    assert fast == slow, (url, base, fast, slow)


@settings(max_examples=300, deadline=None)
@given(
    raw=st.text(
        alphabet="abXZ019.-_~/:?#@[]%&= \té",
        max_size=24,
    ),
    prefix=st.sampled_from(["", "http://", "https://", "http://e.com"]),
    base=st.sampled_from(BASES),
)
def test_canonical_and_host_equivalence_rawtext(raw, prefix, base):
    fast, slow = _both(prefix + raw, base)
    assert fast == slow, (prefix + raw, base, fast, slow)


@settings(max_examples=200, deadline=None)
@given(url=_urls())
def test_host_of_canonical_matches_host_of(url):
    try:
        cu = canonicalize_url(url)
    except ValueError:
        return  # out-of-range port; nothing canonical to compare
    assert host_of_canonical(cu) == host_of(cu), cu


@settings(max_examples=200, deadline=None)
@given(url=_urls())
def test_base_independence_predicate(url):
    """When the predicate says True, the canonical form must be identical
    under EVERY base (this is what licenses the cross-page decode memo)."""
    if not is_base_independent(url):
        return
    try:
        ref = canonicalize_url(url, base=None)
    except ValueError:
        ref = ValueError
    for base in BASES[1:]:
        try:
            got = canonicalize_url(url, base=base)
        except ValueError:
            got = ValueError
        assert got == ref, (url, base, got, ref)


def test_base_dependent_absolutes_are_flagged():
    # empty netloc: urljoin grafts the base netloc (or keeps "" across
    # schemes) — these MUST NOT enter the decode memo
    for u in ("http:///x", "http://", "https:///a/b", "http://#f",
              "http://?q", "http://\t/x", "http://\ne.com/x"):
        assert not is_base_independent(u), u
        if u == "http:///x":
            assert canonicalize_url(u, base="http://a.example/") != \
                canonicalize_url(u, base="http://b.example/")
    for u in ("http://e.com", "http://e.com/x", "https://E.COM:443/a?b=1"):
        assert is_base_independent(u), u


def test_sha1_key_stability_through_fast_path():
    """The seen-set digest must be identical whichever path produced the
    canonical string (fast, light, slow)."""
    for url in EDGE_URLS:
        for base in BASES:
            try:
                cu_fast, _ = canonical_and_host(url, base=base)
                cu_slow = canonicalize_url(url, base=base)
            except ValueError:
                continue
            assert url_sha1(cu_fast) == url_sha1(cu_slow)


def test_region_map_centers_oracle(ray_session):
    """Geo map-center analog (pages/User Based Dashboard.py:356-375): the
    per-region mean of the nation-derived detected-location coordinates
    must equal the SQL replay exactly — coordinates are exact binary
    quarters, so the float means are order-independent."""
    import pandas as pd

    from tests.oracle_utils import norm, oracle, run_query

    got = norm(run_query("region_map_centers", "/root/testdata/sf0.001"))
    want = norm(oracle("region_map_centers", "/root/testdata/sf0.001"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got.columns) == {"r_name", "mean_lat", "mean_lon", "n"}
    assert (got["mean_lat"].abs() <= 60).all()
    assert (got["mean_lon"].abs() <= 180).all()
