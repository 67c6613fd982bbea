"""Property-based tests (hypothesis) for the crawl-engine invariants."""

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from raycrawl.core.codec import (
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
    synth_pixels,
)
from raycrawl.core.sketches import CountingBloomFilter, CuckooFilter, SeenSet
from raycrawl.core.urltools import canonicalize_url, url_sha1

host_st = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z]{2,5}){1,2}", fullmatch=True)
path_st = st.lists(
    st.text(alphabet="abcdefghij0123456789", min_size=1, max_size=6),
    min_size=0, max_size=4,
).map(lambda segs: "/".join(segs))
query_st = st.dictionaries(
    st.text(alphabet="abcxyz", min_size=1, max_size=4),
    st.text(alphabet="0123456789", min_size=0, max_size=4),
    max_size=3,
)


@st.composite
def url_st(draw):
    host = draw(host_st)
    path = draw(path_st)
    q = draw(query_st)
    qs = "&".join(f"{k}={v}" for k, v in q.items())
    frag = draw(st.sampled_from(["", "#frag"]))
    port = draw(st.sampled_from(["", ":80", ":8080"]))
    return f"http://{host}{port}/{path}{'?' + qs if qs else ''}{frag}"


class TestCanonicalizeProperties:
    @given(url_st())
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, url):
        c = canonicalize_url(url)
        assert canonicalize_url(c) == c

    @given(url_st())
    @settings(max_examples=200, deadline=None)
    def test_case_of_host_is_irrelevant(self, url):
        scheme, rest = url.split("://", 1)
        host, _, tail = rest.partition("/")
        upper = f"{scheme}://{host.upper()}/{tail}"
        assert canonicalize_url(url) == canonicalize_url(upper)

    @given(url_st())
    @settings(max_examples=100, deadline=None)
    def test_fragment_is_irrelevant(self, url):
        base = url.split("#", 1)[0]
        assert canonicalize_url(base + "#other") == canonicalize_url(base)

    @given(url_st())
    @settings(max_examples=100, deadline=None)
    def test_sha1_stable(self, url):
        c = canonicalize_url(url)
        assert url_sha1(c) == hashlib.sha1(c.encode()).digest()


class TestSketchProperties:
    @given(st.lists(st.binary(min_size=20, max_size=20), max_size=60, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_bloom_no_false_negatives(self, keys):
        bf = CountingBloomFilter(max(64, len(keys)))
        for k in keys:
            bf.add(k)
        assert all(k in bf for k in keys)

    @given(st.lists(st.binary(min_size=20, max_size=20), max_size=60, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_cuckoo_no_false_negatives_and_delete(self, keys):
        cf = CuckooFilter(max(64, len(keys) * 2))
        inserted = [k for k in keys if cf.add(k)]
        assert all(k in cf for k in inserted)
        for k in inserted:
            assert cf.remove(k)
        assert cf.size == 0

    @given(st.lists(st.binary(min_size=20, max_size=20), min_size=1, max_size=40,
                    unique=True))
    @settings(max_examples=50, deadline=None)
    def test_seen_set_first_occurrence_semantics(self, keys):
        s = SeenSet(max(64, len(keys)))
        assert [s.check_and_add(k) for k in keys] == [False] * len(keys)
        assert [s.check_and_add(k) for k in keys] == [True] * len(keys)
        s2 = SeenSet.restore(s.state(), max(64, len(keys)))
        assert all(k in s2 for k in keys)


class TestCodecProperties:
    @given(st.integers(0, 2**32), st.integers(32, 80), st.integers(32, 80))
    @settings(max_examples=30, deadline=None)
    def test_png_roundtrip_exact(self, seed, w, h):
        px = synth_pixels(seed, w, h)
        out, fmt = decode_image(encode_image(px, "png"))
        assert fmt == "png" and np.array_equal(out, px)

    @given(st.integers(0, 2**32), st.integers(32, 80), st.integers(32, 80))
    @settings(max_examples=30, deadline=None)
    def test_jpeg_psnr_and_phash_stability(self, seed, w, h):
        px = synth_pixels(seed, w, h)
        out, fmt = decode_image(encode_image(px, "jpeg"))
        assert fmt == "jpeg"
        assert psnr(px, out) >= 40.0
        # phash bits near the median threshold can flip under quantization
        # (inherent to pHash) — the decoded-pixel hash stays CLOSE to the
        # original's, and is itself deterministic (the invariant the gate
        # relies on: oracle and engine both hash DECODED pixels)
        assert hamming64(phash64(px), phash64(out)) <= 10
        out2, _ = decode_image(encode_image(px, "jpeg"))
        assert phash64(out2) == phash64(out)


VOCAB = ["join", "scan", "agg", "key", "row", "fast", "slow", "table"]
docs_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=20),
    min_size=1, max_size=8,
)


class TestSimhashProperties:
    """The vectorized batch simhash (dedup.simhash_batch) vs a naive
    per-doc reference, plus its algebraic invariants."""

    @staticmethod
    def _naive(tokens: list[str]) -> int:
        from raycrawl.ops.dedup import simhash_token_hash

        ones = [0] * 64
        for tok in tokens:
            h = simhash_token_hash(tok)
            for i in range(64):
                ones[i] += (h >> i) & 1
        hu = 0
        for i in range(64):
            if 2 * ones[i] > len(tokens):
                hu |= 1 << i
        return hu - (1 << 64) if hu >= (1 << 63) else hu

    @given(docs_st)
    @settings(max_examples=50, deadline=None)
    def test_vectorized_matches_naive(self, docs):
        from raycrawl.ops.dedup import simhash_batch

        df = pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(d) for d in docs]}
        )
        got = simhash_batch(df)["simhash"].tolist()
        assert got == [self._naive(d) for d in docs]

    @given(st.lists(st.sampled_from(VOCAB), min_size=1, max_size=20),
           st.randoms())
    @settings(max_examples=50, deadline=None)
    def test_invariant_to_token_order(self, tokens, rnd):
        from raycrawl.ops.dedup import simhash_batch

        shuffled = list(tokens)
        rnd.shuffle(shuffled)
        df = pd.DataFrame(
            {"doc_id": [0, 1],
             "text": [" ".join(tokens), " ".join(shuffled)]}
        )
        a, b = simhash_batch(df)["simhash"]
        assert a == b


class TestMinhashProperties:
    @given(st.sets(st.integers(0, 2**61 - 2), min_size=1, max_size=40),
           st.sets(st.integers(0, 2**61 - 2), min_size=1, max_size=40))
    @settings(max_examples=50, deadline=None)
    def test_signature_of_union_is_elementwise_min(self, sa, sb):
        """MinHash's defining algebra: sig(A ∪ B) == min(sig(A), sig(B))
        element-wise — what makes signatures mergeable across partitions."""
        from raycrawl.ops.dedup import MinHasher

        mh = MinHasher()
        su = mh.signature(sa | sb)
        assert np.array_equal(
            su, np.minimum(mh.signature(sa), mh.signature(sb))
        )
