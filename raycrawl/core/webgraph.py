"""Deterministic synthetic web: pages, outlinks, images, captions.

The reference fetches from the Twitter API (``pages/Crawler.py:76-87``); in
this sandbox (and in the reference's own spirit — ``predict_age`` derives
its randomness from content bytes, ``Postprocess_scripts/Functions.py:47-49``)
the fetch is a PURE FUNCTION of the canonical URL: given the same
``WebConfig``, every crawler (sequential oracle or Ray engine, any
parallelism) observes the identical web. Pages carry an image + caption
payload matching ``BASELINE.json.input_hint``:

    (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
     caption:string, phash:int64)

Outlinks are emitted in deliberately MESSY form (uppercase hosts, default
ports, ``./`` segments, unsorted query params, fragments) so the
canonicalizer is actually exercised; near-duplicate images are injected
(page i with i % neardup_every == 1 reuses page i-1's pixels plus ±1 noise)
so the phash gate fires on real data.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from .codec import synth_pixels, encode_image, phash64
from .urltools import canonicalize_url, url_sha1


@dataclass(frozen=True)
class WebConfig:
    n_hosts: int = 8
    pages_per_host: int = 50
    seed: int = 42
    max_outlinks: int = 6
    neardup_every: int = 7
    private_frac: float = 0.15
    min_dim: int = 32
    max_dim: int = 64
    # when True, every host's page 2 clones host 0's page 2 pixels (+noise):
    # CROSS-host near-duplicates, detectable only by the global phash tier
    cross_host_dup: bool = False
    # when True, every trap_every-th page also links to a calendar-loop
    # spelling of ITSELF one level deeper (`cal/2024/cal/2024/.../p/i`):
    # a synthetic spider trap — infinitely many URLs, same content. The
    # trap URL canonicalizes to a DISTINCT url (new digest) but _parse
    # resolves it to the same (host, page), so an unfiltered crawl keeps
    # fetching ever-deeper spellings until max_epochs; the frontier's
    # trap_filter gate (urltools.trap_reason) is what stops it.
    trap_links: bool = False
    trap_every: int = 5
    # when >0, every redirect_every-th page (i % redirect_every == 2) also
    # links to a 301 ALIAS spelling `http://hK/r/J` of page J on the same
    # host. Fetching the alias costs a politeness token and returns NO
    # payload/outlinks — only `redirect_to`, the target's canonical URL.
    # The crawler must follow the target through the normal enqueue path
    # at the SAME depth (redirects do not deepen the crawl).
    redirect_every: int = 0
    # crawl GENERATION counter for recrawl scenarios: ~1/3 of public pages
    # (a stable, seed-derived property of (host, page)) are VOLATILE —
    # their content (pixels, caption, outlinks) is re-derived per
    # content_epoch, modeling pages that change between crawls. 0 (the
    # default) is byte-identical to the pre-feature universe; stable pages
    # never change. Volatility mixes into the page seed itself, so
    # near-dup clone pages track their base page's current content.
    content_epoch: int = 0


def host_name(k: int) -> str:
    return f"h{k}.web.test"


def page_url(k: int, i: int, private: bool = False) -> str:
    p = "private/p" if private else "p"
    return f"http://{host_name(k)}/{p}/{i}"


def seed_urls(cfg: WebConfig, n_seeds: int | None = None) -> list[str]:
    n = min(n_seeds or cfg.n_hosts, cfg.n_hosts)
    return [page_url(k, 0) for k in range(n)]


def priority_of(digest: bytes) -> int:
    """Crawl priority is a pure function of the canonical URL (0..9)."""
    return digest[2] % 10


def fetch_fails(digest: bytes) -> bool:
    """Deterministic synthetic PERMANENT fetch failure (~7.7% of URLs) —
    models 4xx pages. A failed fetch consumes its politeness token, emits
    no payload and no outlinks, and is dead-lettered (``fetch_error``)."""
    return digest[4] % 13 == 0


def fetch_transient_fails(digest: bytes, attempt: int) -> bool:
    """Deterministic TRANSIENT failure (~9% of URLs): the first attempt
    times out, the retry succeeds — models 5xx/timeouts. Retries happen
    inside the fetch task within ``retry_budget``; they are invisible to
    crawl ordering (the URL still succeeds in its epoch)."""
    return digest[5] % 11 == 0 and attempt == 0


def _parse(canonical_url: str) -> tuple[int, int, bool, bool]:
    """canonical URL → (host_idx, page_idx, private, alias)."""
    rest = canonical_url.split("://", 1)[1]
    host, path = rest.split("/", 1)
    k = int(host.split(".")[0][1:])
    private = path.startswith("private/")
    alias = path.startswith("r/")
    i = int(path.rsplit("/", 1)[1])
    return k, i, private, alias


def _page_seed(cfg: WebConfig, k: int, i: int, private: bool) -> int:
    d = hashlib.sha1(f"{cfg.seed}:{k}:{i}:{int(private)}".encode()).digest()
    s = int.from_bytes(d[:8], "big")
    if cfg.content_epoch and not private and page_is_volatile(cfg, k, i):
        # golden-ratio odd constant: distinct generation → distinct seed
        s = (s + cfg.content_epoch * 0x9E3779B97F4A7C15) % (1 << 64)
    return s


def page_is_volatile(cfg: WebConfig, k: int, i: int) -> bool:
    """Stable per-(host, page) property (independent of content_epoch):
    does this page's content change between crawl generations?"""
    d = hashlib.sha1(f"{cfg.seed}:{k}:{i}:0".encode()).digest()
    return d[9] % 3 == 0


_WORDS = (
    "amber basalt cedar delta ember flint grove harbor iris juniper "
    "krill lumen moss nectar onyx prism quartz reef sable tundra"
).split()


@dataclass
class Page:
    url: str
    host: str
    image_id: str
    w: int
    h: int
    fmt: str
    data: bytes
    caption: str
    outlinks: list[str]
    pixels: np.ndarray
    # 301 alias pages carry ONLY this: the target's canonical URL
    redirect_to: str | None = None
    # sitemap manifests: outlinks hold the page list; fetched like a page
    # (token, seen entry, fetch_fails apply) but no payload, and the crawl
    # offers the entries at the SITEMAP'S OWN depth (seed semantics)
    sitemap: bool = False
    _phash: int | None = field(default=None, repr=False)

    @property
    def phash(self) -> int:
        """64-bit perceptual hash of the decoded pixels, computed lazily.

        The fetch stage never reads this — the crawl's near-dup gate hashes
        what ``DecodePhash`` decodes from the stored bytes, matching a real
        crawler where the wire payload, not the origin's pixels, is ground
        truth. Computing it eagerly in ``page_for`` charged every synthetic
        fetch a DCT it threw away (~28% of fetch-stage time); only tests
        and oracles read it, so it is computed on first access."""
        if self._phash is None:
            self._phash = 0 if self.pixels is None else phash64(self.pixels)
        return self._phash


def _messy(url: str, rng: np.random.Generator) -> str:
    """Emit a messy spelling of ``url`` that canonicalizes back to it."""
    style = int(rng.integers(0, 5))
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if style == 1:
        return f"{scheme}://{host.upper()}/{path}"
    if style == 2:
        return f"{scheme}://{host}:80/./{path}#frag"
    if style == 3:
        return f"{scheme}://{host}//{path}?"
    if style == 4:
        parent = path.rsplit("/", 1)[0]
        leaf = path.rsplit("/", 1)[1]
        return f"{scheme}://{host}/{parent}/x/../{leaf}"
    return url


def sitemap_url(k: int) -> str:
    return f"http://{host_name(k)}/sitemap"


def page_for(cfg: WebConfig, canonical_url: str) -> Page:
    """The synthetic fetch: canonical URL → full page. Deterministic."""
    rest = canonical_url.split("://", 1)[1]
    if "/" in rest and rest.split("/", 1)[1] == "sitemap":
        # sitemap manifest: the host's full page list, no payload. Only
        # reachable via explicit seeds (no page links to /sitemap), so
        # every existing universe is byte-identical.
        k = int(rest.split("/", 1)[0].split(".")[0][1:])
        return Page(
            url=canonical_url, host=host_name(k), image_id=None,
            w=0, h=0, fmt=None, data=None, caption=None,
            outlinks=[page_url(k, i) for i in range(cfg.pages_per_host)],
            pixels=None, sitemap=True,
        )
    k, i, private, alias = _parse(canonical_url)
    if alias:
        # 301 redirect page: no payload, no outlinks — just the target.
        # The alias is a real URL (token spent, seen-set entry, fetch_fails
        # rules apply upstream); only the response differs.
        return Page(
            url=canonical_url, host=host_name(k), image_id=None,
            w=0, h=0, fmt=None, data=None, caption=None,
            outlinks=[], pixels=None, redirect_to=page_url(k, i),
        )
    digest = url_sha1(canonical_url)
    # trap spellings (cal/2024/... prefixes) are DISTINCT pages with their
    # own content — each level deeper reseeds, so the phash near-dup gate
    # cannot stop the trap; only the frontier's trap_filter can (pairs is
    # 0 for every ordinary URL, leaving existing universes byte-identical)
    pairs = canonical_url.split("://", 1)[1].split("/", 1)[1].count("cal/2024/")
    ps = _page_seed(cfg, k, i, private) + pairs
    rng = np.random.Generator(np.random.PCG64(ps))

    # --- image: near-dup pages clone the previous page's pixels + noise
    is_xhost_dup = cfg.cross_host_dup and (not private) and i == 2 and k > 0
    is_neardup = (not private) and i % cfg.neardup_every == 1 and i > 0
    if is_xhost_dup:
        base_rng = np.random.Generator(np.random.PCG64(_page_seed(cfg, 0, 2, False)))
        w = int(base_rng.integers(cfg.min_dim, cfg.max_dim + 1))
        h = int(base_rng.integers(cfg.min_dim, cfg.max_dim + 1))
        fmt = "jpeg" if base_rng.integers(0, 2) else "png"
        px = synth_pixels(_page_seed(cfg, 0, 2, False), w, h).astype(np.int16)
        noise = rng.integers(-1, 2, px.shape)
        pixels = np.clip(px + noise, 0, 255).astype(np.uint8)
    elif is_neardup:
        base_rng = np.random.Generator(np.random.PCG64(_page_seed(cfg, k, i - 1, False)))
        w = int(base_rng.integers(cfg.min_dim, cfg.max_dim + 1))
        h = int(base_rng.integers(cfg.min_dim, cfg.max_dim + 1))
        fmt = "jpeg" if base_rng.integers(0, 2) else "png"
        px = synth_pixels(_page_seed(cfg, k, i - 1, False), w, h).astype(np.int16)
        noise = rng.integers(-1, 2, px.shape)
        pixels = np.clip(px + noise, 0, 255).astype(np.uint8)
    else:
        w = int(rng.integers(cfg.min_dim, cfg.max_dim + 1))
        h = int(rng.integers(cfg.min_dim, cfg.max_dim + 1))
        fmt = "jpeg" if rng.integers(0, 2) else "png"
        pixels = synth_pixels(ps, w, h)

    data = encode_image(pixels, fmt)
    image_id = f"img-{digest.hex()[:12]}"
    words = " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), 6))
    caption = f"caption {image_id} {words}"

    # --- outlinks
    n_out = int(rng.integers(0, cfg.max_outlinks + 1))
    outlinks: list[str] = []
    for _ in range(n_out):
        tk = k if rng.random() < 0.6 else int(rng.integers(0, cfg.n_hosts))
        ti = int(rng.integers(0, cfg.pages_per_host))
        tpriv = bool(rng.random() < cfg.private_frac)
        outlinks.append(_messy(page_url(tk, ti, tpriv), rng))
    # trap link LAST and rng-free: appending it never shifts the rng
    # stream, so trap_links=False universes are byte-identical to before
    if cfg.trap_links and not private and i % cfg.trap_every == 0:
        path = canonical_url.split("://", 1)[1].split("/", 1)[1]
        pairs = path.count("cal/2024/")
        outlinks.append(
            f"http://{host_name(k)}/" + "cal/2024/" * (pairs + 2) + f"p/{i}"
        )
    # redirect alias link: also rng-free and appended last, so
    # redirect_every=0 universes stay byte-identical to before
    if cfg.redirect_every and not private and i % cfg.redirect_every == 2:
        outlinks.append(
            f"http://{host_name(k)}/r/{(i * 3 + 1) % cfg.pages_per_host}"
        )

    return Page(
        url=canonical_url,
        host=host_name(k),
        image_id=image_id,
        w=w,
        h=h,
        fmt=fmt,
        data=data,
        caption=caption,
        outlinks=outlinks,
        pixels=pixels,
    )


def reference_pixels(cfg: WebConfig, canonical_url: str) -> np.ndarray:
    """Ground-truth pixels for the PSNR≥40dB decoded-pixel invariant."""
    return page_for(cfg, canonical_url).pixels


def canonical_of(raw_url: str, base: str | None = None) -> str:
    return canonicalize_url(raw_url, base)
