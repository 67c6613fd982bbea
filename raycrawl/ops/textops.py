"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline staples, re-expressed Ray-Data-first:
language ID (stopword-profile heuristic), quality scoring (length / punct /
stopword ratios), token counting, document fingerprinting (rolling hash),
keyword substring counts (reference A9/M5), topic routing with fan-out
(reference M5/M6/D2) and regex extraction (reference M8).

All hot paths are vectorized (pyarrow.compute / pandas str) or run inside
actor pools with per-actor compiled state.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from .common import round_half_away, table, table_spread
from .queries import register

# Topics config — the M5/M6 routing table analog (Readme.md:31-43 format)
TOPICS: list[tuple[str, tuple[str, ...]]] = [
    ("streaming", ("stream", "window", "watermark")),
    ("joins", ("join", "merge", "hash")),
    ("scans", ("scan", "filter", "index")),
    ("vectors", ("vector", "embedding")),
]

STOPWORDS = ("the", "a", "of", "and", "to")


# --------------------------------------------------------------------------
# A9/M5 — substring-containment counts per keyword (Visualization.py:17-28;
# NOT replicating the reference's sum_mask_numpy bug that counts all rows)
_KEYWORDS = ("spark", "join", "window", "vector", "stream")

_kw_sql = " UNION ALL ".join(
    f"SELECT '{k}' AS keyword, count(*) AS n FROM documents"
    f" WHERE contains(text, '{k}')"
    for k in _KEYWORDS
)


@register("keyword_containment_counts", sql=_kw_sql)
def keyword_containment_counts(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["text"])

    def count_kws(t: pa.Table) -> pa.Table:
        # per-batch partial counts (combiner) → tiny global aggregate
        return pa.table(
            {
                "keyword": pa.array(list(_KEYWORDS), pa.string()),
                "n": pa.array(
                    [
                        pc.sum(pc.match_substring(t["text"], k)).as_py() or 0
                        for k in _KEYWORDS
                    ],
                    pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(count_kws, batch_format="pyarrow")
        .groupby("keyword")
        .aggregate(Sum("n", alias_name="n"))
    )


# --------------------------------------------------------------------------
# M5/M6/D2 — topic routing with multi-topic fan-out; unmatched → 'other'
_tk_values = ", ".join(
    f"('{t}', '{k}')" for t, kws in TOPICS for k in kws
)


@register(
    "topic_routing_counts",
    sql=f"""
    WITH tk(topic, kw) AS (VALUES {_tk_values}),
    matched AS (
      SELECT d.doc_id, d.lang, tk.topic
      FROM documents d JOIN tk ON contains(d.text, tk.kw)
      GROUP BY 1, 2, 3),
    unmatched AS (
      SELECT doc_id, lang, 'other' AS topic FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM matched))
    SELECT topic, lang, count(*) AS n
    FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
    GROUP BY topic, lang
    """,
)
def topic_routing_counts(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["doc_id", "lang", "text"])

    def route(t: pa.Table) -> pa.Table:
        n = t.num_rows
        topics_out, langs_out = [], []
        matched = [False] * n
        lang = t["lang"].to_pylist()
        for topic, kws in TOPICS:
            m = None
            for k in kws:
                mk = pc.match_substring(t["text"], k)
                m = mk if m is None else pc.or_(m, mk)
            for i, hit in enumerate(m.to_pylist()):
                if hit:
                    matched[i] = True
                    topics_out.append(topic)
                    langs_out.append(lang[i])
        for i, was in enumerate(matched):
            if not was:
                topics_out.append("other")
                langs_out.append(lang[i])
        return pa.table(
            {
                "topic": pa.array(topics_out, pa.string()),
                "lang": pa.array(langs_out, pa.string()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby(["topic", "lang"])
        .aggregate(Count(alias_name="n"))
    )


# --------------------------------------------------------------------------
# M8 — regex extraction (retweet-target analog): first token of each doc,
# grouped counts of the extracted key
@register(
    "first_token_counts",
    sql="""
    SELECT regexp_extract(text, '^(\\w+)', 1) AS first_token, count(*) AS n
    FROM documents GROUP BY 1
    """,
)
def first_token_counts(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["text"])

    def extract(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["text"], pattern=r"^(?P<tok>\w+)")
        return pa.table({"first_token": pc.struct_field(ext, "tok")})

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("first_token")
        .aggregate(Count(alias_name="n"))
    )


# --------------------------------------------------------------------------
# token counting (whitespace tokenizer) — per-doc token counts + histogram
@register(
    "token_count_stats",
    sql="""
    SELECT CAST(len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS BIGINT) AS n_tokens,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def token_count_stats(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["text"])

    def toks(t: pa.Table) -> pa.Table:
        splits = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
        return pa.table({"n_tokens": pc.cast(pc.list_value_length(splits), pa.int64())})

    return (
        ds.map_batches(toks, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Count(alias_name="n_docs"))
    )


# --------------------------------------------------------------------------
# quality scoring — length + stopword-ratio features per doc
@register(
    "doc_quality_scores",
    sql="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS BIGINT) AS n_tokens,
           ROUND(CAST(len(list_filter(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+'),
                                      w -> w IN ('the','a','of','and','to')))
                      AS DOUBLE)
                 / len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')), 6) AS stopword_ratio
    FROM documents
    """,
)
def doc_quality_scores(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_quality_score_batch, batch_format="pandas")


_WS_RE = None
_STOP_SET = frozenset(STOPWORDS)


def _quality_score_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Task-pool quality scorer; the compiled pattern is a per-worker
    module cache (state this light does not justify an actor pool — the
    heavy-state ST1 pattern lives in the model scorers)."""
    global _WS_RE
    if _WS_RE is None:
        import re

        _WS_RE = re.compile(r"\s+")
    toks = df["text"].str.strip().str.split(_WS_RE)
    n_tokens = toks.map(len)
    n_stop = toks.map(lambda ws: sum(w in _STOP_SET for w in ws))
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars_actual": df["text"].str.len().astype("int64"),
            "n_tokens": n_tokens.astype("int64"),
            "stopword_ratio": (n_stop / n_tokens).round(6),
        }
    )


# --------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, §A1.1 — public
# paper): word-count bounds, mean-word-length bounds, symbol-to-word
# ratio, bullet-line fraction, duplicate-line fraction. The rule
# thresholds apply to the RAW values on both sides (display columns are
# rounded identically), so the keep flag can never diverge on a rounding
# boundary. A pure map over the stream — scale-free.
_WS_TRIM = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"


@register(
    "gopher_quality_flags",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, text,
             string_split_regex(trim(text, {_WS_TRIM}), '\\s+') AS ws,
             string_split(text, chr(10)) AS lines
      FROM documents),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             list_aggregate(list_transform(ws, w -> CAST(length(w) AS DOUBLE)),
                            'avg') AS mwl,
             (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
              + (length(text) - length(replace(text, '...', ''))) / 3)
               / len(ws) AS sym,
             CAST(len(list_filter(lines,
                                  l -> starts_with(l, '- ')
                                       OR starts_with(l, '* '))) AS DOUBLE)
               / len(lines) AS bullet,
             1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
               AS dupl
      FROM tok)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           ROUND(mwl, 4) AS mean_word_len,
           ROUND(sym, 6) AS symbol_ratio,
           ROUND(bullet, 6) AS bullet_frac,
           ROUND(dupl, 6) AS dup_line_frac,
           (n_words BETWEEN 50 AND 100000) AND (mwl BETWEEN 3 AND 10)
             AND sym <= 0.1 AND bullet <= 0.9 AND dupl <= 0.3 AS keep
    FROM m
    """,
)
def gopher_quality_flags(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_gopher_batch, batch_format="pandas")


def _gopher_batch(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    texts = df["text"]
    # pandas str.split(regex) on a stripped string yields [''] for empty
    # text — identical to DuckDB string_split_regex, so ratios divide by
    # the same denominators on both sides
    toks = texts.str.strip().str.split(r"\s+")
    n_words = toks.map(len).to_numpy(dtype=np.float64)
    mwl = toks.map(lambda ws: sum(len(w) for w in ws)).to_numpy() / n_words
    sym = (
        texts.str.count("#") + texts.str.count(r"\.\.\.", flags=0)
    ).to_numpy() / n_words
    lines = texts.str.split("\n")
    n_lines = lines.map(len).to_numpy(dtype=np.float64)
    bullet = (
        lines.map(
            lambda ls: sum(l.startswith(("- ", "* ")) for l in ls)
        ).to_numpy()
        / n_lines
    )
    dupl = 1.0 - lines.map(lambda ls: len(set(ls))).to_numpy() / n_lines
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mwl >= 3)
        & (mwl <= 10)
        & (sym <= 0.1)
        & (bullet <= 0.9)
        & (dupl <= 0.3)
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_words": n_words.astype("int64"),
            "mean_word_len": round_half_away(mwl, 4),
            "symbol_ratio": round_half_away(sym, 6),
            "bullet_frac": round_half_away(bullet, 6),
            "dup_line_frac": round_half_away(dupl, 6),
            "keep": keep,
        }
    )


# --------------------------------------------------------------------------
# language ID — stopword/charset heuristic vs the table's lang column.
# The lang column of this synthetic corpus is not derivable from its text
# (word-soup), so the verifiable contract is the confusion-matrix shape:
# predicted language of each doc via a deterministic n-gram/stopword score.
# Deterministic on both sides → expressible in SQL as the same rule.
_LANG_MARKERS = {
    "en": ("the", "value", "row"),
    "de": ("und", "der", "das"),
    "es": ("el", "la", "los"),
    "fr": ("le", "les", "des"),
    "zh": ("zh", "hanzi", "cjk"),
}


@register(
    "langid_confusion",
    sql="""
    WITH scored AS (
      SELECT lang,
             CASE WHEN contains(text, 'und') OR contains(text, 'der') THEN 'de'
                  WHEN contains(text, 'el ') OR contains(text, 'la ') THEN 'es'
                  WHEN contains(text, 'le ') OR contains(text, 'les ') THEN 'fr'
                  WHEN contains(text, 'the') THEN 'en'
                  ELSE 'unknown' END AS predicted
      FROM documents)
    SELECT lang, predicted, count(*) AS n FROM scored GROUP BY 1, 2
    """,
)
def langid_confusion(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["lang", "text"])

    def predict(t: pa.Table) -> pa.Table:
        txt = t["text"]
        de = pc.or_(pc.match_substring(txt, "und"), pc.match_substring(txt, "der"))
        es = pc.or_(pc.match_substring(txt, "el "), pc.match_substring(txt, "la "))
        fr = pc.or_(pc.match_substring(txt, "le "), pc.match_substring(txt, "les "))
        en = pc.match_substring(txt, "the")
        pred = pc.if_else(
            de,
            pa.scalar("de"),
            pc.if_else(
                es,
                pa.scalar("es"),
                pc.if_else(fr, pa.scalar("fr"),
                           pc.if_else(en, pa.scalar("en"), pa.scalar("unknown"))),
            ),
        )
        return pa.table({"lang": t["lang"], "predicted": pred})

    return (
        ds.map_batches(predict, batch_format="pyarrow")
        .groupby(["lang", "predicted"])
        .aggregate(Count(alias_name="n"))
    )


# --------------------------------------------------------------------------
# document fingerprinting — 64-bit FNV-1a rolling hash of the normalized
# text (whitespace-collapsed, lowercased); dedup key analog of M3/M4+D1.
# SQL oracle replays the byte-fold with HUGEINT mod-2^64 arithmetic via
# list_reduce (ord == utf-8 byte on this ASCII corpus, keeping the two
# sides bit-identical).
@register(
    "doc_fingerprints",
    sql="""
    WITH norm AS (
      SELECT doc_id,
             array_to_string(string_split_regex(lower(text), '\\s+'), ' ') AS s
      FROM documents
    ),
    fp AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(14695981039346656037 AS HUGEINT),
                            [CAST(ord(substr(s, i, 1)) AS HUGEINT)
                             for i in range(1, length(s) + 1)]),
               (acc, x) -> (xor(acc, x) * 1099511628211) %
                           CAST(18446744073709551616 AS HUGEINT)
             ) AS h
      FROM norm
    )
    SELECT doc_id,
           CAST(CASE WHEN h >= CAST(1 AS HUGEINT) << 63
                     THEN h - (CAST(1 AS HUGEINT) << 64) ELSE h END AS BIGINT)
             AS fingerprint
    FROM fp
    """,
)
def doc_fingerprints(sf_dir: str):
    ds = table_spread(sf_dir, "documents", ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        def fnv1a(s: str) -> int:
            h = 0xCBF29CE484222325
            for b in s.encode():
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h - (1 << 64) if h >= (1 << 63) else h

        norm = df["text"].str.lower().str.split().str.join(" ")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": norm.map(fnv1a).astype("int64"),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


# --------------------------------------------------------------------------
# BM25 ranking (k1=1.2, b=0.75) of all documents against a fixed query,
# top-50. Two streaming passes: (1) corpus statistics — doc count, total
# token length, per-term document frequency — as per-block partial sums
# collapsed by one local combine (the partial is ONE row per block at any
# scale); (2) scoring with the tiny stats broadcast, per-block top-50
# partials merged locally. Term frequency is counted over the exact
# [a-z0-9]+ token alphabet via a vectorized split + cumulative-sum
# segment reduction (regex word-boundary \b would disagree with the
# tokenizer around underscores).
_BM25_TERMS = ("spark", "window", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 50

_BM25_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS words
  FROM documents),
dl AS (SELECT doc_id, len(words) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT t.doc_id, q.term, len(list_filter(t.words, x -> x = q.term)) AS tf
  FROM toks t
  CROSS JOIN (SELECT unnest(['spark', 'window', 'hash']) AS term) q),
df AS (SELECT term, count(*) FILTER (tf > 0) AS df FROM tf GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         SUM( ln((((SELECT n_docs FROM stats) - df.df + 0.5) / (df.df + 0.5)) + 1)
              * tf.tf * 2.2
              / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (SELECT avgdl FROM stats)))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
  GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, 6) AS bm25 FROM scores
ORDER BY score DESC, doc_id LIMIT 50
"""


def _term_counts(lower: pa.ChunkedArray, terms) -> "tuple":
    """(dl, tf-per-term) over the [a-z0-9]+ token alphabet, vectorized:
    one regex split per batch, then per-term equality + cumulative-sum
    segment reduction over the flattened token values."""
    import numpy as np

    dl = pc.count_substring_regex(lower, "[a-z0-9]+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    splits = pc.split_pattern_regex(lower, "[^a-z0-9]+")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    offsets = splits.offsets.to_numpy().astype(np.int64)
    flat = splits.values
    tfs = []
    for term in terms:
        eq = pc.cast(pc.equal(flat, term), pa.int8()).to_numpy(
            zero_copy_only=False
        )
        c = np.concatenate([[0], np.cumsum(eq, dtype=np.int64)])
        tfs.append(c[offsets[1:]] - c[offsets[:-1]])
    return dl, tfs


@register("bm25_top_docs", sql=_BM25_SQL)
def bm25_top_docs(sf_dir: str):
    import numpy as np
    import ray

    from .common import combine_small

    docs = table_spread(sf_dir, "documents", ["doc_id", "text"])
    terms = _BM25_TERMS

    def stats_partial(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["text"])
        dl, tfs = _term_counts(lower, terms)
        row = {
            "n_docs": pa.array([len(dl)], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for term, tf in zip(terms, tfs):
            row[f"df_{term}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(row)

    def stats_final(t: pa.Table) -> pa.Table:
        return pa.table(
            {c: pa.array([pc.sum(t[c]).as_py() or 0], pa.int64())
             for c in t.column_names}
        )

    stats = combine_small(
        docs.map_batches(stats_partial, batch_format="pyarrow"), stats_final
    )
    n_docs = stats["n_docs"][0].as_py()
    avgdl = stats["sum_dl"][0].as_py() / n_docs
    idf = {
        term: float(
            np.log((n_docs - stats[f"df_{term}"][0].as_py() + 0.5)
                   / (stats[f"df_{term}"][0].as_py() + 0.5) + 1.0)
        )
        for term in terms
    }
    bcast = ray.put((idf, avgdl))

    def score_topk(t: pa.Table, *, ref) -> pa.Table:
        idf_m, avg = ray.get(ref)
        lower = pc.utf8_lower(t["text"])
        dl, tfs = _term_counts(lower, terms)
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avg)
        score = np.zeros(len(dl))
        for term, tf in zip(terms, tfs):
            tf = tf.astype(np.float64)
            score += idf_m[term] * tf * (_BM25_K1 + 1.0) / (tf + norm)
        out = pa.table({"doc_id": t["doc_id"], "score": pa.array(score)})
        # per-block top-k partial on the UNROUNDED score
        idx = pc.sort_indices(
            out, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        return out.take(idx[:_BM25_TOPK])

    def merge_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        top = t.take(idx[:_BM25_TOPK])
        return pa.table(
            {
                "doc_id": top["doc_id"],
                "bm25": pa.array(
                    round_half_away(
                        top["score"].to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    partials = docs.map_batches(
        score_topk, fn_kwargs={"ref": bcast}, batch_format="pyarrow"
    )
    return merge_topk(combine_small(partials, lambda t: t))


# --------------------------------------------------------------------------
# Corpus word-frequency top-k (the canonical wordcount, done the way it
# must be done at 100 TB): one vectorized split + per-block value_counts
# collapses each block to its local vocabulary BEFORE the exchange, the
# groupby("word") shuffle then moves only (word, partial-count) rows —
# vocabulary-sized, sublinear in corpus size — and top-k is a per-block
# partial merged once locally. Token alphabet is the shared [a-z0-9]+
# convention (same as BM25 / duplicate-ngram).
_TOP_WORDS_K = 50

_TOP_WORDS_SQL = """
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS word
  FROM documents)
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM toks GROUP BY word
ORDER BY n DESC, word LIMIT 50
"""


@register("top_words_corpus", sql=_TOP_WORDS_SQL)
def top_words_corpus(sf_dir: str):
    from .common import combine_small

    docs = table_spread(sf_dir, "documents", ["text"])

    def block_counts(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["text"])
        splits = pc.split_pattern_regex(lower, "[^a-z0-9]+")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = splits.values
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "word": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(block_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("word", "ascending")]
        )
        return t.take(idx[:_TOP_WORDS_K])

    # per-block top-k partials (bounded: K rows per block), one local merge
    partials = counts.map_batches(topk, batch_format="pyarrow")
    return combine_small(partials, topk)
