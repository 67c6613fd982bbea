"""Corpus-curation operators: term masking, token explode, train/eval
contamination detection, and token-budget sequence packing.

The reference's text cleanup is per-record string surgery
(``preprocess_text`` / ``remove_new_lines``, ``PreprocessDump.py:84-89``,
and the regex suite in ``Random_Forest_Classifier.py:14-51``); its fan-out
is the topic router (``PreprocessDump.py:237-268``). These ops re-express
those shapes as the curation stages an LLM training-data pipeline runs at
100 TB: masking is one vectorized Arrow regex kernel per batch, the
explode is a ``flat_map``-shaped batch transform, contamination checking
streams the train split against a broadcast eval-shingle set (the J7
broadcast anti/semi-join pattern), and sequence packing is a distributed
ordered prefix-sum — bucket totals reduce to the driver (one number per
bucket), each bucket then computes its local cumsum against its broadcast
offset, so no global sort and no serial scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .common import md5_u64_le, table
from .queries import register

# --------------------------------------------------------------------------
# Sensitive-term masking (the PII-scrub shape): replace every occurrence of
# the masked vocabulary with a fixed tag. One vectorized regex kernel per
# batch; the pattern is compiled by Arrow once per task.

MASK_TERMS = ("customer", "key")
_MASK_PATTERN = r"\b(customer|key)\b"
MASK_TAG = "<masked>"


@register(
    "mask_terms_docs",
    # DuckDB string literals keep backslashes verbatim, so the pattern is
    # inserted as-is
    sql=f"""
    SELECT doc_id,
           regexp_replace(text, '{_MASK_PATTERN}', '{MASK_TAG}', 'g') AS masked,
           CAST(len(regexp_extract_all(text, '{_MASK_PATTERN}'))
                AS BIGINT) AS n_masked
    FROM documents
    """,
)
def mask_terms_docs(sf_dir: str):
    ds = table(sf_dir, "documents", ["doc_id", "text"])

    def mask(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], _MASK_PATTERN)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "masked": pc.replace_substring_regex(
                    t["text"], _MASK_PATTERN, MASK_TAG
                ),
                "n_masked": pc.cast(n, pa.int64()),
            }
        )

    return ds.map_batches(mask, batch_format="pyarrow")


# --------------------------------------------------------------------------
# PII redaction — the email/phone scrub every public-web corpus runs before
# training. Both sides use RE2 (Arrow's replace_substring_regex == DuckDB's
# regexp_replace engine), so match semantics are bit-identical. The corpus
# tables carry no organic PII, so the op runs over a support-ticket string
# DETERMINISTICALLY constructed from customer columns on BOTH sides — the
# redaction machinery (two-pattern scrub + per-pattern counts) is what is
# under test, and counts vary 0-1 emails / 1-2 phones per row.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3,4}-\d{4}"


@register(
    "pii_redact_tickets",
    sql=f"""
    WITH t AS (
      SELECT c_custkey,
             'Contact ' || c_name
             || CASE WHEN c_custkey % 2 = 0
                     THEN ' <' || lower(replace(c_name, '#', '.'))
                          || '@example.com>'
                     ELSE '' END
             || ' call 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
             || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             || CASE WHEN c_custkey % 3 = 0
                     THEN ' or 555-' || lpad(CAST(c_custkey % 100 AS VARCHAR), 3, '0')
                          || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS ticket
      FROM customer)
    SELECT c_custkey,
           regexp_replace(regexp_replace(ticket, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(ticket, '{EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(ticket, '{PHONE_RE}')) AS BIGINT)
             AS n_phones
    FROM t
    """,
)
def pii_redact_tickets(sf_dir: str):
    ds = table(sf_dir, "customer", ["c_custkey", "c_name"])

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        key = df["c_custkey"]
        email = pd.Series(
            np.where(
                key % 2 == 0,
                " <"
                + df["c_name"].str.replace("#", ".", regex=False).str.lower()
                + "@example.com>",
                "",
            )
        )
        p1 = (
            " call 555-"
            + (key % 1000).astype(str).str.zfill(3)
            + "-"
            + (key % 10000).astype(str).str.zfill(4)
        )
        p2 = pd.Series(
            np.where(
                key % 3 == 0,
                " or 555-"
                + (key % 100).astype(str).str.zfill(3)
                + "-"
                + (key % 10000).astype(str).str.zfill(4),
                "",
            )
        )
        ticket = pa.array(
            ("Contact " + df["c_name"]).to_numpy() + email.to_numpy()
            + p1.to_numpy() + p2.to_numpy()
        )
        red = pc.replace_substring_regex(
            pc.replace_substring_regex(ticket, EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        )
        return pd.DataFrame(
            {
                "c_custkey": key,
                "redacted": red.to_pandas(),
                "n_emails": pc.count_substring_regex(ticket, EMAIL_RE)
                .cast(pa.int64())
                .to_pandas(),
                "n_phones": pc.count_substring_regex(ticket, PHONE_RE)
                .cast(pa.int64())
                .to_pandas(),
            }
        )

    return ds.map_batches(redact, batch_format="pandas")


# --------------------------------------------------------------------------
# Token explode: one output row per (doc, position, token) — the flat_map
# fan-out shape (reference analog: the multi-topic record fan-out, M5/D2).
# Vectorized: one split kernel per batch, then a list-flatten with a
# repeated parent index; no per-row Python.


@register(
    "explode_doc_tokens",
    sql="""
    SELECT doc_id, CAST(unnest(range(1, len(ws) + 1)) AS BIGINT) AS pos,
           unnest(ws) AS token
    FROM (SELECT doc_id, string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ws
          FROM documents)
    """,
)
def explode_doc_tokens(sf_dir: str):
    ds = table(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        splits = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), r"\s+"
        )
        lens = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lens)
        pos = np.concatenate([np.arange(1, n + 1) for n in lens]) if len(lens) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(pos.astype(np.int64), pa.int64()),
                "token": pc.list_flatten(splits),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# --------------------------------------------------------------------------
# BPE-ish token counting: the GPT-2-style pre-tokenizer split (word /
# number / punctuation runs with leading-space attachment), simplified to
# an RE2-compatible pattern (no lookahead) so the SAME regex runs in
# Arrow's count kernel and DuckDB's regexp_extract_all. Complements the
# whitespace tokenizer in token_count_stats (textops.py:158).

BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


@register(
    "bpe_token_counts",
    sql=f"""
    SELECT CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def bpe_token_counts(sf_dir: str):
    ds = table(sf_dir, "documents", ["text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], BPE_PATTERN)
        return pa.table({"n_bpe_tokens": pc.cast(n, pa.int64())})

    from ray.data.aggregate import Count

    return (
        ds.map_batches(toks, batch_format="pyarrow")
        .groupby("n_bpe_tokens")
        .aggregate(Count(alias_name="n_docs"))
    )


# --------------------------------------------------------------------------
# Train/eval contamination: flag train documents sharing any token
# 3-shingle with the (small) eval split. The eval shingle set is built
# once driver-side from the pruned eval read and broadcast via ray.put;
# the train split streams through a per-batch membership probe — the
# broadcast semi-join shape (J7). At web scale the eval side stays small
# by construction (benchmarks), which is exactly why this shape holds.

EVAL_MOD = 20  # doc_id % 20 == 0 -> eval split
SHINGLE_W = 3


def _shingles(tokens: list[str]) -> set[str]:
    return {
        " ".join(tokens[i : i + SHINGLE_W])
        for i in range(len(tokens) - SHINGLE_W + 1)
    }


@register(
    "benchmark_contamination",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS ws
      FROM documents),
    sh AS (
      SELECT doc_id, array_to_string(ws[i:i+{SHINGLE_W - 1}], ' ') AS shingle
      FROM (SELECT doc_id, ws,
                   unnest(range(1, len(ws) - {SHINGLE_W - 2})) AS i
            FROM tok WHERE len(ws) >= {SHINGLE_W})),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    train_sh AS (SELECT DISTINCT doc_id, shingle FROM sh
                 WHERE doc_id % {EVAL_MOD} != 0)
    SELECT t.doc_id, COUNT(*) AS n_shared
    FROM train_sh t JOIN eval_sh e USING (shingle)
    GROUP BY t.doc_id
    """,
)
def benchmark_contamination(sf_dir: str):
    import re

    ws_re = re.compile(r"\s+")

    # eval split: small by construction -> pruned driver-side read
    import duckdb

    eval_txt = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE doc_id % {EVAL_MOD} = 0"
    ).fetchall()
    eval_set: set[str] = set()
    for (text,) in eval_txt:
        eval_set |= _shingles(ws_re.split(text.strip()))
    # broadcast the shingle set as ONE sorted uint64 hash array — zero-copy
    # out of plasma on every ray.get, unlike a pickled frozenset that would
    # re-deserialize per batch (the 64-bit md5 collision odds,
    # ~n_eval·n_train/2^64, are negligible against the driver gate)
    ref = ray.put(
        np.sort(
            np.fromiter(
                (md5_u64_le(sh) for sh in eval_set),
                dtype=np.uint64,
                count=len(eval_set),
            )
        )
    )

    ds = table(sf_dir, "documents", ["doc_id", "text"])

    def probe(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        ev = ray.get(ref)  # zero-copy plasma view per batch
        df = df[df["doc_id"] % EVAL_MOD != 0]
        rows = {"doc_id": [], "n_shared": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sh = _shingles(ws_re.split(text.strip()))
            if not sh:
                continue
            hs = np.fromiter(
                (md5_u64_le(s) for s in sh), dtype=np.uint64, count=len(sh)
            )
            n = int(np.isin(hs, ev, assume_unique=True).sum())
            if n:
                rows["doc_id"].append(doc_id)
                rows["n_shared"].append(n)
        return pd.DataFrame(rows).astype(
            {"doc_id": "int64", "n_shared": "int64"}
        )

    return ds.map_batches(probe, fn_kwargs={"ref": ref}, batch_format="pandas")


# --------------------------------------------------------------------------
# Token-budget sequence packing: documents in doc_id order are packed into
# contiguous training chunks of <= PACK_BUDGET tokens (running-total
# packing, the streaming form of sequence packing). chunk_id =
# floor(tokens_before / budget) where tokens_before is the global ordered
# prefix-sum — computed distributed: fixed doc_id-range buckets, per-bucket
# totals reduced on the driver (one int per bucket), exclusive offsets
# broadcast back, each bucket then cumsums locally inside map_groups.

PACK_BUDGET = 2000
PACK_BUCKET = 512  # doc_ids per prefix-sum bucket


def tokens_with_bucket(t: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, bucket) projection — the prefix-sum input."""
    splits = pc.split_pattern_regex(pc.utf8_trim_whitespace(t["text"]), r"\s+")
    n = pc.cast(pc.list_value_length(splits), pa.int64())
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tokens": n,
            "bucket": pc.cast(
                pc.floor(
                    pc.divide(
                        pc.cast(t["doc_id"], pa.float64()),
                        pa.scalar(float(PACK_BUCKET)),
                    )
                ),
                pa.int64(),
            ),
        }
    )


def pack_by_running_total(tk, budget: int = PACK_BUDGET):
    """The distributed ordered prefix-sum over a (doc_id, n_tokens,
    bucket) Dataset → (doc_id, n_tokens, chunk_id). Reused by the registry
    query and the curation example (which packs the FILTERED corpus)."""
    # materialize once: both the bucket-total pass and the per-bucket
    # cumsum pass consume this, and re-tokenizing is the dominant cost
    tk = tk.materialize()

    # pass 1: per-bucket totals (per-batch partials -> tiny driver reduce;
    # bucket count = n_docs / PACK_BUCKET, a scalar per ~512 docs)
    def bucket_partial(t: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(t, "bucket")
            .aggregate([("n_tokens", "sum")])
            .rename_columns(["bucket", "s"])
        )

    parts = tk.map_batches(bucket_partial, batch_format="pyarrow").to_pandas()
    totals = parts.groupby("bucket")["s"].sum().sort_index()
    offsets = {
        int(b): int(off)
        for b, off in zip(totals.index, totals.cumsum().shift(fill_value=0))
    }
    ref = ray.put(offsets)

    # pass 2: per-bucket local cumsum against the broadcast offset; the
    # groupby shuffle moves only (doc_id, n_tokens) pairs
    def pack(g: pd.DataFrame, *, ref) -> pd.DataFrame:
        offs = ray.get(ref)
        g = g.sort_values("doc_id").reset_index(drop=True)
        before = offs[int(g["bucket"].iloc[0])] + (
            g["n_tokens"].cumsum() - g["n_tokens"]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "chunk_id": (before // budget).astype("int64"),
            }
        )

    return tk.groupby("bucket").map_groups(
        pack, fn_kwargs={"ref": ref}, batch_format="pandas"
    )


@register(
    "pack_documents_to_chunks",
    sql=f"""
    WITH tk AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS before
      FROM tk)
    SELECT doc_id, n_tokens,
           CAST(FLOOR(before / {PACK_BUDGET}.0) AS BIGINT) AS chunk_id
    FROM c
    """,
)
def pack_documents_to_chunks(sf_dir: str):
    ds = table(sf_dir, "documents", ["doc_id", "text"])
    return pack_by_running_total(
        ds.map_batches(tokens_with_bucket, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# Unigram language-model quality proxy (the CCNet / perplexity-filter
# shape every LLM ingest pipeline runs): pass 1 FITS a unigram LM over the
# corpus — per-block token value_counts collapse each block to its local
# vocabulary before any exchange, so the final (word, count) fold is
# VOCABULARY-sized, not corpus-sized, and broadcasts whole; pass 2
# re-streams the corpus and scores every document's average negative
# log-likelihood against the broadcast table with one C-level categorical
# map + a segment mean. A production pipeline swaps the broadcast table
# for a KenLM binary in the same fit-once/score-streaming slot; the
# two-pass dataflow (and the filter reading `avg_nll`) is identical.
# Reference analog: the fit-once TF-IDF + score path
# (`Random_Forest_Classifier.py:53-78`), generalized from 2 fixed terms to
# the whole vocabulary.

_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS word
  FROM documents),
freq AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
tot AS (SELECT sum(n) AS total FROM freq)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       ROUND(-avg(ln(f.n / tot.total)), 6) AS avg_nll
FROM toks t JOIN freq f USING (word) CROSS JOIN tot
GROUP BY t.doc_id
"""


def _fit_unigram_lm(sf_dir: str):
    """Pass 1 of the unigram-LM proxy: fit log-probs over the corpus
    vocabulary (per-block value_counts collapse to local vocab before the
    exchange; the fold is vocabulary-sized) → broadcast ObjectRef of a
    word→logp Series."""
    from .common import combine_small

    def block_counts(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["text"])
        splits = pc.split_pattern_regex(lower, "[^a-z0-9]+")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        flat = splits.values.filter(pc.not_equal(splits.values, ""))
        vc = pc.value_counts(flat)
        return pa.table(
            {"word": vc.field("values"),
             "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    def fold_vocab(t: pa.Table) -> pa.Table:
        return (
            pa.TableGroupBy(t, "word")
            .aggregate([("n", "sum")])
            .rename_columns(["word", "n"])
        )

    vocab = combine_small(
        table(sf_dir, "documents", ["text"]).map_batches(
            block_counts, batch_format="pyarrow"
        ),
        fold_vocab,
    )
    n = vocab["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    logp = pd.Series(
        np.log(n / n.sum()), index=vocab["word"].to_pylist()
    )
    return ray.put(logp)


def _unigram_scored(sf_dir: str, carry: tuple[str, ...] = ()):
    """Pass 2: stream the corpus against the broadcast LM → Dataset of
    (doc_id, *carry, n_tokens, avg_nll). ``carry`` names extra document
    columns to ride along (e.g. lang for per-language filtering)."""
    from .common import round_half_away

    lm_ref = _fit_unigram_lm(sf_dir)

    def score(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        lm = ray.get(ref)
        toks = (
            df["text"].str.lower().str.split(r"[^a-z0-9]+", regex=True)
        )
        ex = toks.explode()
        ex = ex[ex.astype(bool)]  # drop the '' artifacts of split()
        if not len(ex):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 **{c: pd.Series([], dtype="object") for c in carry},
                 "n_tokens": pd.Series([], dtype="int64"),
                 "avg_nll": pd.Series([], dtype="float64")}
            )
        nll = -ex.map(lm).to_numpy(np.float64)
        g = pd.DataFrame(
            {"doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
             **{c: df[c].reindex(ex.index).to_numpy() for c in carry},
             "nll": nll}
        ).groupby(["doc_id", *carry], as_index=False).agg(
            n_tokens=("nll", "size"), avg_nll=("nll", "mean")
        )
        g["avg_nll"] = round_half_away(g["avg_nll"].to_numpy(), 6)
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return g

    return table(sf_dir, "documents", ["doc_id", *carry, "text"]).map_batches(
        score, fn_kwargs={"ref": lm_ref}, batch_format="pandas"
    )


@register("unigram_logprob_scores", sql=_UNIGRAM_SQL)
def unigram_logprob_scores(sf_dir: str):
    return _unigram_scored(sf_dir)


# --------------------------------------------------------------------------
# RAG / pretraining CHUNKING: split every document into overlapping
# token windows (window=64 words, stride=48 → 16-word overlap) and emit
# one row per chunk with its token extent and a 64-bit content address
# (md5 of the chunk text — the key downstream chunk-dedup or vector
# indexing joins on). Pure per-doc math: a single streamed map_batches,
# no shuffle at any scale; text leaves the stage only as an 8-byte hash.

CHUNK_W = 64
CHUNK_S = 48

_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS words
  FROM documents),
n AS (SELECT doc_id, words, len(words) AS nw FROM toks
      WHERE len(words) >= 1),
c AS (
  SELECT doc_id, nw, words,
         unnest(range(CASE WHEN nw <= {CHUNK_W} THEN 1
                      ELSE CAST(ceil((nw - {CHUNK_W}) / {CHUNK_S}.0)
                           AS BIGINT) + 1 END)) AS chunk_idx
  FROM n)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_S} AS BIGINT) AS start_tok,
       CAST(least({CHUNK_W}, nw - chunk_idx * {CHUNK_S}) AS BIGINT)
           AS n_tokens,
       -- two's-complement wrap to BIGINT: the repo-wide signed-int64
       -- convention for hash output columns (see doc_fingerprints)
       CAST(CASE WHEN h >= CAST(1 AS HUGEINT) << 63
                 THEN CAST(h AS HUGEINT) - (CAST(1 AS HUGEINT) << 64)
                 ELSE CAST(h AS HUGEINT) END AS BIGINT) AS chunk_h
FROM (SELECT *, md5_number_upper(array_to_string(
          words[chunk_idx*{CHUNK_S}+1:chunk_idx*{CHUNK_S}+{CHUNK_W}], ' '))
          AS h FROM c) q
"""


@register("chunk_overlap_windows", sql=_CHUNK_SQL)
def chunk_overlap_windows(sf_dir: str):
    import re

    from .common import table_spread

    rx = re.compile(r"[a-z0-9]+")

    def chunks(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        idxs: list[int] = []
        starts: list[int] = []
        lens: list[int] = []
        hs: list[int] = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = rx.findall(text.lower())
            nw = len(toks)
            if nw < 1:
                continue
            n_chunks = (1 if nw <= CHUNK_W
                        else -(-(nw - CHUNK_W) // CHUNK_S) + 1)
            for i in range(n_chunks):
                s = i * CHUNK_S
                block = toks[s : s + CHUNK_W]
                ids.append(did)
                idxs.append(i)
                starts.append(s)
                lens.append(len(block))
                hs.append(md5_u64_le(" ".join(block)))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, np.int64)),
                "chunk_idx": pa.array(np.asarray(idxs, np.int64)),
                "start_tok": pa.array(np.asarray(starts, np.int64)),
                "n_tokens": pa.array(np.asarray(lens, np.int64)),
                "chunk_h": pa.array(
                    np.fromiter(hs, np.uint64, count=len(hs)).view(np.int64),
                    pa.int64(),
                ),
            }
        )

    return table_spread(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection with Importance
# Resampling"): score every document by how target-like its hashed-unigram
# profile is — log p_target(doc) − log p_raw(doc) under two bag-of-buckets
# unigram models (add-1 smoothed over the md5-mod-256 feature space; the
# same hash convention as feature_hash_bucket_stats). Target = the English
# slice of the corpus; raw = everything. Dataflow: pass 1 folds per-block
# (bucket, n_all, n_target) token counts to a 256-row table (combine_small
# — no shuffle), the 256 log-ratios broadcast; pass 2 streams the corpus
# once more and emits per-doc Σ log-ratio. At 100 TB both passes are
# single streaming scans; nothing corpus-sized ever exchanges.

_DSIR_BUCKETS = 256
_DSIR_TARGET_LANG = "en"

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS tok
  FROM documents),
b AS (SELECT doc_id, lang,
             CAST(md5_number_upper(tok) % {_DSIR_BUCKETS} AS BIGINT)
                 AS bucket
      FROM toks),
raw AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
tgt AS (SELECT bucket, count(*) AS n FROM b
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
tot AS (SELECT (SELECT sum(n) FROM raw) AS nr,
               (SELECT COALESCE(sum(n), 0) FROM tgt) AS nt),
lr AS (SELECT r.bucket,
              ln((COALESCE(t.n, 0) + 1.0) / (tot.nt + {_DSIR_BUCKETS}.0))
              - ln((r.n + 1.0) / (tot.nr + {_DSIR_BUCKETS}.0)) AS lw
       FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN tot)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       ROUND(sum(lr.lw), 6) AS logw
FROM b JOIN lr USING (bucket)
GROUP BY 1
"""


@register("dsir_importance_weights", sql=_DSIR_SQL)
def dsir_importance_weights(sf_dir: str):
    from .common import combine_small, round_half_away

    def _buckets_of(ex: pd.Series) -> np.ndarray:
        # md5 once per DISTINCT token in the block, never per occurrence
        uniq = pd.unique(ex)
        bmap = {t: md5_u64_le(t) % _DSIR_BUCKETS for t in uniq}
        return ex.map(bmap).to_numpy(np.int64)

    def _explode(df: pd.DataFrame) -> pd.Series:
        toks = df["text"].str.lower().str.split(r"[^a-z0-9]+", regex=True)
        ex = toks.explode()
        return ex[ex.astype(bool)]

    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode(df)
        if not len(ex):
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "n_all": pd.Series([], dtype="int64"),
                 "n_tgt": pd.Series([], dtype="int64")}
            )
        b = _buckets_of(ex)
        is_tgt = (
            df["lang"].reindex(ex.index).to_numpy() == _DSIR_TARGET_LANG
        )
        n_all = np.bincount(b, minlength=_DSIR_BUCKETS)
        n_tgt = np.bincount(b[is_tgt], minlength=_DSIR_BUCKETS)
        nz = np.nonzero(n_all)[0]
        return pd.DataFrame(
            {"bucket": nz.astype(np.int64),
             "n_all": n_all[nz].astype(np.int64),
             "n_tgt": n_tgt[nz].astype(np.int64)}
        )

    counts = combine_small(
        table(sf_dir, "documents", ["lang", "text"]).map_batches(
            bucket_partial, batch_format="pandas"
        ),
        lambda t: pa.Table.from_pandas(
            t.to_pandas().groupby("bucket", as_index=False).agg(
                n_all=("n_all", "sum"), n_tgt=("n_tgt", "sum")
            ),
            preserve_index=False,
        ),
    ).to_pandas()
    n_all = np.zeros(_DSIR_BUCKETS, np.float64)
    n_tgt = np.zeros(_DSIR_BUCKETS, np.float64)
    n_all[counts["bucket"].to_numpy(np.int64)] = counts["n_all"].to_numpy()
    n_tgt[counts["bucket"].to_numpy(np.int64)] = counts["n_tgt"].to_numpy()
    nr, nt = n_all.sum(), n_tgt.sum()
    # identical double expression to the SQL: ln((t+1)/(Nt+B)) − ln((r+1)/(Nr+B))
    lw = np.log((n_tgt + 1.0) / (nt + float(_DSIR_BUCKETS))) - np.log(
        (n_all + 1.0) / (nr + float(_DSIR_BUCKETS))
    )
    lw_ref = ray.put(lw)

    def score(df: pd.DataFrame, *, ref) -> pd.DataFrame:
        lw = ray.get(ref)
        ex = _explode(df)
        if not len(ex):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_tokens": pd.Series([], dtype="int64"),
                 "logw": pd.Series([], dtype="float64")}
            )
        b = _buckets_of(ex)
        g = pd.DataFrame(
            {"doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
             "lw": lw[b]}
        ).groupby("doc_id", as_index=False).agg(
            n_tokens=("lw", "size"), logw=("lw", "sum")
        )
        g["logw"] = round_half_away(g["logw"].to_numpy(), 6)
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return g

    return table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, fn_kwargs={"ref": lw_ref}, batch_format="pandas"
    )


# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020): split each
# language's documents into head / middle / tail thirds by unigram-LM
# avg-NLL (the perplexity proxy scored above) — the standard quality
# stratification before sampling pretraining data. Cutoffs are the exact
# per-language discrete tercile VALUES from the bounded two-pass
# histogram machinery (relops._exact_group_discrete_quantiles — no global
# sort); assignment is value-based (avg_nll ≤ cutoff), so it is a
# broadcast comparison, not a rank shuffle. The scored table (4 cols/doc)
# is materialized once so the quantile passes re-scan doc-sized metadata,
# never the corpus text.

_CCNET_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS word
  FROM documents),
freq AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
tot AS (SELECT sum(n) AS total FROM freq),
scored AS (
  SELECT t.doc_id, ROUND(-avg(ln(f.n / tot.total)), 6) AS avg_nll
  FROM toks t JOIN freq f USING (word) CROSS JOIN tot
  GROUP BY t.doc_id),
sl AS (SELECT s.doc_id, d.lang, s.avg_nll
       FROM scored s JOIN documents d USING (doc_id)),
cut AS (SELECT lang,
               quantile_disc(avg_nll, 1.0/3) AS c1,
               quantile_disc(avg_nll, 2.0/3) AS c2
        FROM sl GROUP BY lang)
SELECT sl.doc_id, sl.lang, sl.avg_nll,
       CASE WHEN sl.avg_nll <= cut.c1 THEN 'head'
            WHEN sl.avg_nll <= cut.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sl JOIN cut USING (lang)
"""


@register("ccnet_perplexity_buckets", sql=_CCNET_SQL)
def ccnet_perplexity_buckets(sf_dir: str):
    from .relops import _exact_group_discrete_quantiles

    # scored table: 4 small cols per doc — bounded intermediate (the
    # quantile machinery scans it three times; re-running the LM scoring
    # per pass would re-read the corpus text)
    scored = _unigram_scored(sf_dir, carry=("lang",)).materialize()

    def micro_of(t: pa.Table) -> np.ndarray:
        # avg_nll is already rounded to 6 dp → ×1e6 is integral up to fp
        # noise; half-away rounding recovers the exact int64 micro-units
        return pc.cast(
            pc.round(
                pc.multiply(t["avg_nll"], pa.scalar(1e6)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()

    groups, _, quants = _exact_group_discrete_quantiles(
        scored, "lang", micro_of, (1.0 / 3, 2.0 / 3)
    )
    gcode = {g: i for i, g in enumerate(groups)}
    cut_ref = ray.put((gcode, quants[1.0 / 3], quants[2.0 / 3]))

    def assign(t: pa.Table, *, ref) -> pa.Table:
        gcode, c1, c2 = ray.get(ref)
        m = micro_of(t)
        gi = np.fromiter(
            (gcode[g] for g in t["lang"].to_pylist()), np.int64, t.num_rows
        )
        bucket = np.where(
            m <= c1[gi], "head", np.where(m <= c2[gi], "middle", "tail")
        )
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"],
             "avg_nll": t["avg_nll"], "bucket": pa.array(bucket)}
        )

    return scored.map_batches(assign, fn_kwargs={"ref": cut_ref},
                              batch_format="pyarrow")
