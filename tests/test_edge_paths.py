"""Edge-path regression tests from the round-2 self-review: zero-variance
z-score groups (Ray and SQL must agree on NULL), and small-epoch
fast-path vs pipeline-path crawl equivalence."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_zscore_constant_group_yields_null_on_both_sides(
    ray_session, tmp_path
):
    """A constant-value group has sd == 0: the SQL oracle must not
    SQRT-error and both sides must emit NULL z for its rows."""
    from raycrawl.ops import REGISTRY

    sf = str(tmp_path)
    events = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype="int64"),
            "ts": pd.to_datetime("2024-01-01"),
            "user_id": np.int64(1),
            "event_type": ["flat"] * 4 + ["vary"] * 4,
            "value": [5.0, 5.0, 5.0, 5.0, 1.0, 2.0, 3.0, 4.0],
            "props": "",
        }
    )
    pq.write_table(pa.Table.from_pandas(events), os.path.join(
        sf, "events.parquet"))

    got = REGISTRY["group_zscore_events"]["fn"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(REGISTRY["group_zscore_events"]["sql"]).df()

    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    flat_got = got[got["event_type"] == "flat"]["z"]
    flat_want = want[want["event_type"] == "flat"]["z"]
    assert flat_got.isna().all() and flat_want.isna().all()
    pd.testing.assert_series_equal(
        got[got["event_type"] == "vary"]["z"].astype("float64"),
        want[want["event_type"] == "vary"]["z"].astype("float64"),
        check_index=False,
    )


def test_fast_path_crawl_equals_pipeline_path(ray_session, tmp_path):
    """Forcing EVERY epoch through the single-task fast path must produce
    the identical fetch log, seen set and payload as forcing every epoch
    through the Ray Data pipeline."""
    from raycrawl.core.webgraph import WebConfig, seed_urls
    from raycrawl.crawler import (
        CrawlConfig, _log_sorted, read_payload, run_crawl,
    )

    web = WebConfig(n_hosts=5, pages_per_host=12)

    def crawl(out, small_max):
        cfg = CrawlConfig(
            web=web, out_dir=out, num_shards=3, max_epochs=40,
            collect_parity_outputs=True, small_epoch_max_rows=small_max,
        )
        st = run_crawl(cfg, seed_urls(web))
        payload = (
            read_payload(out, columns=["image_id", "caption", "url_hash"])
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        return _log_sorted(list(st.fetch_log)), st.seen, payload

    log_pipe, seen_pipe, pay_pipe = crawl(
        str(tmp_path / "pipe"), small_max=0
    )  # never fast-path
    log_fast, seen_fast, pay_fast = crawl(
        str(tmp_path / "fast"), small_max=1 << 30
    )  # always fast-path

    assert log_pipe == log_fast
    assert seen_pipe == seen_fast
    pd.testing.assert_frame_equal(pay_pipe, pay_fast)


def test_round_half_away_matches_duckdb_round():
    """The shared rounding helper must follow DuckDB ROUND's tie rule
    (half AWAY from zero) on exact boundaries, where numpy rounds to
    even."""
    from raycrawl.ops.common import round_half_away

    cases = [(0.5, 0), (1.5, 0), (2.5, 0), (-2.5, 0), (124.5, 0),
             (0.00005, 4), (-0.00005, 4), (2.345, 2), (1.2345675, 6)]
    for x, nd in cases:
        want = duckdb.sql(
            f"SELECT ROUND(CAST({x!r} AS DOUBLE), {nd})"
        ).fetchone()[0]
        got = float(round_half_away(x, nd))
        assert got == want, (x, nd, got, want)


def test_outer_join_stats_with_no_matching_orders(ray_session, tmp_path):
    """When NO order matches the filter, the broadcast side is empty and
    every customer must still come back zero-filled (regression: empty
    searchsorted array produced IndexError)."""
    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": ["a", "b", "c"],
            }
        ),
        os.path.join(sf, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1], pa.int64()),
                "o_totalprice": pa.array([10.0], pa.float64()),
                "o_orderpriority": ["5-LOW"],  # nothing URGENT
            }
        ),
        os.path.join(sf, "orders.parquet"),
    )
    from raycrawl.ops.mlprep import customer_urgent_order_stats

    got = customer_urgent_order_stats(sf).to_pandas()
    assert len(got) == 3
    assert (got["n_urgent"] == 0).all()
    assert (got["urgent_spend"] == 0.0).all()


def test_session3_ops_on_tiny_and_dupfree_corpus(ray_session, tmp_path):
    """Session-3 ops vs their DuckDB oracles on a 3-doc corpus with no
    duplicated n-grams and no text long enough for a 5-gram in one case:
    the span ops must emit zero spans / zero removals (not error), the
    phash ops must handle the id range, each side agreeing exactly."""
    from raycrawl.ops import REGISTRY

    sf = str(tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype="int64"),
            "text": ["alpha beta", "gamma delta epsilon zeta eta theta",
                     "iota kappa lambda"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": np.array([10, 34, 17], dtype="int64"),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs),
                   os.path.join(sf, "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )

    for name in ("duplicate_ngram_spans", "duplicate_span_removal_stats",
                 "image_phash_band_lsh_pairs",
                 "image_phash_best_resolution", "image_letterbox_plan"):
        got = REGISTRY[name]["fn"](sf)
        try:
            got = got.to_pandas()
        except AttributeError:
            pass
        want = con.execute(REGISTRY[name]["sql"]).df()
        assert len(got) == len(want), name
        if name == "duplicate_ngram_spans":
            assert len(got) == 0  # no shared 5-grams in the corpus
        if name == "duplicate_span_removal_stats":
            got = got.sort_values("doc_id").reset_index(drop=True)
            assert (got["n_removed"] == 0).all()
            assert list(got["n_words"]) == [2, 6, 3]
