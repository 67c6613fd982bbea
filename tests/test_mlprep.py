"""Training-data prep operators (ops/mlprep.py): DuckDB-oracle parity at
sf0.001 plus semantic invariants the SQL compare can't see (zero-fill
outer-join rows, stratum caps, k-means convergence direction)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from raycrawl.ops import REGISTRY

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(REGISTRY[name]["sql"]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _run(name: str) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    got = REGISTRY[name]["fn"](SF)
    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    return got


@pytest.mark.parametrize(
    "name",
    [
        "group_zscore_events",
        "stratified_sample_docs",
        "customer_urgent_order_stats",
        "parts_price_band_stats",
        "kmeans_embeddings",
    ],
)
def test_oracle_parity(ray_session, name):
    got, want = _norm(_run(name)), _norm(_oracle(name))
    pd.testing.assert_frame_equal(got, want, check_exact=False, atol=0, rtol=0)


def test_outer_join_zero_fills(ray_session):
    """Customers without urgent orders appear with n_urgent=0 — the rows an
    inner join would silently drop."""
    got = _run("customer_urgent_order_stats")
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/customer.parquet')"
    ).fetchone()[0]
    assert len(got) == n_cust
    zeros = got[got["n_urgent"] == 0]
    assert len(zeros) > 0
    assert (zeros["urgent_spend"] == 0.0).all()


def test_outer_join_paths_equivalent(ray_session, monkeypatch):
    """Forcing the Dataset.join LEFT OUTER path (broadcast cap 0) must
    produce exactly the rows of the broadcast-lookup path."""
    from raycrawl.ops import mlprep

    base = _norm(_run("customer_urgent_order_stats"))
    monkeypatch.setattr(mlprep, "OUTER_JOIN_BROADCAST_MAX", 0)
    joined = _norm(_run("customer_urgent_order_stats"))
    pd.testing.assert_frame_equal(base, joined)


def test_stratified_sample_caps_and_determinism(ray_session):
    from raycrawl.ops.mlprep import STRATUM_N

    got = _run("stratified_sample_docs")
    per = got.groupby("lang").size()
    assert (per <= STRATUM_N).all()
    again = _run("stratified_sample_docs")
    pd.testing.assert_frame_equal(
        _norm(got), _norm(again)
    )  # hash sampling: no RNG, no run-to-run drift


def test_price_bands_partition_all_parts(ray_session):
    got = _run("parts_price_band_stats")
    n_parts = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/part.parquet')"
    ).fetchone()[0]
    assert got["n_parts"].sum() == n_parts  # bands cover the price domain
    assert (got["band_lo"] < got["band_hi"]).all()


def test_kmeans_update_reduces_inertia(ray_session):
    """One Lloyd step must not increase mean distance-to-centroid: compare
    avg_dist under the updated centroids vs the init assignment."""
    import pyarrow.parquet as pq

    got = _run("kmeans_embeddings")
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    init = m[emb["vec_id"].to_numpy() < len(got)][: len(got)]
    d0 = np.sqrt(((m[:, None, :] - init[None, :, :]) ** 2).sum(2)).min(1)
    total_after = (got["avg_dist"] * got["n"]).sum()
    assert total_after <= d0.sum() + 1e-6
    assert got["n"].sum() == len(emb)
