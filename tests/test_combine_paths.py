"""Path equivalence for the small-aggregate fast path (combine_small):
forcing the Dataset.groupby fallback (as a 100-TB input would) must produce
the identical result the gated local combine produces."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _df(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_top_revenue_orders_paths_agree(ray_session, monkeypatch):
    from raycrawl.ops import queries as Q

    fast = _df(Q.REGISTRY["top_revenue_orders"]["fn"](SF))
    monkeypatch.setattr(Q, "table_num_rows", lambda sf, name: 10**12)
    slow = _df(Q.REGISTRY["top_revenue_orders"]["fn"](SF))
    # top-10 is ordered — compare as-is, not sorted
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )


def test_exact_dedup_docs_paths_agree(ray_session, monkeypatch):
    from raycrawl.ops import queries as Q

    fast = _norm(_df(Q.REGISTRY["exact_dedup_docs"]["fn"](SF)))
    monkeypatch.setattr(Q, "table_num_rows", lambda sf, name: 10**12)
    slow = _norm(_df(Q.REGISTRY["exact_dedup_docs"]["fn"](SF)))
    pd.testing.assert_frame_equal(fast, slow)


def test_exact_dedup_by_hash_paths_agree(ray_session, monkeypatch):
    from raycrawl.ops import dedup as D
    from raycrawl.ops.queries import REGISTRY

    fast = _norm(_df(REGISTRY["exact_dedup_by_hash"]["fn"](SF)))
    monkeypatch.setattr(D, "table_num_rows", lambda sf, name: 10**12)
    slow = _norm(_df(REGISTRY["exact_dedup_by_hash"]["fn"](SF)))
    pd.testing.assert_frame_equal(fast, slow)


def test_combine_small_empty_stream(ray_session):
    import pyarrow as pa
    import ray.data

    from raycrawl.ops.common import combine_small

    ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    out = combine_small(
        ds,
        lambda t: pa.TableGroupBy(t, "k")
        .aggregate([([], "count_all")])
        .rename_columns(["k", "n"]),
    )
    assert out.num_rows == 0
    assert out.column_names == ["k", "n"]


def test_union_find_min_label():
    from raycrawl.ops.dedup import _components_min_label

    comp = _components_min_label([(5, 9), (9, 2), (7, 8), (11, 2)])
    assert comp == {5: 2, 9: 2, 2: 2, 11: 2, 7: 7, 8: 7}


def test_minhash_cluster_distributed_components_equivalent(
    ray_session, monkeypatch
):
    from raycrawl.ops import dedup as D
    from raycrawl.ops.queries import REGISTRY

    fast = _norm(_df(REGISTRY["minhash_dedup_clusters"]["fn"](SF)))
    monkeypatch.setattr(D, "CLUSTER_DRIVER_PATH_MAX_PAIRS", -1)
    slow = _norm(_df(REGISTRY["minhash_dedup_clusters"]["fn"](SF)))
    pd.testing.assert_frame_equal(fast, slow)
    # survivors: exactly one keeper per cluster, keeper is the min doc_id
    keepers = fast[fast["keep"]]
    assert (keepers["doc_id"] == keepers["cluster_id"]).all()
    assert keepers["cluster_id"].is_unique
    assert set(fast["cluster_id"]) == set(keepers["doc_id"])


def test_minhash_candidates_join_tail_equivalent(ray_session, monkeypatch):
    """Above the pair-funnel gate the candidates op must produce the same
    verified pairs via bucketed pair-dedup + Dataset.join text fetch (no
    driver funnel) as the broadcast path does below it."""
    from raycrawl.ops import dedup as D
    from raycrawl.ops.common import PATH_LOG
    from raycrawl.ops.queries import REGISTRY

    monkeypatch.setattr(D, "LSH_DRIVER_PATH_MAX_BAND_ROWS", -1)
    fast = _norm(_df(REGISTRY["minhash_lsh_candidates"]["fn"](SF)))
    assert PATH_LOG["minhash_lsh_candidates"] == "distributed"
    monkeypatch.setattr(D, "LSH_PAIR_FUNNEL_MAX_PAIRS", -1)
    slow = _norm(_df(REGISTRY["minhash_lsh_candidates"]["fn"](SF)))
    assert PATH_LOG["minhash_lsh_candidates"] == "distributed+join"
    assert len(fast) > 0  # the fixture corpus has seeded near-dups
    pd.testing.assert_frame_equal(fast, slow)
