"""Shared helpers for the analytics operators over the testdata tables."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read (only requested columns leave storage)."""
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def table_num_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footers only — zero data read. Used to gate
    the small-aggregate fast path (``combine_small``) without an extra
    counting pass over the stream."""
    import pyarrow.dataset as pads

    return pads.dataset(f"{sf_dir}/{name}.parquet").count_rows()


# Gate for combine_small on UNBOUNDED-cardinality keys: below this many
# input rows the partial stream is guaranteed small enough for one final
# combine; above it the query must use Dataset.groupby (all-to-all hash
# shuffle). Fixed-cardinality keys (≤ a few hundred distinct values) can
# skip the gate: their partial output is ≤ keys × blocks rows at ANY scale.
SMALL_COMBINE_ROWS = 2_000_000


def combine_small(partials: ray.data.Dataset, combine_fn) -> pa.Table:
    """Final combine for a BOUNDED map-side partial-aggregate stream.

    Ray Data's groupby is a sort-based all-to-all exchange with a ~2-4 s
    fixed cost on this node — pure overhead when the map-side combiner has
    already collapsed the stream to ≲2M tiny rows. This helper instead
    pulls the partial blocks zero-copy off the object store
    (``to_arrow_refs``: the map_batches tasks still ran distributed; only
    their ALREADY-AGGREGATED outputs move) and runs the final combine as
    one local Arrow kernel.

    Scale contract: callers MUST bound the partial stream first — either
    the group key has fixed small cardinality (partial rows ≤ keys ×
    blocks), or the caller gates on ``table_num_rows() <=
    SMALL_COMBINE_ROWS`` and falls back to ``Dataset.groupby`` beyond it
    (path-equivalence tested). At 100 TB with billions of keys the gate
    routes to the shuffle; with fixed keys the combine input stays ≤ a few
    rows per input block, which a tree of per-block combiners already
    collapsed once.
    """
    import pandas as pd

    # Pull block refs straight off the ref-bundle iterator — ONE
    # execution. (`Dataset.to_arrow_refs` in Ray 2.49 calls
    # `schema(fetch_if_missing=True)` after consuming, which re-executes
    # the whole un-materialized lineage — shuffles included — a second
    # time; measured as a full duplicate pipeline run with
    # `LimitOperator[limit=1]` on every combine_small-terminated op.)
    # `iter_internal_ref_bundles` is a Ray developer API: guard it so a Ray
    # upgrade that drops/renames it fails over to a safe path (materialize
    # first, so to_arrow_refs' schema fetch cannot re-execute the lineage)
    # instead of changing execution behavior silently.
    if hasattr(partials, "iter_internal_ref_bundles"):
        refs = [
            br
            for bundle in partials.iter_internal_ref_bundles()
            for br in bundle.block_refs
        ]
    else:  # pragma: no cover - exercised only on a future Ray upgrade
        refs = list(partials.materialize().to_arrow_refs())
    all_blocks = ray.get(refs)
    # Raw block refs: a pandas-block stage upstream (e.g.
    # bucketed_group_agg's map_groups) can leak EMPTY pandas blocks
    # through a pyarrow map_batches — Ray skips the UDF on empty blocks,
    # so they arrive here unconverted. Normalize them.
    all_blocks = [
        pa.Table.from_pandas(b, preserve_index=False)
        if isinstance(b, pd.DataFrame) else b
        for b in all_blocks
    ]
    blocks = [b for b in all_blocks if b.num_rows]
    if not blocks:
        carriers = [b for b in all_blocks if b.num_columns]
        if carriers:  # empty blocks still carry the partial schema
            return combine_fn(carriers[0])
        sch = partials.schema()
        base = getattr(sch, "base_schema", None) or pa.schema([])
        return combine_fn(base.empty_table())
    return combine_fn(pa.concat_tables(blocks, promote_options="default"))


def md5_u64_le(s: str) -> int:
    """Little-endian first-8-bytes of md5 — THE oracle-load-bearing hash
    convention (== DuckDB ``md5_number_upper``). Single definition shared
    by hash sampling, stratified sampling, shingling, simhash and the
    quantile bin keys so the byte order can never silently diverge."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def round_half_away(x, nd: int):
    """Round half AWAY from zero, element-wise — DuckDB ROUND's tie rule
    (verified on DOUBLE: 0.5→1, 2.5→3, -2.5→-3). numpy/Python round are
    half-to-even, which diverges from every SQL oracle on exact .5
    boundaries; any float destined for a ROUND()-compared column must go
    through this."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** nd
    return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)


def round_cols(ds: ray.data.Dataset, spec: dict[str, int]) -> ray.data.Dataset:
    """Round float columns to fixed decimals so Ray and DuckDB value-hashes
    agree despite summation-order float jitter."""

    def _round(t: pa.Table) -> pa.Table:
        for col, nd in spec.items():
            if col in t.column_names:
                i = t.column_names.index(col)
                t = t.set_column(
                    i, col, pc.round(pc.cast(t[col], pa.float64()), ndigits=nd)
                )
        return t

    return ds.map_batches(_round, batch_format="pyarrow")


def cast_cols(ds: ray.data.Dataset, spec: dict[str, pa.DataType]) -> ray.data.Dataset:
    def _cast(t: pa.Table) -> pa.Table:
        for col, typ in spec.items():
            if col in t.column_names:
                i = t.column_names.index(col)
                t = t.set_column(i, col, pc.cast(t[col], typ))
        return t

    return ds.map_batches(_cast, batch_format="pyarrow")


# Which adaptive branch each gated operator took on its last run
# ("driver"/"broadcast"/"combine_small" vs "distributed"/"join"/"groupby").
# Written by note_path() at the branch point; read by the scale smoke
# (tools/scale_smoke.py) to PROVE the distributed branches run on real
# over-gate data, not only under monkeypatched thresholds.
PATH_LOG: dict[str, str] = {}


def note_path(op: str, path: str) -> None:
    PATH_LOG[op] = path


def join_partitions(cap_per_node: int = 16, divisor: int = 4, floor: int = 4) -> int:
    """Partition count for ``Dataset.join``: every partition spins a
    hash-shuffle aggregator actor whose startup + memory churn dominates
    small/medium joins — measured on this node (32 CPUs, 600k⋈150k rows):
    8 partitions → 8.7 s, 16 → 10.8 s, 32 → 24.5 s; and on a 4-CPU node
    32 partitions took >2 min vs ~6 s properly sized. So: CPUs/divisor,
    clamped to [floor, cap]. The cap scales with ALIVE NODE COUNT so a
    multi-node cluster spreads aggregators across nodes instead of
    serializing the shuffle through a single-node-sized pool; the
    single-node numbers above set cap_per_node. Every ``Dataset.join``
    in this repo must size ``num_partitions`` through this helper (a
    grep-based pytest enforces it)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    try:
        nodes = sum(1 for n in ray.nodes() if n.get("Alive"))
    except Exception:  # pragma: no cover - nodes() needs an initialized Ray
        nodes = 1
    cap = cap_per_node * max(1, nodes)
    return max(floor, min(cap, cpus // divisor))


# Target rows per bucket for bucketed_group_agg: small enough that one
# bucket's pandas aggregate fits comfortably in a worker heap, large enough
# that per-group Python-call overhead is amortized ~100k×.
BUCKET_TARGET_ROWS = 2_000_000


def group_buckets(approx_rows: int | None = None) -> int:
    """Bucket count for ``bucketed_group_agg``: at least 8 buckets per
    cluster CPU (parallelism), grown so no bucket exceeds
    ``BUCKET_TARGET_ROWS`` when the caller knows the input size."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    k = 8 * max(1, cpus)
    if approx_rows:
        k = max(k, approx_rows // BUCKET_TARGET_ROWS + 1)
    return k


def bucketed_group_agg(
    ds: ray.data.Dataset,
    key_cols: list[str],
    bucket_fn,
    n_buckets: int | None = None,
    approx_rows: int | None = None,
) -> ray.data.Dataset:
    """HIGH-CARDINALITY groupby: shuffle on a small deterministic bucket of
    the key instead of the key itself, then aggregate each bucket with ONE
    vectorized pandas call.

    Why: Ray Data's ``groupby(key).aggregate(...)`` reduce phase walks
    per-key group boundaries in interpreter-level Python, so its wall time
    scales with DISTINCT KEY COUNT — measured on this node: 4M near-unique
    int64 keys took 33.2 s (and 33M keys ran >15 min without finishing),
    while this bucketed shape did the same work in 1.7 s (39 s at 33M).
    For low-cardinality keys (≤ ~100k groups) plain aggregate is fine and
    simpler — this helper is for dedup-style keys with ~1 row per key.

    ``bucket_fn`` receives ALL rows of one bucket as a pandas DataFrame
    (every row of a key lands in exactly one bucket, so any per-key
    aggregate is computable) and returns its aggregated frame. Buckets are
    ``pd.util.hash_pandas_object`` over the key columns (deterministic,
    content-based) mod ``n_buckets``; n_buckets defaults to 8× cluster
    CPUs grown so a bucket stays under ~2M rows when ``approx_rows`` is
    given — at 100 TB pass the known input row count so bucket size, not
    bucket count, stays constant."""
    import pandas as pd

    k = n_buckets or group_buckets(approx_rows)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        if not len(df):
            # an empty upstream block can arrive schema-less — emit an
            # empty bucketed frame instead of KeyError'ing on key_cols
            df["_bucket"] = pd.Series([], dtype="int64")
            return df
        df["_bucket"] = (
            pd.util.hash_pandas_object(df[key_cols], index=False).to_numpy()
            % np.uint64(k)
        ).astype(np.int64)
        return df

    def run_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(run_bucket, batch_format="pandas")
    )


def table_spread(
    sf_dir: str, name: str, columns: list[str] | None = None,
    factor: int = 2,
) -> ray.data.Dataset:
    """Column-pruned read for a PER-ROW-EXPENSIVE downstream stage (image
    decode/encode, per-doc shingling): a single-file single-row-group
    parquet arrives as ONE block, which would serialize the whole stage
    behind one task — measured 3.9 s vs 0.9 s for the sf0.1 image ops.
    When the reader yields fewer blocks than the cluster wants, insert a
    metadata-only ``repartition`` (moves just the pruned key columns —
    payload bytes don't exist yet). At scale the input is many files
    (the smoke's 410-part directory, any real corpus) and this is a
    no-op — gated on the FILE count so no execution is triggered."""
    import pyarrow.dataset as pads

    ds = table(sf_dir, name, columns)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    target = max(8, cpus * factor)
    try:
        n_files = len(pads.dataset(f"{sf_dir}/{name}.parquet").files)
    except Exception:  # pragma: no cover - exotic datasource
        return ds
    if n_files >= target:
        return ds
    return ds.repartition(target)


def pool_size(divisor: int = 4, floor: int = 2) -> int:
    """FIXED actor-pool size for stateful ``map_batches`` stages.

    Measured at sf0.1 (32 cpus, image feature extract): autoscaling
    ``concurrency=(1, 8)`` ramps from one actor and finished in 3.9 s;
    the same stage with a FIXED pool of 8 took 1.75 s. And a fixed pool
    sized to ALL cpus (32/32) wedged the pipeline past a 10-minute
    timeout — the actors reserve every CPU slot and the upstream build
    tasks starve. So: cpus/divisor (cluster-wide CPU count, so the pool
    grows with nodes), floored, never the whole machine."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(floor, cpus // divisor)
