"""Resumable partitioned sink: skip-committed semantics, crash cleanup,
and read-back equivalence."""

import os
import shutil

import pandas as pd
import pytest
import ray.data

from raycrawl.io.partsink import (
    committed_keys,
    read_partitioned,
    write_partitioned_resumable,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "sink")


def _events(ray_session):
    return ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "event_type", "value"]
    )


def test_full_write_then_resume_skips_everything(ray_session, out_dir):
    ds = _events(ray_session)
    r1 = write_partitioned_resumable(ds, out_dir, "event_type")
    assert sorted(r1["written"]) == sorted(committed_keys(out_dir, "event_type"))
    assert r1["skipped"] == []
    # resume over the identical input: nothing to write
    r2 = write_partitioned_resumable(_events(ray_session), out_dir, "event_type")
    assert r2["written"] == []
    assert sorted(r2["skipped"]) == sorted(r1["written"])
    # read-back equals the source
    got = (
        read_partitioned(out_dir, "event_type")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(f"{SF}/events.parquet",
                        columns=["event_id", "event_type", "value"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got["event_type"] = got["event_type"].astype(str)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_crashed_partition_is_rewritten(ray_session, out_dir):
    write_partitioned_resumable(_events(ray_session), out_dir, "event_type")
    keys = committed_keys(out_dir, "event_type")
    victim = sorted(keys)[0]
    vdir = os.path.join(out_dir, f"event_type={victim}")
    # simulate a crash: data present but no _SUCCESS, files truncated
    os.remove(os.path.join(vdir, "_SUCCESS"))
    for f in os.listdir(vdir):
        open(os.path.join(vdir, f), "w").close()  # corrupt leftovers
    r = write_partitioned_resumable(_events(ray_session), out_dir, "event_type")
    assert r["written"] == [victim]
    assert victim not in r["skipped"]
    got = read_partitioned(out_dir, "event_type").to_pandas()
    want = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    assert len(got) == len(want)


def test_integer_partition_column(ray_session, out_dir):
    ds = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda df: df.assign(bucket=df["o_custkey"] % 4), batch_format="pandas"
    )
    r = write_partitioned_resumable(ds, out_dir, "bucket")
    assert len(r["written"]) == 4
    total = read_partitioned(out_dir, "bucket").count()
    assert total == pd.read_parquet(f"{SF}/orders.parquet").shape[0]
