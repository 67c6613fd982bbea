"""Query-side fault tolerance: Ray Data retries tasks whose worker dies
mid-batch (the engine's answer to the reference's log-and-skip error
handling, PreprocessDump.py:205-211, which instead DROPS the rows).

The crawl engine's dead-letter path (fetch errors -> errors/ sidecar) is
covered by the parity suite; this covers the analytics surface: one task
hard-crashes its worker process on first attempt, Ray reschedules it, the
query's output is complete and identical to an undisturbed run.
"""

import os

import pandas as pd
import pyarrow as pa


def test_query_survives_worker_crash(ray_session, tmp_path):
    import ray.data

    marker = str(tmp_path / "crashed_once")
    sf = "/root/testdata/sf0.001"

    def summarize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.utf8_length(t["text"]),
            }
        )

    def crash_once(t: pa.Table, *, marker) -> pa.Table:
        if not os.path.exists(marker):
            # claim the marker BEFORE dying so exactly one attempt crashes
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)  # hard worker death, not a Python exception
        return t

    ds = (
        ray.data.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"])
        .map_batches(crash_once, fn_kwargs={"marker": marker},
                     batch_format="pyarrow")
        .map_batches(summarize, batch_format="pyarrow")
    )
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    want = (
        ray.data.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"])
        .map_batches(summarize, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert os.path.exists(marker), "the injected crash must have fired"
    pd.testing.assert_frame_equal(got, want)
