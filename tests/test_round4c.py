"""Round-4 operator batch: blocked edit-distance near-dups, brand
association rules (support/confidence/lift), and binned two-sample KS
drift — oracle parity, branch equivalence for the adaptive gate, and a
unit check of the vectorized Levenshtein DP against the textbook one."""

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import norm, oracle, run_query

SF = "/root/testdata/sf0.001"

NEW_OPS = [
    "caption_edit_distance_neardups",
    "brand_association_rules",
    "event_value_ks_drift",
]


@pytest.mark.parametrize("name", NEW_OPS)
def test_new_ops_match_oracle(ray_session, name):
    got, want = norm(run_query(name, SF)), norm(oracle(name, SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_association_rules_join_branch(ray_session):
    """Forcing the broadcast gate shut must route through Dataset.join and
    produce the identical rule table."""
    from raycrawl.ops.common import PATH_LOG
    from raycrawl.ops.relops4 import brand_association_rules

    PATH_LOG.clear()
    got = norm(brand_association_rules(SF, part_broadcast_max=0).to_pandas())
    assert PATH_LOG.get("brand_association_rules") == "join"
    want = norm(oracle("brand_association_rules", SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _lev_reference(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a):
        cur = [i + 1]
        for j, cb in enumerate(b):
            cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                           prev[j] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_matches_reference():
    from raycrawl.ops.relops4 import _codepoints, _levenshtein

    rng = np.random.default_rng(7)
    alpha = "abcde"
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting")]
    for _ in range(60):
        la, lb = rng.integers(0, 12, size=2)
        a = "".join(rng.choice(list(alpha), size=la))
        b = "".join(rng.choice(list(alpha), size=lb))
        cases.append((a, b))
    for a, b in cases:
        assert _levenshtein(_codepoints(a), _codepoints(b)) == \
            _lev_reference(a, b), (a, b)


def test_ks_drift_detects_planted_shift(ray_session, tmp_path):
    """A synthetic events table whose late half is shifted by +10 must
    produce a large KS stat, and an unshifted type a near-zero one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raycrawl.ops.relops4 import event_value_ks_drift

    rng = np.random.default_rng(3)
    n = 4000
    ts = pa.array(
        (np.arange(n, dtype=np.int64)
         + np.datetime64("2024-01-01", "us").astype(np.int64))
        .view("datetime64[us]")
    )
    half = np.arange(n) >= n // 2
    shifted = rng.normal(0, 1, n) + np.where(half, 10.0, 0.0)
    stable = rng.normal(0, 1, n)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(2 * n)),
            "ts": pa.concat_arrays([ts, ts]),
            "user_id": pa.array(np.zeros(2 * n, dtype=np.int64)),
            "event_type": pa.array(["shifted"] * n + ["stable"] * n),
            "value": pa.array(np.concatenate([shifted, stable])),
            "props": pa.array([""] * (2 * n)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = event_value_ks_drift(str(tmp_path)).to_pandas()
    ks = dict(zip(out["event_type"], out["ks_stat"]))
    assert ks["shifted"] > 0.9
    assert ks["stable"] < 0.1
    assert (out["n_early"] + out["n_late"]).tolist() == [n, n]
