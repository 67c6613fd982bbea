"""The tier-crawl feedback loop end-to-end through the CLI (the
`ray job submit` surface): crawl → tier-feedback (boost map) →
boosted re-crawl under a pop budget. Each step is its own process
with its own Ray session, exactly as a user would run it."""

import json
import os
import subprocess
import sys


def _run(*argv):
    out = subprocess.run(
        [sys.executable, "-m", "raycrawl", *argv],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_tier_feedback_loop(tmp_path):
    # --phash-radius -1: suppression gates outlink discovery, so
    # coverage equality across DIFFERENT schedules (plain vs boosted)
    # only holds with the near-dup gate off
    c1 = _run("crawl", "--out", str(tmp_path / "c1"), "--hosts", "6",
              "--pages-per-host", "8", "--shards", "2", "--max-epochs",
              "20", "--epoch-seconds", "4", "--num-cpus", "4",
              "--phash-radius", "-1")
    assert c1["payload_rows"] > 0

    boosts_file = str(tmp_path / "boosts.json")
    fb = _run("tier-feedback", str(tmp_path / "c1"), "--boosts-out",
              boosts_file, "--num-cpus", "4")
    with open(boosts_file) as f:
        boosts = json.load(f)
    assert boosts and set(boosts.values()) <= {0, 1, 2, 3}
    # quartile tiers: highest-mean-area host gets the biggest boost
    hosts = sorted(fb["hosts"], key=lambda r: (-r["mean_area"], r["host"]))
    assert hosts[0]["boost"] == max(boosts.values())

    c2 = _run("crawl", "--out", str(tmp_path / "c2"), "--hosts", "6",
              "--pages-per-host", "8", "--shards", "2", "--max-epochs",
              "20", "--epoch-seconds", "4", "--num-cpus", "4",
              "--phash-radius", "-1",
              "--host-boosts", boosts_file, "--pop-budget", "4")
    # boosts + budget change the schedule, never the coverage of an
    # exhaustive crawl: same number of pages fetched
    assert c2["payload_rows"] == c1["payload_rows"]
