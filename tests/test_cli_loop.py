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


def test_cli_seeds_file(ray_session, tmp_path):
    """--seeds-file: messy seed spellings canonicalize on enqueue and the
    crawl matches the oracle run on the same (canonicalized) seeds."""
    import json
    import subprocess
    import sys

    from raycrawl.core.urltools import canonicalize_url
    from raycrawl.core.webgraph import WebConfig
    from raycrawl.oracle import oracle_crawl

    raw = ["http://H1.WEB.TEST/p/0", "http://h2.web.test:80/./p/3#frag"]
    sf = tmp_path / "seeds.txt"
    sf.write_text("# comment\n" + "\n".join(raw) + "\n")
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "raycrawl", "crawl", "--out", out,
         "--hosts", "5", "--pages-per-host", "10", "--max-epochs", "20",
         "--num-cpus", "4", "--seeds-file", str(sf)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    j = json.loads(r.stdout.strip().splitlines()[-1])
    web = WebConfig(n_hosts=5, pages_per_host=10)
    o = oracle_crawl(web, [canonicalize_url(u) for u in raw], max_epochs=20,
                     num_shards=4)
    assert j["payload_rows"] == sum(
        m["fetched"] for m in o.metrics.values()
    )


def test_cli_inject_and_follow_file(tmp_path):
    """Continuous-crawl CLI surfaces: --inject delivers a deterministic
    schedule; --follow-seeds-file injects pre-written complete lines and
    keeps the loop alive. Each is a separate process, as a user would
    run `ray job submit`."""
    # --inject: seed host 0 only, schedule host 1's root at epoch 2
    inj = tmp_path / "inj.json"
    inj.write_text(json.dumps({"2": ["http://h1.web.test/p/1"]}))
    c = _run("crawl", "--out", str(tmp_path / "ci"), "--hosts", "2",
             "--pages-per-host", "6", "--shards", "2", "--max-epochs",
             "15", "--epoch-seconds", "4", "--num-cpus", "4",
             "--seeds", "1", "--max-depth", "0",
             "--inject", str(inj))
    # seed fetch (maybe) + the injected page: depth cap kills expansion,
    # so any row beyond the seed's must come from the injection
    assert c["payload_rows"] >= 1
    assert sum(m["offered"] for m in c["metrics"]) >= 2

    # --follow-seeds-file: complete line injected, partial line ignored
    wf = tmp_path / "more.txt"
    wf.write_text("http://h1.web.test/p/2\nhttp://partial")
    f = _run("crawl", "--out", str(tmp_path / "cf"), "--hosts", "2",
             "--pages-per-host", "6", "--shards", "2", "--max-epochs",
             "8", "--epoch-seconds", "4", "--num-cpus", "4",
             "--seeds", "1", "--max-depth", "0",
             "--follow-seeds-file", str(wf),
             "--follow-idle-seconds", "0")  # virtual clock for the test
    # follow mode idles to max_epochs instead of exiting on exhaustion
    assert f["epochs"] == 8
    assert f["payload_rows"] >= 1
