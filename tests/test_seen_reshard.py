"""Exact seen-set redistribution: checkpoints carry a u32
host_shard_key per seen digest, so `reshard_checkpoint` partitions the
seen set by host ownership (key % new_n — the same mod shard_of_host
applies) instead of union-replicating it onto every new shard.
Pre-hostkey checkpoints (no `seen_hostkeys` array in sketches.npz)
must still work via the union fallback, and merged checkpoints must
keep the keys so a later reshard of a merged crawl stays exact."""

import json
import os

import numpy as np
import pyarrow.parquet as pq

from raycrawl.core.urltools import shard_of_host
from raycrawl.core.webgraph import WebConfig, seed_urls

WEB = WebConfig(n_hosts=6, pages_per_host=12, neardup_every=1)


def _run(out, seeds, num_shards=3, max_epochs=4, resume=False):
    from raycrawl.crawler import CrawlConfig, run_crawl

    return run_crawl(
        CrawlConfig(web=WEB, out_dir=out, num_shards=num_shards,
                    max_epochs=max_epochs, saving_period=3,
                    collect_parity_outputs=True),
        seeds, resume=resume,
    )


def _shard_seen(out, epoch):
    """{shard_id: set(seen digests)} from a checkpoint epoch."""
    d = os.path.join(out, "checkpoints", f"epoch={epoch}")
    res = {}
    for sh in os.listdir(d):
        if not sh.startswith("shard="):
            continue
        with open(os.path.join(d, sh, "exact_seen.bin"), "rb") as f:
            raw = f.read()
        res[int(sh.split("=")[1])] = {
            raw[i: i + 20] for i in range(0, len(raw), 20)
        }
    return res


def _digest_hosts(out, stats, epoch):
    """digest → host for every seen digest of a checkpointed crawl:
    merged offers are either logged (fetched / error / denied) or still
    sitting in the frontier — both records carry the host."""
    hosts = {}
    for r in stats.fetch_log:
        hosts[bytes.fromhex(r["url_hash"])] = r["host"]
    d = os.path.join(out, "checkpoints", f"epoch={epoch}")
    for sh in os.listdir(d):
        if not sh.startswith("shard="):
            continue
        fr = pq.read_table(os.path.join(d, sh, "frontier.parquet"))
        for dg, h in zip(fr["url_hash"].to_pylist(),
                         fr["host"].to_pylist()):
            hosts[dg] = h
    return hosts


def test_reshard_seen_exact_partition(ray_session, tmp_path):
    """Resharding 3→5 shards hands each new shard EXACTLY its own
    hosts' seen digests: pairwise disjoint, union-preserving, and every
    digest lands on shard_of_host(host, 5)."""
    from raycrawl.frontier.merge import _latest_epoch, reshard_checkpoint

    src = str(tmp_path / "src")
    stats = _run(src, seed_urls(WEB))
    epoch = _latest_epoch(src)
    src_seen = _shard_seen(src, epoch)
    union = set().union(*src_seen.values())
    hosts = _digest_hosts(src, stats, epoch)
    assert set(hosts) >= union  # every seen digest is host-attributable

    out = str(tmp_path / "out")
    summary = reshard_checkpoint(src, out, 5)
    assert summary["seen_count"] == len(union)
    new_seen = _shard_seen(out, 0)
    assert len(new_seen) == 5
    got_union = set()
    for sid, s in new_seen.items():
        assert not (got_union & s)  # pairwise disjoint
        got_union |= s
        assert s == {d for d in union if shard_of_host(hosts[d], 5) == sid}
    assert got_union == union
    for sid in range(5):
        with open(os.path.join(out, "checkpoints", "epoch=0",
                               f"shard={sid}", "manifest.json")) as f:
            assert (json.load(f)["resharded_from"]["seen_ownership"]
                    == "exact")


def test_reshard_seen_union_fallback_pre_hostkey(ray_session, tmp_path):
    """A source checkpoint WITHOUT seen_hostkeys (older layout) must
    reshard via union replication — every new shard gets the whole
    seen set and the manifest records the fallback."""
    from raycrawl.frontier.merge import _latest_epoch, reshard_checkpoint

    src = str(tmp_path / "src")
    _run(src, seed_urls(WEB))
    epoch = _latest_epoch(src)
    # strip the hostkey arrays in place (simulates a pre-hostkey run)
    d = os.path.join(src, "checkpoints", f"epoch={epoch}")
    for sh in os.listdir(d):
        if not sh.startswith("shard="):
            continue
        p = os.path.join(d, sh, "sketches.npz")
        npz = dict(np.load(p))
        npz.pop("seen_hostkeys", None)
        np.savez_compressed(p, **npz)
    union = set().union(*_shard_seen(src, epoch).values())

    out = str(tmp_path / "out")
    reshard_checkpoint(src, out, 4)
    for sid, s in _shard_seen(out, 0).items():
        assert s == union  # replicated, not partitioned
        with open(os.path.join(out, "checkpoints", "epoch=0",
                               f"shard={sid}", "manifest.json")) as f:
            assert (json.load(f)["resharded_from"]["seen_ownership"]
                    == "union_fallback")
    # and the fallback shards poison THEIR next checkpoint too: resume
    # one epoch, then reshard the resumed dir — still union_fallback
    # (keys for the pre-existing digests are unrecoverable)
    _run(out, [], num_shards=4, max_epochs=1, resume=True)
    out2 = str(tmp_path / "out2")
    reshard_checkpoint(out, out2, 2)
    with open(os.path.join(out2, "checkpoints", "epoch=0", "shard=0",
                           "manifest.json")) as f:
        assert (json.load(f)["resharded_from"]["seen_ownership"]
                == "union_fallback")


def test_merge_preserves_hostkeys_for_exact_reshard(ray_session, tmp_path):
    """Merging two crawls keeps the per-digest host keys, so resharding
    the MERGED checkpoint still partitions the seen set exactly."""
    from raycrawl.frontier.merge import merge_checkpoints, reshard_checkpoint

    seeds = seed_urls(WEB)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    sa = _run(a, seeds[:3])
    sb = _run(b, seeds[3:])
    m = str(tmp_path / "m")
    merge_checkpoints(a, b, m)

    out = str(tmp_path / "out")
    reshard_checkpoint(m, out, 4)
    merged_seen = _shard_seen(m, 0)
    union = set().union(*merged_seen.values())
    from raycrawl.frontier.merge import _latest_epoch
    hosts = {**_digest_hosts(a, sa, _latest_epoch(a)),
             **_digest_hosts(b, sb, _latest_epoch(b))}
    new_seen = _shard_seen(out, 0)
    assert set().union(*new_seen.values()) == union
    for sid, s in new_seen.items():
        assert s == {d for d in union if shard_of_host(hosts[d], 4) == sid}
        with open(os.path.join(out, "checkpoints", "epoch=0",
                               f"shard={sid}", "manifest.json")) as f:
            assert (json.load(f)["resharded_from"]["seen_ownership"]
                    == "exact")


def test_reshard_merged_phash_exact_via_source_payloads(
    ray_session, tmp_path
):
    """A merged checkpoint has no payload tree of its own, so exact phash
    redistribution must chase the merged_from chain to the SOURCE payload
    trees (merge.py records merged_from + merged_from_epochs). Each new
    shard's phash index must hold exactly the phashes of the payload pages
    whose host it owns."""
    import glob

    import pyarrow.dataset as pads

    from raycrawl.core.urltools import host_of
    from raycrawl.frontier.merge import merge_checkpoints, reshard_checkpoint

    seeds = seed_urls(WEB)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _run(a, seeds[:3])
    _run(b, seeds[3:])
    m, out = str(tmp_path / "m"), str(tmp_path / "out")
    merge_checkpoints(a, b, m)
    reshard_checkpoint(m, out, 4)

    # expected ownership straight from the two source payload sidecars
    want: dict[int, list] = {sid: [] for sid in range(4)}
    for src in (a, b):
        fs = glob.glob(os.path.join(src, "payload", "epoch=*", "*.parquet"))
        t = pads.dataset(fs).to_table(columns=["url", "phash"])
        for u, ph in zip(t["url"].to_pylist(), t["phash"].to_pylist()):
            want[shard_of_host(host_of(u), 4)].append(ph & (2**64 - 1))

    for sid in range(4):
        d = os.path.join(out, "checkpoints", "epoch=0", f"shard={sid}")
        with open(os.path.join(d, "manifest.json")) as f:
            assert (json.load(f)["resharded_from"]["phash_ownership"]
                    == "exact")
        got = sorted(
            int(x) for x in np.load(os.path.join(d, "sketches.npz"))["phash"]
        )
        assert got == sorted(want[sid])
