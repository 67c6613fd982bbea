"""Crawl driver: the epoch loop orchestrating frontier shards + Ray Data.

Reference analog: the crawler round loop (``pages/Crawler.py:54-153``) —
poll each topic, project/join, buffer, flush every ``saving_period = 10``
rounds, politeness-sleep. Re-expressed Ray-Data-first:

    per epoch:
      pop      — each FrontierShard actor selects its politeness-budgeted,
                 frontier-ordered URL batch (actor state: heap, buckets)
      fetch    — ``map_batches(FetchWorker)`` actor pool (IO-shaped stage)
      decode   — ``map_batches(DecodePhash)`` actor pool (CPU-shaped stage)
      gate     — ``groupby("shard").map_groups`` → the shard actor's phash
                 near-dup gate (per-shard ordered, replay-safe)
      sink     — ``write_parquet(out/payload/epoch=K)`` partitioned per
                 epoch → a failed run resumes by epoch directory
      links    — ``map_batches(ExplodeLinks)`` (stateless) →
                 ``groupby("shard").map_groups`` offer to shard actors =
                 the frontier-merge exchange (url→host→shard means all
                 duplicates of a URL land in one group: min-depth dedup
                 happens inside the group with no extra shuffle)
      checkpoint every ``saving_period`` epochs — Lance-style epoch dirs
                 (parquet fallback; see raycrawl.io.lancelike) with
                 per-partition lineage manifests.

The epoch working set is bounded by the politeness budget
(Σ_host burst ≈ hosts × 8), so the one ``materialize()`` per epoch pins a
small dataset only — the 100 TB payload stream goes straight to parquet.

Scale notes: shards = hash(host) % num_shards contains skew (one hot host
can at worst saturate its own shard's politeness budget, never the
cluster); all wide exchanges are keyed by the same shard key.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

import pyarrow as pa
import ray
import ray.data

from .core.urltools import canonicalize_url, url_sha1, host_of, shard_of_host
from .core.webgraph import WebConfig, priority_of
from .frontier.shard import FrontierShard
from .stages.fetch import FetchWorker, DecodePhash, ExplodeLinks

PAYLOAD_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "url", "url_hash", "shard", "epoch"]


@dataclass
class CrawlConfig:
    web: WebConfig = field(default_factory=WebConfig)
    out_dir: str = "/tmp/raycrawl"
    num_shards: int = 4
    epoch_seconds: float = 2.0
    phash_radius: int = 2
    max_epochs: int = 100
    saving_period: int = 10
    expected_urls: int = 1 << 14
    fetch_concurrency: int = 4
    decode_concurrency: int = 4
    batch_size: int = 128  # binary image rows → keep batches modest
    shard_num_cpus: float = 0.5
    keep_bytes_in_payload: bool = True


@dataclass
class CrawlStats:
    epochs: int = 0
    fetched: int = 0
    payload_rows: int = 0
    metrics: list[dict] = field(default_factory=list)
    out_dir: str = ""
    fetch_log: list[dict] = field(default_factory=list)
    seen: dict[int, set[bytes]] = field(default_factory=dict)


def _seed_tables(cfg: CrawlConfig, seeds: list[str]):
    """Canonicalize the (small, driver-side) seed list and bucket by shard."""
    per_shard: dict[int, list[tuple]] = {}
    for s in seeds:
        cu = canonicalize_url(s)
        d = url_sha1(cu)
        h = host_of(cu)
        sh = shard_of_host(h, cfg.num_shards)
        per_shard.setdefault(sh, []).append((cu, d, h, priority_of(d), 0))
    return per_shard


def make_shard_actors(cfg: CrawlConfig, restore_epoch: int | None = None):
    ckpt = os.path.join(cfg.out_dir, "checkpoints")
    if restore_epoch is None:
        Actor = ray.remote(num_cpus=cfg.shard_num_cpus)(FrontierShard)
        return [
            Actor.remote(s, cfg.epoch_seconds, cfg.expected_urls, cfg.phash_radius)
            for s in range(cfg.num_shards)
        ]
    # restore runs inside each actor process so state is read once, in place
    RestActor = ray.remote(num_cpus=cfg.shard_num_cpus)(_RestoredShard)
    return [
        RestActor.remote(ckpt, restore_epoch, s, cfg.expected_urls, cfg.phash_radius)
        for s in range(cfg.num_shards)
    ]


class _RestoredShard(FrontierShard):
    def __init__(self, ckpt_dir, epoch, shard_id, expected_urls, phash_radius):
        restored = FrontierShard.restore(ckpt_dir, epoch, shard_id, expected_urls, phash_radius)
        self.__dict__.update(restored.__dict__)


def latest_checkpoint_epoch(out_dir: str) -> int | None:
    ckpt = os.path.join(out_dir, "checkpoints")
    if not os.path.isdir(ckpt):
        return None
    epochs = [
        int(d.split("=")[1])
        for d in os.listdir(ckpt)
        if d.startswith("epoch=") and os.path.exists(os.path.join(ckpt, d, "COMPLETE"))
    ]
    return max(epochs) if epochs else None


def run_crawl(cfg: CrawlConfig, seeds: list[str], resume: bool = False) -> CrawlStats:
    """Run the crawl to frontier exhaustion (or ``max_epochs``).

    ``resume=True`` restarts from the latest complete checkpoint: shard
    state is restored inside the actors, payload directories for epochs
    after the checkpoint are discarded (they may be partial), finished
    epoch directories are skipped — the resumable-output contract.
    """
    payload_dir = os.path.join(cfg.out_dir, "payload")
    ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
    start_epoch = 0
    if resume:
        last = latest_checkpoint_epoch(cfg.out_dir)
        if last is None:
            resume = False
        else:
            start_epoch = last + 1
            if os.path.isdir(payload_dir):
                for d in os.listdir(payload_dir):
                    if d.startswith("epoch=") and int(d.split("=")[1]) >= start_epoch:
                        shutil.rmtree(os.path.join(payload_dir, d))
    if not resume:
        if os.path.isdir(cfg.out_dir):
            shutil.rmtree(cfg.out_dir)
        os.makedirs(payload_dir, exist_ok=True)

    actors = make_shard_actors(cfg, restore_epoch=(start_epoch - 1) if resume else None)
    if not resume:
        for sh, rows in _seed_tables(cfg, seeds).items():
            ray.get(
                actors[sh].offer.remote(
                    -1,
                    [r[0] for r in rows],
                    [r[1] for r in rows],
                    [r[2] for r in rows],
                    [r[3] for r in rows],
                    [r[4] for r in rows],
                    0,
                )
            )

    stats = CrawlStats(out_dir=cfg.out_dir)
    num_shards = cfg.num_shards
    epoch = start_epoch
    while epoch < cfg.max_epochs:
        counts = ray.get([a.pop.remote(epoch) for a in actors])
        if sum(counts) == 0:
            break
        ds = ray.data.from_arrow_refs([a.take_popped.remote() for a in actors])
        fetched = ds.map_batches(
            FetchWorker,
            fn_constructor_args=(cfg.web,),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.fetch_concurrency,
        ).map_batches(
            DecodePhash,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.decode_concurrency,
        )

        def gate_group(tbl: pa.Table, _actors=actors, _epoch=epoch) -> pa.Table:
            if tbl.num_rows == 0:
                return tbl
            shard = tbl["shard"][0].as_py()
            meta = list(
                zip(
                    tbl["url"].to_pylist(),
                    tbl["host"].to_pylist(),
                    tbl["priority"].to_pylist(),
                    tbl["depth"].to_pylist(),
                    tbl["discovered_at"].to_pylist(),
                )
            )
            digests = tbl["url_hash"].to_pylist()
            kept = ray.get(
                _actors[shard].gate.remote(
                    _epoch, digests, tbl["phash"].to_pylist(), meta
                )
            )
            mask = pa.array([d in kept for d in digests])
            return tbl.filter(mask)

        gated = fetched.groupby("shard").map_groups(gate_group, batch_format="pyarrow")
        # bounded epoch working set (politeness budget) → safe to pin
        mat = gated.materialize()
        n_kept = mat.count()
        if n_kept:
            payload = mat.drop_columns(["outlinks", "host", "priority", "depth",
                                        "discovered_at"])
            payload = payload.map_batches(
                lambda t, e=epoch: t.append_column(
                    "epoch", pa.array([e] * t.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
            if not cfg.keep_bytes_in_payload:
                payload = payload.drop_columns(["bytes"])
            payload.write_parquet(os.path.join(payload_dir, f"epoch={epoch}"))
            stats.payload_rows += n_kept

            links = mat.select_columns(["url", "depth", "outlinks"]).map_batches(
                ExplodeLinks(num_shards),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
            )

            def offer_group(tbl: pa.Table, _actors=actors, _epoch=epoch) -> pa.Table:
                if tbl.num_rows == 0:
                    return pa.table({"shard": pa.array([], pa.int32()),
                                     "accepted": pa.array([], pa.int64())})
                shard = tbl["shard"][0].as_py()
                # all duplicates of a URL land in this group → min-depth dedup here
                best: dict[str, tuple] = {}
                for url, dg, host, pri, depth in zip(
                    tbl["url"].to_pylist(),
                    tbl["url_hash"].to_pylist(),
                    tbl["host"].to_pylist(),
                    tbl["priority"].to_pylist(),
                    tbl["depth"].to_pylist(),
                ):
                    if url not in best or depth < best[url][3]:
                        best[url] = (dg, host, pri, depth)
                urls = sorted(best)
                acc = ray.get(
                    _actors[shard].offer.remote(
                        _epoch,
                        urls,
                        [best[u][0] for u in urls],
                        [best[u][1] for u in urls],
                        [best[u][2] for u in urls],
                        [best[u][3] for u in urls],
                        _epoch + 1,
                    )
                )
                return pa.table({"shard": pa.array([shard], pa.int32()),
                                 "accepted": pa.array([acc], pa.int64())})

            links.groupby("shard").map_groups(
                offer_group, batch_format="pyarrow"
            ).count()  # consume → offers execute
        stats.fetched += sum(counts)

        if (epoch + 1) % cfg.saving_period == 0:
            _checkpoint_all(actors, ckpt_dir, epoch)
        epoch += 1

    _checkpoint_all(actors, ckpt_dir, epoch - 1 if epoch > start_epoch else start_epoch)
    stats.epochs = epoch
    stats.metrics = ray.get([a.get_metrics.remote() for a in actors])
    stats.fetch_log = collect_fetch_log(actors)
    stats.seen = {
        s: set(ray.get(a.get_seen.remote())) for s, a in enumerate(actors)
    }
    for a in actors:
        ray.kill(a)
    return stats


def _checkpoint_all(actors, ckpt_dir: str, epoch: int) -> None:
    if epoch < 0:
        return
    ray.get([a.checkpoint.remote(ckpt_dir, epoch) for a in actors])
    d = os.path.join(ckpt_dir, f"epoch={epoch}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "COMPLETE"), "w") as f:
        json.dump({"epoch": epoch, "shards": len(actors)}, f)


def read_payload(out_dir: str):
    """The crawl's output payload as a Dataset (all epochs)."""
    return ray.data.read_parquet(os.path.join(out_dir, "payload"))


def collect_fetch_log(actors_or_stats, out_dir: str | None = None) -> list[dict]:
    """Merge per-shard fetch logs (from live actors) into oracle log order."""
    if out_dir is not None:
        raise NotImplementedError
    logs: list[dict] = []
    for a in actors_or_stats:
        logs.extend(ray.get(a.get_log.remote()))
    logs.sort(key=lambda r: (r["epoch"], -r["priority"], r["depth"],
                             r["discovered_at"], r["url_hash"]))
    return logs
