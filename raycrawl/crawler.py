"""Crawl driver: the epoch loop orchestrating frontier shards + Ray Data.

Reference analog: the crawler round loop (``pages/Crawler.py:54-153``) —
poll each topic, project/join, buffer, flush every ``saving_period = 10``
rounds, politeness-sleep. Re-expressed Ray-Data-first:

    per epoch (ONE consumed Ray Data pipeline):
      pop      — each FrontierShard actor merges its pending link buffer
                 (deterministic sorted-URL, min-depth) then selects its
                 politeness-budgeted, frontier-ordered URL batch
      fetch    — ``map_batches(fetch_batch)`` stateless tasks whose
                 per-process state is cached across epochs (see
                 stages/fetch.py — avoids per-epoch actor-pool spin-up)
      decode   — ``map_batches(decode_batch)`` ditto (CPU-shaped stage)
      gate+emit— ``groupby("shard").map_groups``: the group task asks its
                 shard actor to phash-gate (ordered, replay-safe memo),
                 extracts + canonicalizes the survivors' outlinks, pushes
                 them to the TARGET shards' pending buffers (the
                 frontier-merge exchange — arrival order is irrelevant
                 because the merge at the next pop is a data property),
                 and emits the payload rows
      sink     — the same pipeline streams into
                 ``write_parquet(out/payload/epoch=K)`` → a failed run
                 resumes by epoch directory
      checkpoint every ``saving_period`` epochs — Lance-style epoch dirs
                 (parquet fallback) with per-partition lineage manifests.

The epoch working set is bounded by the politeness budget
(Σ_host burst ≈ hosts × 8); the payload stream never materializes on the
driver — it flows block-by-block into partitioned parquet.

Scale notes: shard = hash(host) % num_shards contains skew (one hot host
can at worst saturate its own shard's politeness budget, never the
cluster); the only wide exchange per epoch is the groupby(shard) of the
popped batch, keyed the same way as every piece of shard state.
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
from .stages.fetch import fetch_batch, decode_batch

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
    keep_bytes = cfg.keep_bytes_in_payload
    epoch = start_epoch
    while epoch < cfg.max_epochs:
        counts = ray.get([a.pop.remote(epoch) for a in actors])
        if sum(counts) == 0:
            if sum(ray.get([a.frontier_size.remote() for a in actors])) == 0:
                break
            epoch += 1  # all hosts throttled this epoch; refill and retry
            continue
        ds = ray.data.from_arrow_refs([a.take_popped.remote() for a in actors])
        fetched = ds.map_batches(
            fetch_batch,
            fn_kwargs={"web_cfg": cfg.web},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        ).map_batches(
            decode_batch,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

        # ONE consumed pipeline per epoch: the per-shard group task asks its
        # shard actor to phash-gate (ordered), extracts+canonicalizes the
        # surviving rows' outlinks, pushes them to the target shards'
        # pending buffers (merged deterministically at the next pop), and
        # emits the payload rows — which stream straight to parquet.
        gated = fetched.groupby("shard").map_groups(
            _make_gate_and_offer(actors, epoch, num_shards, keep_bytes),
            batch_format="pyarrow",
        )
        gated.write_parquet(os.path.join(payload_dir, f"epoch={epoch}"))
        stats.fetched += sum(counts)

        if (epoch + 1) % cfg.saving_period == 0:
            _checkpoint_all(actors, ckpt_dir, epoch)
        epoch += 1

    _checkpoint_all(actors, ckpt_dir, epoch - 1 if epoch > start_epoch else start_epoch)
    stats.epochs = epoch
    stats.metrics = ray.get([a.get_metrics.remote() for a in actors])
    stats.payload_rows = sum(m["fetched"] for m in stats.metrics)
    stats.fetch_log = collect_fetch_log(actors)
    stats.seen = {
        s: set(ray.get(a.get_seen.remote())) for s, a in enumerate(actors)
    }
    for a in actors:
        ray.kill(a)
    return stats


def _make_gate_and_offer(actors, epoch: int, num_shards: int, keep_bytes: bool):
    payload_schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.large_binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
            ("url", pa.string()),
            ("url_hash", pa.binary()),
            ("shard", pa.int32()),
            ("epoch", pa.int64()),
        ]
    )

    def gate_and_offer(tbl: pa.Table) -> pa.Table:
        empty = payload_schema.empty_table()
        if not keep_bytes:
            empty = empty.drop_columns(["bytes"])
        if tbl.num_rows == 0:
            return empty
        shard = tbl["shard"][0].as_py()
        digests = tbl["url_hash"].to_pylist()
        meta = list(
            zip(
                tbl["url"].to_pylist(),
                tbl["host"].to_pylist(),
                tbl["priority"].to_pylist(),
                tbl["depth"].to_pylist(),
                tbl["discovered_at"].to_pylist(),
            )
        )
        kept = ray.get(
            actors[shard].gate.remote(epoch, digests, tbl["phash"].to_pylist(), meta)
        )
        mask = pa.array([d in kept for d in digests])
        kept_tbl = tbl.filter(mask)

        # link extraction + canonicalization + local min-depth combine
        best: dict[str, int] = {}
        for base, depth, links in zip(
            kept_tbl["url"].to_pylist(),
            kept_tbl["depth"].to_pylist(),
            kept_tbl["outlinks"].to_pylist(),
        ):
            for raw in links or ():
                cu = canonicalize_url(raw, base=base)
                nd = depth + 1
                if cu not in best or nd < best[cu]:
                    best[cu] = nd
        buckets: dict[int, list[tuple]] = {}
        for u in sorted(best):
            d = url_sha1(u)
            h = host_of(u)
            buckets.setdefault(shard_of_host(h, num_shards), []).append(
                (u, d, h, priority_of(d), best[u])
            )
        offer_refs = [
            actors[dst].offer.remote(
                (epoch, shard),
                [r[0] for r in rows],
                [r[1] for r in rows],
                [r[2] for r in rows],
                [r[3] for r in rows],
                [r[4] for r in rows],
                epoch + 1,
            )
            for dst, rows in buckets.items()
        ]
        if offer_refs:
            ray.get(offer_refs)

        out = pa.table(
            {
                "image_id": kept_tbl["image_id"],
                "bytes": kept_tbl["bytes"],
                "w": kept_tbl["w"],
                "h": kept_tbl["h"],
                "fmt": kept_tbl["fmt"],
                "caption": kept_tbl["caption"],
                "phash": kept_tbl["phash"],
                "url": kept_tbl["url"],
                "url_hash": kept_tbl["url_hash"],
                "shard": kept_tbl["shard"],
                "epoch": pa.array([epoch] * kept_tbl.num_rows, pa.int64()),
            },
            schema=payload_schema,
        )
        if not keep_bytes:
            out = out.drop_columns(["bytes"])
        return out

    return gate_and_offer


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
