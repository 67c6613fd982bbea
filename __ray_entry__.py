"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline on a small deterministic
synthetic web (the engine's own input shape per BASELINE.json.input_hint);
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 over the driver-generated parquet tables.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: Ray Data crawl over the deterministic synthetic web —
    frontier shards, politeness, robots, phash near-dup gate — returning
    the payload table (input_hint schema, minus raw bytes for size)."""
    from raycrawl.core.webgraph import WebConfig, seed_urls
    from raycrawl.crawler import CrawlConfig, run_crawl, read_payload

    web = WebConfig(n_hosts=6, pages_per_host=16)
    cfg = CrawlConfig(
        web=web,
        out_dir="/tmp/raycrawl_entry",
        num_shards=4,
        max_epochs=40,
    )
    run_crawl(cfg, seed_urls(web))
    return read_payload(cfg.out_dir).drop_columns(["bytes"]).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from raycrawl.ops import REGISTRY

    return {name: spec["fn"] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from raycrawl.ops import REGISTRY

    return {
        name: spec["sql"] for name, spec in REGISTRY.items() if spec["sql"] is not None
    }
