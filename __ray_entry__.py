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
    """Flagship: the Ray Data crawl engine — frontier shards, politeness,
    robots, URL-seen sketches, phash near-dup gate — over a synthetic web
    universe sized from /root/testdata/sf0.001 (the crawl's own input is
    the deterministic web per BASELINE.json.input_hint). Returns the
    payload table (input_hint schema minus raw bytes)."""
    from raycrawl.ops.crawlq import crawl_payload

    return crawl_payload("/root/testdata/sf0.001").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from raycrawl.ops import REGISTRY

    return {name: spec["fn"] for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from raycrawl.ops import REGISTRY

    return {
        name: spec["sql"] for name, spec in REGISTRY.items() if spec["sql"] is not None
    }
