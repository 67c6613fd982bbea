"""Config-file parsers — the reference's user-extension surface (§2.10).

One parser per config format the reference consumes, with the exact
semantics of the cited parser (same split rules, same skip rules), so a
user of the reference could feed the same files to this engine:

* stance seed files — ``{stance}`` line then profile-URL lines
  (``Postprocess_scripts/Functions.py:150-164``; sample ``siyaset_accs``)
* location abbreviations — ``Base:[abbr, abbr]`` lines
  (``Cansin_Location_Detection.py:54-66``; sample ``local/locations.abbr``)
* names.csv — headerless ``name,M|F`` (``Postprocess_scripts/Functions.py:7-31``)
* electorates CSV — header ``Year,<loc>...`` (``User Based Dashboard.py:290-292``)
* topics.json — ``[{name, keywords[], lang}]`` (``Readme.md:31-43``)
* labels JSON — ``[{label: [aliases]}]`` (``TemporalAnalysis.py:20-25``)
"""

from __future__ import annotations

import json


def parse_stance_seeds(text: str) -> dict[str, list[str]]:
    """``{stance}`` header lines (no '/'), then profile URLs; the username is
    the last path segment of each URL."""
    out: dict[str, list[str]] = {}
    current: str | None = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if "/" not in line:
            current = line
            out.setdefault(current, [])
        elif current is not None:
            out[current].append(line.rstrip("/").rsplit("/", 1)[-1])
    return out


def parse_location_abbrs(text: str) -> dict[str, list[str]]:
    """``Base:[abbr, abbr]`` per line → {base: [abbrs]} preserving file order
    (order is semantically significant: first-match-wins in J3)."""
    out: dict[str, list[str]] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        base, rest = line.split(":", 1)
        rest = rest.strip().lstrip("[").rstrip("]")
        out[base.strip()] = [a.strip() for a in rest.split(",") if a.strip()]
    return out


def parse_names_csv(text: str) -> dict[str, str]:
    """Headerless ``name,M|F`` rows → {lowercased name: gender}."""
    out: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or "," not in line:
            continue
        name, gender = line.rsplit(",", 1)
        out[name.strip().lower()] = gender.strip().upper()
    return out


def parse_electorates_csv(text: str) -> tuple[list[str], dict[str, dict[str, float]]]:
    """Header ``Year,<loc1>,<loc2>...``; one row per year → (locations,
    {year: {loc: count}})."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    header = [h.strip() for h in lines[0].split(",")]
    locs = header[1:]
    rows: dict[str, dict[str, float]] = {}
    for ln in lines[1:]:
        parts = [p.strip() for p in ln.split(",")]
        rows[parts[0]] = {loc: float(v) for loc, v in zip(locs, parts[1:])}
    return locs, rows


def parse_topics_json(text: str) -> list[dict]:
    """``[{"name":..., "keywords": [...], "lang": ...}]`` routing table."""
    topics = json.loads(text)
    for t in topics:
        t.setdefault("keywords", [])
        t.setdefault("lang", None)
    return topics


def parse_labels_json(text: str) -> dict[str, list[str]]:
    """``[{label: [aliases]}]`` → {label: aliases}."""
    out: dict[str, list[str]] = {}
    for entry in json.loads(text):
        for label, aliases in entry.items():
            out[label] = list(aliases)
    return out
