"""Conformance: parse the reference's OWN shipped config files.

These are the real fixtures from `/root/reference` (read-only public
content): `siyaset_accs` (stance seeds), `siyaset_names` (labels JSON) and
`local.zip` (abbreviations, names.csv, electorates, retweet adjacency).
A user of the reference can feed the same files to this engine unchanged.
"""

import json
import os
import zipfile

import pytest

from raycrawl.pipelines.config import (
    parse_electorates_csv,
    parse_labels_json,
    parse_location_abbrs,
    parse_names_csv,
    parse_stance_seeds,
)
from raycrawl.pipelines.reference_analogs import propagate_labels

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not present"
)


def _zip_text(name: str) -> str:
    with zipfile.ZipFile(os.path.join(REF, "local.zip")) as z:
        return z.read(name).decode("utf-8")


def test_stance_seed_file():
    seeds = parse_stance_seeds(open(os.path.join(REF, "siyaset_accs")).read())
    assert "CHP" in seeds
    assert "kilicdarogluk" in seeds["CHP"]
    assert all("/" not in stance for stance in seeds)
    assert all(v for v in seeds.values())


def test_labels_json_file():
    labels = parse_labels_json(open(os.path.join(REF, "siyaset_names")).read())
    assert "erdoğan" in labels
    assert "erdoğan" in labels["erdoğan"]


def test_locations_abbr_file():
    d = parse_location_abbrs(_zip_text("local/locations.abbr"))
    assert d["Eskişehir"] == ["Eskişehir", "EskisehirTurkiye"]
    assert d["Ankara"] == ["Ankara", "ankara", "ank"]
    assert list(d)[0] == "Eskişehir"  # file order preserved (J3 semantics)


def test_names_csv_file():
    names = parse_names_csv(_zip_text("local/names.csv"))
    assert names["alper"] == "M" and names["ece"] == "F"


def test_electorates_file():
    locs, rows = parse_electorates_csv(_zip_text("local/electrants.csv"))
    assert locs == ["eskişehir", "ankara"]
    assert rows["2021-01-01"]["ankara"] == 10.0


def test_retweet_adjacency_drives_label_propagation(ray_session):
    """The reference's real 214 KB user→retweets adjacency
    (`local/retweets-users.json`, the Stance_Detection.py:114 checkpoint
    format) loads into the engine's label-propagation pipeline."""
    import pandas as pd
    import ray.data

    adj = json.loads(_zip_text("local/retweets-users.json"))
    users, retweeted = adj["users"], adj["users_retweeted"]
    assert len(users) == len(retweeted)
    uid = {u: i for i, u in enumerate(users)}
    edges = pd.DataFrame(
        [
            {"src": uid[u], "dst": uid[r]}
            for u, rts in zip(users, retweeted)
            for r in rts
            if r in uid
        ]
    ).drop_duplicates()
    seeds = {uid[u]: f"label{i % 3}" for i, u in enumerate(users[:30])}
    out = propagate_labels(ray.data.from_pandas(edges), seeds, iterations=3)
    assert len(out) >= len(seeds)
    assert set(out.columns) == {"user_id", "label"}
    # seeds never change label (J7 guard)
    got = dict(zip(out["user_id"], out["label"]))
    assert all(got[u] == lab for u, lab in seeds.items())
