"""Source readers: gzip JSON-lines with dead-letter column, CSV tree."""

import gzip
import json


def test_read_json_lines_gzip_with_dead_letter(ray_session, tmp_path):
    from raycrawl.sources.dumps import read_json_lines

    p = tmp_path / "dump.json.gz"
    lines = [
        json.dumps({"id": "1", "text": "hello", "lang": "en"}),
        "{broken json",
        json.dumps({"id": "2", "lang": "tr"}),  # missing text → null
        json.dumps([1, 2, 3]),  # not an object → dead-letter
    ]
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines))

    ds = read_json_lines(str(p), ["id", "text", "lang"])
    df = ds.to_pandas().sort_values("id", na_position="first").reset_index(drop=True)
    assert len(df) == 4
    assert df["_parse_error"].sum() == 2
    ok = df[~df["_parse_error"]].set_index("id")
    assert ok.loc["1", "text"] == "hello"
    assert ok.loc["2", "text"] is None or ok.loc["2", "text"] != ok.loc["2", "text"]


def test_read_csv_tree(ray_session, tmp_path):
    from raycrawl.sources.dumps import read_csv_tree

    d = tmp_path / "csvs"
    d.mkdir()
    (d / "a.csv").write_text("x,y\n1,a\n2,b\n")
    (d / "b.csv").write_text("x,y\n3,c\n")
    ds = read_csv_tree(str(d))
    assert ds.count() == 3
    assert sorted(r["x"] for r in ds.take_all()) == [1, 2, 3]


def test_lancelike_table_roundtrip(tmp_path):
    import pyarrow as pa

    from raycrawl.io import lancelike

    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    uri = str(tmp_path / "tbl")
    lancelike.write_table(t, uri)
    back = lancelike.read_table(uri)
    assert back.equals(t)
    import json, os

    m = json.load(open(os.path.join(uri, "_manifest.json")))
    assert m["rows"] == 3
