"""Figure/preview pairing (J4), dimension upsert (J5), codec (S11),
time windows (S1), natural sort (O1), markdown render (M6)."""

import json

from pyspark.sql import functions as F

from literature_crawler_spark.functions import timeops
from literature_crawler_spark.operators import assets, render


def test_pair_figures_with_previews(spark):
    df = spark.createDataFrame(
        [
            (1, "bucket/figs/fig1_full.png"),
            (2, "bucket/figs/fig1_preview.png"),
            (3, "bucket/figs/fig2_full.jpg"),
            (4, "bucket/figs/lonely_full.png"),
            (5, "bucket/figs/fig2_thumb.jpg"),
        ],
        ["asset_id", "oss_path"],
    )
    rows = {r.stem: r for r in assets.pair_figures_with_previews(df).collect()}
    assert rows["fig1"].full_id == 1 and rows["fig1"].preview_id == 2
    assert rows["fig2"].full_id == 3 and rows["fig2"].preview_id == 5
    assert rows["lonely"].preview_id is None


def test_upsert_dimension_and_link(spark):
    facts = spark.createDataFrame(
        [(1, ["alice", "bob"]), (2, ["bob", "carol"]), (3, [])],
        "doc_id long, authors array<string>",
    )
    dim = assets.upsert_dimension(facts, "authors")
    names = {r.name: r.dim_id for r in dim.collect()}
    assert set(names) == {"alice", "bob", "carol"}
    # idempotent: second upsert with an existing dim adds nothing
    dim2 = assets.upsert_dimension(facts, "authors", existing_dim=dim)
    assert {r.name: r.dim_id for r in dim2.collect()} == names
    links = assets.link_table(facts, "doc_id", "authors", dim).collect()
    assert len(links) == 4
    assert {(r.doc_id, r.dim_id) for r in links} == {
        (1, names["alice"]), (1, names["bob"]), (2, names["bob"]), (2, names["carol"]),
    }


def test_codec_roundtrip(spark):
    df = spark.createDataFrame([("hello <html> world " * 50,), (None,)], ["body"])
    out = df.select(
        "body", assets.decompress_text(assets.compress_text(F.col("body"))).alias("rt"),
        F.length(assets.compress_text(F.col("body"))).alias("clen"),
    ).collect()
    assert out[0].rt == out[0].body
    assert out[0].clen < len(out[0].body)  # actually compressed
    assert out[1].rt is None


def test_split_time_windows(spark):
    w = timeops.split_time_windows(spark, "2020-01-01", "2020-02-04", days=10).collect()
    assert len(w) == 4
    assert str(w[0].win_start) == "2020-01-01 00:00:00"
    assert str(w[-1].win_end) == "2020-02-04 00:00:00"  # clipped


def test_natural_sort_key(spark):
    df = spark.createDataFrame([("step 10",), ("step 2",), ("step 1b",)], ["s"])
    got = [r.s for r in df.orderBy(timeops.natural_sort_key(F.col("s"))).collect()]
    assert got == ["step 1b", "step 2", "step 10"]


STEPS = [
    {"number": "10", "title": "Last", "blocks": [{"type": "text", "text": "ten", "url": None}]},
    {"number": "2.5", "title": None, "blocks": [{"type": "note", "text": "careful", "url": None}]},
    {"number": "1", "title": "First", "blocks": [
        {"type": "heading", "text": "Prep", "url": None},
        {"type": "list", "text": "item", "url": None},
        {"type": "image", "text": "fig", "url": "https://x/y.png"},
    ]},
]


def test_render_documents_ordering_and_blocks(spark):
    df = spark.createDataFrame([(1, json.dumps(STEPS))], ["doc_id", "steps_json"])
    md = render.render_documents(df, "steps_json").collect()[0].content_md
    # float-sorted: 1, 2.5, 10 (string sort would give 1, 10, 2.5)
    assert md.index("## Step 1:") < md.index("## Step 2.5") < md.index("## Step 10")
    assert "### Prep" in md and "- item" in md
    assert "![fig](https://x/y.png)" in md and "> Note: careful" in md


def test_render_handles_garbage(spark):
    df = spark.createDataFrame([(1, "not json"), (2, None)], ["doc_id", "steps_json"])
    rows = render.render_documents(df, "steps_json").collect()
    # from_json yields null steps -> null markdown, no crash
    assert all(r.content_md is None or isinstance(r.content_md, str) for r in rows)


def test_resolve_units_quantity_blocks(spark):
    steps = (
        '[{"number":"1","title":null,"blocks":['
        '{"type":"quantity","text":null,"url":null,"qty":"5","unit_id":"u1"},'
        '{"type":"quantity","text":null,"url":null,"qty":"2","unit_id":"missing"},'
        '{"type":"text","text":"plain","url":null,"qty":null,"unit_id":null}]}]'
    )
    df = spark.createDataFrame([(steps, {"u1": "ml", "u2": "g"})], "steps string, units map<string,string>")
    out = render.render_documents(df, "steps", units_map_col="units").collect()[0].content_md
    assert "5 ml" in out            # J7 map lookup
    assert "2 missing" in out       # unknown id falls back to raw id
    assert "plain" in out


def test_bookmark_tree_nesting(spark):
    flat = (
        '[{"level":1,"title":"A","page":1},{"level":2,"title":"A.1","page":2},'
        '{"level":3,"title":"A.1.a","page":3},{"level":2,"title":"A.2","page":5},'
        '{"level":1,"title":"B","page":9}]'
    )
    df = spark.createDataFrame([(flat,)], "toc string")
    got = json.loads(render.build_bookmark_trees(df, "toc").collect()[0].bookmark_tree)
    assert [n["title"] for n in got] == ["A", "B"]
    a = got[0]
    assert [c["title"] for c in a["children"]] == ["A.1", "A.2"]
    assert a["children"][0]["children"][0]["title"] == "A.1.a"
    assert got[1]["children"] == []


def test_rewrite_asset_urls(spark):
    docs = spark.createDataFrame(
        [("d1", "see http://orig/a.png and http://orig/a.png.big here"),
         ("d2", "nothing to do"),
         ("d3", "untouched http://orig/zzz")],
        "doi string, content_md string",
    )
    asset_rows = spark.createDataFrame(
        [("d1", "http://orig/a.png", "oss://b/a.png"),
         ("d1", "http://orig/a.png.big", "oss://b/a_big.png"),
         ("d1", "http://orig/a.png", "oss://zzz/dup-later.png")],  # first-seen wins
        "doi string, original_path string, oss_path string",
    )
    got = {
        r.doi: r.content_md
        for r in assets.rewrite_asset_urls(docs, asset_rows).collect()
    }
    assert got["d1"] == "see oss://b/a.png and oss://b/a_big.png here"
    assert got["d2"] == "nothing to do"
    assert got["d3"] == "untouched http://orig/zzz"
