"""Golden tests for the Draft.js renderer, derived from the reference's
rendering semantics (protocol_io_util.py get_md_result_from_blocks and the
get_clean_*_text family; text_deal.py get_new_text / escape_markdown /
get_abc_pattern_result). Pure-Python goldens run without Spark; the last
test drives the Arrow UDF end-to-end."""

import json

from pyspark.sql import functions as F

from literature_crawler_spark.operators import draftjs as dj

UNITS = [{"id": "u1", "name": "mL"}, {"id": "u2", "name": "°C"}]


def draft(blocks, entity_map=None):
    return {"blocks": blocks, "entityMap": entity_map or {}}


def block(text, btype="unstyled", styles=None, entities=None):
    return {
        "text": text,
        "type": btype,
        "inlineStyleRanges": styles or [],
        "entityRanges": entities or [],
    }


# ------------------------------------------------------------- primitives --


def test_merge_style_ranges():
    merged = dj.merge_style_ranges(
        [
            {"offset": 0, "length": 3, "style": "bold"},
            {"offset": 0, "length": 3, "style": "italic"},
            {"offset": 5, "length": 2, "style": "bold"},
        ]
    )
    assert {"style": "bold_italic", "offset": 0, "length": 3} in merged
    assert {"style": "bold", "offset": 5, "length": 2} in merged
    assert len(merged) == 2


def test_splice_and_full_range():
    assert dj.splice({(0, 3): "XY", (8, 14): "Z"}, "Mix the buffer") == "XY the Z"
    assert dj.splice({}, "abc") == "abc"
    assert dj.splice({(0, 3): None}, "abc") == ""


def test_abc_ladder():
    assert dj.abc_to_numbered("        a. first") == "    1. first"
    assert dj.abc_to_numbered("        j. tenth") == "    10. tenth"
    assert dj.abc_to_numbered("   a. shallow") == "   a. shallow"  # < 8 spaces


def test_escape_markdown():
    assert dj.escape_markdown("a #b ~c $d *e") == "a \\#b \\~c \\$d *e"


# ----------------------------------------------------------------- styles --


def test_styles_render():
    b = block(
        "Mix the buffer",
        styles=[
            {"offset": 0, "length": 3, "style": "bold"},
            {"offset": 8, "length": 6, "style": "italic"},
        ],
    )
    out = dj.render_draft(draft([b]), UNITS)
    assert out == " **Mix**  the  _buffer_ \n\n"


def test_bold_italic_merge_renders_triple():
    b = block(
        "Mix it",
        styles=[
            {"offset": 0, "length": 3, "style": "bold"},
            {"offset": 0, "length": 3, "style": "italic"},
        ],
    )
    assert dj.render_draft(draft([b]), UNITS) == " ***Mix***  it\n\n"


# ---------------------------------------------------------------- entities --


def _one_entity(text, etype, data, offset, length, btype="unstyled"):
    b = block(text, btype=btype, entities=[{"offset": offset, "length": length, "key": 0}])
    return dj.render_draft(
        draft([b], {"0": {"type": etype, "mutability": "IMMUTABLE", "data": data}}),
        UNITS,
    )


def test_link_entity():
    out = _one_entity("see docs here", "link", {"url": "https://e.org"}, 4, 4)
    assert out == "see [docs](https://e.org) here\n\n"
    out = _one_entity("see docs here", "link", {"url": None}, 4, 4)
    assert out == "see <docs> here\n\n"


def test_quantity_entities():
    assert _one_entity("add 5", "amount", {"amount": 5, "unit": "u1"}, 4, 1) == "add `5mL`\n\n"
    assert (
        _one_entity("at 37", "temperature", {"temperature": 37, "unit": "u2"}, 3, 2)
        == "at `37°C`\n\n"
    )
    # unknown unit id falls back to the bare value
    assert _one_entity("add 5", "amount", {"amount": 5, "unit": "zz"}, 4, 1) == "add `5`\n\n"


def test_duration_formats():
    assert _one_entity("wait X", "duration", {"duration": 3661}, 5, 1) == "wait `1h 1m 1s`\n\n"
    assert _one_entity("wait X", "duration", {"duration": 0}, 5, 1) == "wait \n\n"


def test_centrifuge_compound():
    out = _one_entity(
        "spin C", "centrifuge",
        {"centrifuge": 300, "unit": "zz", "temperature": 4, "temperatureUnit": "u2",
         "duration": 90},
        5, 1,
    )
    assert out == "spin `300undefine,4°C,0h 1m 30s`\n\n"


def test_small_quantity_entities():
    assert _one_entity("pH X", "ph", {"number": 7}, 3, 1) == "pH `7`\n\n"
    assert _one_entity("c X", "cost", {"value": "9 USD"}, 2, 1) == "c `9 USD`\n\n"
    assert _one_entity("p X", "pressure", {"value": 2, "unit": "u1"}, 2, 1) == "p `2 mL`\n\n"
    assert _one_entity("s X", "sample", {}, 2, 1) == "s `Sample`\n\n"
    assert (
        _one_entity("t X", "thickness", {"value": 3, "unit": "u1", "label": "gel"}, 2, 1)
        == "t `3 mL gel`\n\n"
    )


def test_geographic_link():
    out = _one_entity("at G", "geographic", {"value": "12.5 N, 42.1 E"}, 3, 1)
    assert out == (
        "at [ 12.5 N, 42.1 E]"
        "(https://geohack.toolforge.org/geohack.php?params=12.5;42.1)\n\n"
    )


def test_gotostep_is_dropped():
    assert _one_entity("go X now", "gotostep", {"step": 4}, 3, 1) == "go  now\n\n"


def test_emoji():
    assert _one_entity("tm E", "emoji", {"name": ":tm:"}, 3, 1) == "tm <sup>TM</sup>\n\n"
    assert (
        _one_entity("r E", "emoji", {"name": ":registered:"}, 2, 1) == "r <sup>®</sup>\n\n"
    )


def test_tex_and_protocols():
    assert _one_entity("f X", "tex_formula", {"formula": "e=mc^2"}, 2, 1) == "f $e=mc^2$\n\n"
    out = _one_entity("p P", "protocols", {"title": "T1", "uri": "abc"}, 2, 1)
    assert out == "p [T1](https://www.protocols.io/view/abc)\n\n"


def test_image_with_legend_and_guards():
    data = {
        "source": "https://img.e.org/1.png",
        "legend": json.dumps({"blocks": [{"text": "a "}, {"text": "cap"}]}),
    }
    out = _one_entity("I", "image", data, 0, 1)
    # full-range entity short-circuits: no unstyled suffix is added
    assert out == (
        '<img src="https://img.e.org/1.png" alt="a cap" loading="lazy" '
        'title="a cap"/>\n\n'
    )
    assert _one_entity("I", "image", {"source": "blob:x"}, 0, 1) == ""
    guarded = _one_entity("I", "image", {"source": "https://googleusercontent.com/x"}, 0, 1)
    assert guarded.startswith("\n\n```\n#") and "googleusercontent" in guarded


def test_command_and_code():
    out = _one_entity(
        "X", "command",
        {"command_name": "run", "name": "make all", "os_name": "linux", "os_version": "5"},
        0, 1,
    )
    assert out == "\n\n\n```\n#run (linux 5)\nmake all\n```"
    out = _one_entity(
        "X", "code_insert", {"blocks": [{"text": "x = 1"}, {"text": "y = 2"}]}, 0, 1
    )
    assert out == "```\nx = 1\ny = 2\n```"


def test_tables_markdown():
    data = {
        "data": [["a", "b"], ["c", None]],
        "legend": {"blocks": [{"text": "cap"}]},
    }
    out = _one_entity("T", "tables", data, 0, 1)
    assert out == "| A | B |\n| --- | --- |\n| a | b |\n| c |  |\n\n\ncap\n"


def test_equipment_table():
    out = _one_entity(
        "E", "equipment", {"name": "Vortex", "brand": "Acme", "type": None}, 0, 1
    )
    assert out == (
        "\nEquipment\n\n| Value | Label |\n| --- | --- |\n"
        "| Vortex | NAME |\n| Acme | BRAND |\n\n"
    )


def test_citation_and_dataset_notes():
    out = _one_entity(
        "C", "citation",
        {"authors": "Doe J", "date": 1600000000, "title": "T", "journal": "J",
         "doi": "https://doi.org/10.1/x"},
        0, 1,
    )
    assert out == (
        '<Note title="Citation" type="info" >Doe J 2020 T  J '
        '<a href="https://doi.org/10.1/x">https://doi.org/10.1/x</a></Note>'
    )
    out = _one_entity("D", "dataset", {"name": "DS", "link": "https://d.org"}, 0, 1)
    assert out == (
        '<Note title="Dateset" type="activity" >DS'
        '<a href="https://d.org">https://d.org</a></Note>'
    )


def test_nested_note_content():
    data = {
        "blocks": [
            {
                "text": "be careful",
                "inlineStyleRanges": [{"offset": 3, "length": 7, "style": "bold"}],
                "entityRanges": [],
            }
        ],
        "entityMap": {},
    }
    out = _one_entity("N", "notes", data, 0, 1)
    assert out == '<Note title="Note" type="warning" ><span>be <b>careful</b> </span></Note>'
    # JSON-string payloads parse; garbage passes through as text
    out = _one_entity("N", "safety", json.dumps(data), 0, 1)
    assert out.startswith('<Note title="Safety information" type="error" >')
    out = _one_entity("N", "result", "just a string", 0, 1)
    assert out == '<Note title="Expected result" type="success" >just a string</Note>'


# ------------------------------------------------------------ block rules --


def test_second_block_escapes_and_lists():
    blocks = [
        block("first"),
        block("use #tag"),
        block("item one", btype="unordered-list-item"),
        block("item two", btype="ordered-list-item"),
    ]
    out = dj.render_draft(draft(blocks), UNITS)
    assert out == "first\n\nuse \\#tag\n\n* item one\n1. item two\n"


def test_block_level_entity_skips_escaping():
    blocks = [
        block("first"),
        block("X", entities=[{"offset": 0, "length": 1, "key": 0}]),
    ]
    emap = {"0": {"type": "command", "mutability": "IMMUTABLE",
                  "data": {"command_name": None, "name": "grep #x", "os_name": None,
                           "os_version": None}}}
    out = dj.render_draft(draft(blocks, emap), UNITS)
    assert out == "first\n\n\n\n\n```\ngrep #x\n```"  # '#' NOT escaped


def test_newlines_double_in_unstyled():
    out = dj.render_draft(draft([block("a\nb")]), UNITS)
    assert out == "a\n\nb\n\n"


# ------------------------------------------------------------- step level --


def test_render_steps_orders_and_sections():
    steps = [
        {"number": "10", "title": "heat", "section": "Stage B",
         "step": draft([block("later")])},
        {"number": "2", "title": None, "section": "Stage A",
         "step": draft([block("early")])},
        {"number": "2.5", "title": "mid", "section": "Stage A",
         "step": draft([block("between")])},
        {"number": None, "step": draft([block("dropped")])},
    ]
    out = dj.render_steps(steps, UNITS)
    assert out == (
        "# Stage A\n\n## Step 2\n\nearly\n\n\n\n## Step 2.5: mid\n\nbetween\n\n\n\n"
        "# Stage B\n\n## Step 10: heat\n\nlater\n\n"
    )


def test_natural_then_float_sort():
    steps = [
        {"number": "10", "step": draft([block("c")])},
        {"number": "9", "step": draft([block("b")])},
        {"number": "1", "step": draft([block("a")])},
    ]
    out = dj.render_steps(steps, UNITS)
    assert out.index("## Step 1\n") < out.index("## Step 9") < out.index("## Step 10")


# -------------------------------------------------------------- Spark UDF --


def test_render_rich_documents_udf(spark):
    steps = [
        {"number": "1", "title": "mix",
         "step": draft(
             [block("add 5 now", entities=[{"offset": 4, "length": 1, "key": 0}])],
             {"0": {"type": "amount", "mutability": "IMMUTABLE",
                    "data": {"amount": 5, "unit": "u1"}}},
         )},
    ]
    df = spark.createDataFrame(
        [(1, json.dumps(steps), json.dumps(UNITS))],
        "doc_id int, steps string, units string",
    )
    out = dj.render_rich_documents(df, "steps", "units").collect()[0]
    assert out.content_md == "## Step 1: mix\n\nadd `5mL` now\n\n"


# ------------------------------------------------------ resource traversal --


def test_extract_resources_two_level():
    steps = [
        {"number": "1", "step": {
            "blocks": [],
            "entityMap": {
                "0": {"type": "image", "mutability": "IMMUTABLE",
                      "data": {"original_name": "f.png", "source": "https://e/f.png",
                               "mime": "image/png"}},
                "1": {"type": "notes", "mutability": "IMMUTABLE",
                      "data": {"blocks": [], "entityMap": {
                          "0": {"type": "file", "mutability": "MUTABLE",
                                "data": {"original_name": "data.csv",
                                         "source": "https://e/d.csv"}},
                          "1": {"type": "video", "mutability": "IMMUTABLE",
                                "data": {"original_name": "v.mp4",
                                         "source": "https://e/v.mp4",
                                         "mime": "video/mp4"}},
                      }}},
                "2": {"type": "amount", "mutability": "MUTABLE",
                      "data": {"amount": 5, "unit": "u1"}},  # no payload
                "3": {"type": "imageblock", "mutability": "MUTABLE",
                      "data": {"source": "https://e/b.png"}},
                "4": {"type": "video", "mutability": "IMMUTABLE",  # direct video
                      "data": {"original_name": "w.mp4", "source": "https://e/w.mp4",
                               "mime": "video/mp4"}},
                "5": {"type": "file", "mutability": "MUTABLE",
                      "data": {"original_name": "no-src", "source": None}},  # dropped
            },
        }},
    ]
    got = dj.extract_resources(steps)
    assert got == [
        {"original_name": "f.png", "uri": "https://e/f.png", "mime": "image/png"},
        {"original_name": "data.csv", "uri": "https://e/d.csv", "mime": ""},
        {"original_name": "v.mp4", "uri": "https://e/v.mp4", "mime": "video/mp4"},
        {"original_name": "", "uri": "https://e/b.png", "mime": ""},
        {"original_name": "w.mp4", "uri": "https://e/w.mp4", "mime": "video/mp4"},
    ]
    assert dj.extract_resources("not json") == []
    assert dj.extract_resources([{"number": "1", "step": "garbage"}]) == []


def test_extract_step_resources_udf(spark):
    steps = [{"number": "1", "step": {"blocks": [], "entityMap": {
        "0": {"type": "image", "mutability": "IMMUTABLE",
              "data": {"original_name": "a.png", "source": "https://e/a.png",
                       "mime": "image/png"}}}}}]
    df = spark.createDataFrame([(1, json.dumps(steps))], "doc_id int, steps string")
    row = df.select(dj.extract_step_resources_udf("steps").alias("r")).collect()[0]
    assert [x.asDict() for x in row.r] == [
        {"original_name": "a.png", "uri": "https://e/a.png", "mime": "image/png"}
    ]
