"""Publish tail vs a transcription of the reference logic
(nature_protocol_publish.py get_literature_type / migrate_data,
migrate_util.py protocol-number floor)."""

import pytest
from pyspark.sql import functions as F

from literature_crawler_spark.operators import publish as pb


# transcription of nature_protocol_publish.py:43-65
def _ref_literature_type(param):
    if param == 'Addendum' or param == 'Corrigendum' or param == 'Erratum':
        return 'erratum', True
    elif param == 'Author Correction' or param == 'Publisher Correction' or param == 'Retracion':
        return 'correction', True
    elif param == 'Consensus Statement' or param == 'Consensus':
        return 'consensus', False
    elif param == 'Correspondence':
        return 'correspondence', False
    elif param == 'Editorial':
        return 'editorial', False
    elif param == 'Matters Arising':
        return 'matters', False
    elif param == 'News & Views':
        return 'views', False
    elif param == 'Perspective':
        return 'perspective', False
    elif param == 'Poster':
        return 'poster', True
    elif param == 'Protocol' or param == 'Protocol Extension' or param == 'Protocol Update':
        return 'protocol', True
    elif param == 'Review Article':
        return 'review', True
    return None, None


ALL_PARAMS = [p for params, _t, _f in pb.LITERATURE_TYPE_MAP for p in params] + [
    "Research Article", "", "protocol",  # unmapped incl. case-sensitivity
]


def test_literature_type_matches_reference(spark):
    df = spark.createDataFrame([(p,) for p in ALL_PARAMS], "param string")
    lt = pb.literature_type(F.col("param"))
    got = {
        r.param: (r.t, r.f)
        for r in df.select(
            "param", lt["lit_type"].alias("t"), lt["has_protocol"].alias("f")
        ).collect()
    }
    for p in ALL_PARAMS:
        assert got[p] == _ref_literature_type(p), p


def test_parse_publish_date(spark):
    df = spark.createDataFrame(
        [("12 March 2024",), ("1 January 1999",), ("2024-03-12",), (None,)],
        "s string",
    )
    got = [str(r.d) if r.d else None
           for r in df.select(pb.parse_publish_date(F.col("s")).alias("d")).collect()]
    # strptime('%d %B %Y') parity incl. the swallowed-ValueError None
    assert got == ["2024-03-12", "1999-01-01", None, None]


def test_protocol_number_floor(spark):
    flagged = spark.createDataFrame([(i,) for i in range(5)], "literature_id int")
    # empty/low table jumps to the 20000 floor (reference: max<=19999 -> 20000)
    low = pb.assign_protocol_numbers(flagged, ["literature_id"], existing_max=120)
    nums = sorted(r.protocol_number for r in low.collect())
    assert nums == [20000, 20001, 20002, 20003, 20004]
    # grown table continues MAX(id)+1
    high = pb.assign_protocol_numbers(flagged, ["literature_id"], existing_max=25007)
    assert sorted(r.protocol_number for r in high.collect()) == list(range(25008, 25013))
    none = pb.assign_protocol_numbers(flagged, ["literature_id"])
    assert sorted(r.protocol_number for r in none.collect())[0] == 20000


def _clean(spark):
    rows = []
    params = ["Protocol", "Editorial", "Review Article", "Nope", "Poster"]
    for i in range(5):
        rows.append(
            (
                i, f"Title {i}", f"10.1038/s{i}", f"abs {i}", params[i],
                "12 March 2024" if i % 2 == 0 else "garbage",
                [f"kw{i}", f"kw{(i + 1) % 5}", ""],
                [
                    {"name": f"Author {i}", "type": "first", "institution": "U"},
                    {"name": "", "type": "x", "institution": "V"},
                    {"name": f"Author {(i + 1) % 5}", "type": None, "institution": None},
                ],
            )
        )
    return spark.createDataFrame(
        rows,
        "literature_id int, title string, doi string, abstract_text string, "
        "param string, publish_date_str string, keywords array<string>, "
        "authors array<struct<name:string,type:string,institution:string>>",
    )


def test_publish_fanout(spark):
    out = pb.publish_literature(_clean(spark), existing_protocol_max=120)
    lit = {r.literature_id: r for r in out["literature"].collect()}
    assert lit[0].literature_type == "protocol" and str(lit[0].publish_date) == "2024-03-12"
    assert lit[1].literature_type == "editorial" and lit[1].publish_date is None
    assert lit[3].literature_type is None  # unmapped param
    # protocol rows only for has_protocol params, numbered from the floor
    prot = {r.literature_id: r for r in out["protocol"].collect()}
    assert set(prot) == {0, 2, 4}
    assert sorted(r.protocol_number for r in prot.values()) == [20000, 20001, 20002]
    # empty-name author skipped (reference's 'name' check)
    assert list(prot[0].author_names) == ["Author 0", "Author 1"]
    # dims dedup, links fan out; empty keyword dropped
    kw = {r.name for r in out["keywords_dim"].collect()}
    assert kw == {f"kw{i}" for i in range(5)}
    links = out["literature_keywords"].groupBy("literature_id").count().collect()
    assert all(r["count"] == 2 for r in links)
    au_links = out["literature_authors"].groupBy("literature_id").count().collect()
    assert all(r["count"] == 2 for r in au_links)


def test_publish_skip_strategy(spark):
    existing = _clean(spark).select("literature_id").filter(F.col("literature_id") < 2)
    out = pb.publish_literature(
        _clean(spark), existing=existing, conflict_strategy="skip"
    )
    assert sorted(r.literature_id for r in out["literature"].collect()) == [2, 3, 4]


def _steps(spark):
    # two docs; doc 0 has two steps, the second holding a base64 data-URI
    # (reference skips it, protocol_io_publish.py:237-239), a src-less img
    # (would crash the reference; we drop it), and a title-less img
    rows = [
        (10, "10.1/a", 0,
         '<p>x</p><img src="https://static.yanyin.tech/f/a0.png" title="Fig A0">'
         '<img src="https://static.yanyin.tech/f/a1.png">'),
        (10, "10.1/a", 1,
         '<img src="data:image/png;base64,Zm9v"><img alt="no src">'
         '<IMG SRC="https://cdn.other/b.jpg" TITLE="Up">'),
        (11, "10.1/b", 0, "<p>no figures here</p>"),
    ]
    return spark.createDataFrame(
        rows, "literature_id long, doi string, step_idx int, data string"
    )


def test_extract_figure_list_reference_semantics(spark):
    out = pb.extract_figure_list(_steps(spark)).orderBy(
        "literature_id", "step_idx", "fig_idx"
    ).collect()
    got = [
        (r.literature_id, r.step_idx, r.fig_idx, r.oss_path, r.description,
         r.preview_oss_path)
        for r in out
    ]
    assert got == [
        # prefix stripped, title -> description, in-document order kept
        (10, 0, 0, "f/a0.png", "Fig A0", None),
        (10, 0, 1, "f/a1.png", None, None),  # title absent -> NULL
        # base64 skipped, src-less dropped, case-insensitive tag/attrs,
        # non-static src kept verbatim (replace is a no-op)
        (10, 1, 2, "https://cdn.other/b.jpg", "Up", None),
    ]


def test_merge_figure_list_strategies(spark):
    fresh = pb.extract_figure_list(_steps(spark))
    existing = spark.createDataFrame(
        [
            (10, "10.1/a", -1, 0, "stale/a.png", None, None),
            (99, "10.9/z", -1, 0, "keep/z.png", None, None),
        ],
        "literature_id long, doi string, step_idx int, fig_idx int,"
        " oss_path string, description string, preview_oss_path string",
    )
    # skip: docs that already have rows keep them; fresh lands only for new
    skip = pb.merge_figure_list(existing, fresh, "skip")
    assert sorted(r.oss_path for r in skip.collect()) == ["keep/z.png", "stale/a.png"]
    # update: delete+reinsert for refreshed docs; untouched docs survive
    upd = pb.merge_figure_list(existing, fresh, "update")
    paths = sorted(r.oss_path for r in upd.collect())
    assert paths == ["f/a0.png", "f/a1.png", "https://cdn.other/b.jpg", "keep/z.png"]
    # insert: unconditional append (the reference's else branch)
    ins = pb.merge_figure_list(existing, fresh, "insert")
    assert ins.count() == 5
    # no existing set at all
    assert pb.merge_figure_list(None, fresh, "update").count() == 3


def test_merge_update_clears_docs_refreshed_to_zero_figures(spark):
    """The reference deletes unconditionally then reinserts whatever the
    parse found — a refreshed doc whose new content has no <img> must end
    with ZERO figure rows, which requires the refreshed-key set to be
    passed explicitly (fresh alone cannot name figure-less docs)."""
    fresh = pb.extract_figure_list(_steps(spark))
    existing = spark.createDataFrame(
        [
            # doc 10.1/b is in the refresh batch but extracts no figures
            (11, "10.1/b", -1, 0, "stale/b.png", None, None),
            (99, "10.9/z", -1, 0, "keep/z.png", None, None),
        ],
        "literature_id long, doi string, step_idx int, fig_idx int,"
        " oss_path string, description string, preview_oss_path string",
    )
    refreshed = spark.createDataFrame([("10.1/a",), ("10.1/b",)], "doi string")
    upd = pb.merge_figure_list(existing, fresh, "update", refreshed=refreshed)
    paths = sorted(r.oss_path for r in upd.collect())
    # stale/b.png deleted (refreshed to zero figures); untouched doc kept
    assert paths == ["f/a0.png", "f/a1.png", "https://cdn.other/b.jpg", "keep/z.png"]
    # skip with an explicit published set: doc 10.1/a is published, so all
    # its fresh rows are skipped even though it has no existing FIGURE rows
    # (the proxy keying off figure rows would have let them through)
    published = spark.createDataFrame([("10.1/a",), ("10.9/z",)], "doi string")
    skip = pb.merge_figure_list(existing, fresh, "skip", published=published)
    assert sorted(r.oss_path for r in skip.collect()) == ["keep/z.png", "stale/b.png"]


def test_img_tag_with_gt_inside_quoted_attribute(spark):
    """'>' inside a double-quoted attribute value is valid HTML the
    reference's BeautifulSoup handles; the tag regex must not truncate
    there (losing the title or, for '>' in src, the whole row)."""
    df = spark.createDataFrame(
        [(1, "10.1/g", 0,
          '<img src="https://static.yanyin.tech/g.png" title="fig > 2">'
          '<img title="a>b" src="https://static.yanyin.tech/h.png">')],
        "literature_id long, doi string, step_idx int, data string",
    )
    out = pb.extract_figure_list(df).orderBy("fig_idx").collect()
    assert [(r.oss_path, r.description) for r in out] == [
        ("g.png", "fig > 2"), ("h.png", "a>b"),
    ]


def test_attr_grammar_quoting_and_data_prefix(spark):
    """BeautifulSoup parity cases the old double-quote-only grammar lost:
    single-quoted src, unquoted src, and lazy-load data-src/data-title
    shadowing the real attributes."""
    df = spark.createDataFrame(
        [
            (1, "10.2/q", 0,
             "<img src='https://static.yanyin.tech/sq.png' title='single'>"),
            (2, "10.2/u", 0, "<img src=uq.png>"),
            (3, "10.2/d", 0,
             '<img data-src="lazy.png" src="https://static.yanyin.tech/'
             'real.png" data-title="wrong" title="right">'),
            (4, "10.2/m", 0,
             "<img data-src='l2.png' src=plain.png title=\"mixed\">"),
            (5, "10.2/n", 0, '<img data-src="only-lazy.png">'),  # no real src
        ],
        "literature_id long, doi string, step_idx int, data string",
    )
    out = {
        r.doi: (r.oss_path, r.description)
        for r in pb.extract_figure_list(df).collect()
    }
    assert out == {
        "10.2/q": ("sq.png", "single"),
        "10.2/u": ("uq.png", None),
        "10.2/d": ("real.png", "right"),
        "10.2/m": ("plain.png", "mixed"),
        # 10.2/n dropped: data-src is not src
    }


def test_attr_grammar_review_regressions(spark):
    """Three BeautifulSoup-parity holes in the first single-quote/unquoted
    grammar: (1) attribute-shaped text inside ANOTHER attribute's quoted
    value must not be extracted as the real src/title; (2) document order,
    not quoting style, decides which occurrence wins; (3) a lone
    apostrophe in an unquoted value must not kill the whole tag match."""
    df = spark.createDataFrame(
        [
            # no real src: the only 'src=' lives inside alt's quoted value
            (1, "10.3/a", 0, '<img alt="see src=http://x/y.png here">'),
            # title= inside alt must stay NULL description
            (2, "10.3/b", 0, '<img src="https://static.yanyin.tech/b.png"'
             ' alt="title=oops">'),
            # single-quoted alt holding a fake dq src; real src is sq
            (3, "10.3/c", 0,
             "<img alt='src=\"evil.png\"' src='https://static.yanyin.tech/"
             "c.png'>"),
            # unpaired apostrophe in an unquoted value: tag must still match
            (4, "10.3/d", 0,
             '<img src="https://static.yanyin.tech/d.png" alt=O\'Brien>'),
        ],
        "literature_id long, doi string, step_idx int, data string",
    )
    out = {
        r.doi: (r.oss_path, r.description)
        for r in pb.extract_figure_list(df).collect()
    }
    assert out == {
        "10.3/b": ("b.png", None),
        "10.3/c": ("c.png", None),
        "10.3/d": ("d.png", None),
        # 10.3/a dropped: no real src attribute
    }


def test_attr_grammar_matches_html_parser(spark):
    """Randomized parity with stdlib html.parser — the tokenizer behind
    BeautifulSoup's default builder, i.e. what the reference's
    insert_figure_list actually saw. 400 seeded tags across all quoting
    styles (double/single/unquoted/bare, '>' and '=' and quotes inside
    values, '/' separators, self-closing): first-occurrence src/title
    must agree exactly, empty reading as NULL."""
    import random
    from html.parser import HTMLParser

    rnd = random.Random(20260819)
    names_pool = ["src", "title", "alt", "data-src", "srcset", "class"]
    word = "abcdefghijklmnopqrstuvwxyz0123456789._:/-"

    def rand_val(style):
        alpha = {"dq": word + " '>=&", "sq": word + ' ">=', "uq": word + "'="}[style]
        v = "".join(rnd.choice(alpha) for _ in range(rnd.randint(0, 12)))
        if style == "uq" and (not v or v[0] in "\"'"):
            v = "x" + v
        return v

    def rand_tag():
        parts = []
        for nm in rnd.sample(names_pool, rnd.randint(0, 4)):
            style = rnd.choice(["dq", "sq", "uq", "bare"])
            sep = rnd.choice([" ", "  ", " / "]) if rnd.random() < 0.1 else " "
            eq = rnd.choice(["=", " = ", "= "])
            if style == "bare":
                parts.append(sep + nm)
            elif style == "uq":
                parts.append(f"{sep}{nm}{eq}{rand_val('uq')}")
            else:
                q = '"' if style == "dq" else "'"
                parts.append(f"{sep}{nm}{eq}{q}{rand_val(style)}{q}")
        return "<img" + "".join(parts) + rnd.choice([">", ">", ">", "/>", " >"])

    class FirstImg(HTMLParser):
        def __init__(self):
            super().__init__()
            self.attrs = None

        def handle_starttag(self, tag, attrs):
            if tag == "img" and self.attrs is None:
                first = {}
                for k, v in attrs:
                    first.setdefault(k, v)
                self.attrs = first

        handle_startendtag = handle_starttag

    rows, expected = [], {}
    for i in range(400):
        doc = (rnd.choice(["", "<p>pre 'q' x</p>"]) + rand_tag()
               + rnd.choice(["", " tail>more"]))
        p = FirstImg()
        p.feed(doc)
        if p.attrs is None:
            continue
        rows.append((i, doc))
        expected[i] = (p.attrs.get("src") or None, p.attrs.get("title") or None)
    assert len(rows) > 350  # the generator must mostly produce parseable tags

    df = spark.createDataFrame(rows, "i long, data string")
    got = {
        r.i: (r.src, r.title)
        for r in df.withColumn("_img", F.regexp_extract("data", pb._IMG_TAG_RX, 0))
        .withColumn("src", pb._attr_value(F.col("_img"), "src"))
        .withColumn("title", pb._attr_value(F.col("_img"), "title"))
        .select("i", "src", "title")
        .collect()
    }
    mismatches = {i: (got[i], expected[i]) for i in expected if got[i] != expected[i]}
    assert mismatches == {}
