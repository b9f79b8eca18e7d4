"""Draft.js rich-step renderer: steps JSON -> markdown (M6 deep tail).

The reference converts protocols.io Draft.js step documents to markdown in
a ~1,500-line per-row dispatcher (`app/util/protocol_io_util.py`):
`get_md_result_from_blocks` (:406-715) walks each block's
`inlineStyleRanges` + `entityRanges`, renders every entity type to a
markdown/HTML fragment, and splices the fragments into the block text by
character offsets (`get_new_text`, `app/util/text_deal.py:63-80`);
`get_new_inlineranges` (:380-403) merges co-located bold+italic into
bold_italic; `get_content_from_steps` (:2027-2093) sorts steps by
natural-key then float(number) and threads per-document `units` into the
quantity renderers.

This module re-expresses the same capability for the Spark engine:

* the per-document renderer is pure Python (string surgery over one
  document is inherently scalar — SURVEY §2.7), exposed as an
  Arrow-batched ``pandas_udf`` so Spark moves whole batches, not rows;
* step ordering/sectioning stays deterministic inside the renderer
  (single-document scope), matching the reference's sort exactly;
* entity coverage: link, amount, temperature, duration, concentration,
  reagents, shaker, centrifuge, centrifugation, ph, cost, pressure,
  humidity, sample, thickness, geographic, gotostep, emoji, tex_formula,
  protocols, image, imageblock, spectral, video, file, embed,
  code_insert, command, tables, equipment, software, citation, dataset,
  well_plate_map, safety, notes, result — the reference's full dispatch
  table (`protocol_io_util.py:489-663`).

Documented deviations from the reference (bug-for-bug fidelity was not
ported where the reference behavior is an evident defect):
* offsets are spliced against the ORIGINAL block text; the reference
  mutates unstyled text (newline doubling) BEFORE splicing, silently
  shifting offsets in blocks containing newlines (:663-667).
* `centrifuge` appends its duration when duration > 0; the reference's
  condition is inverted (`if duration == 0:` at :1346).
* the nested note/safety renderer uses each entity's own offset/length;
  the reference reuses the outer block's (:878-... `sub_map[(offset,
  offset + length)]`).
* the restricted-content notice emitted for googleusercontent/embed
  sources is an English constant (the reference embeds a Chinese notice).
"""

from __future__ import annotations

import html as _html_mod
import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESTRICTED_NOTICE = (
    "Content unavailable due to network policy; original source link preserved."
)


# ------------------------------------------------------------ primitives ----


def merge_style_ranges(ranges: list[dict]) -> list[dict]:
    """Co-located bold+italic collapse to bold_italic; other styles at the
    same (offset, length) stay separate (reference get_new_inlineranges,
    protocol_io_util.py:380-403)."""
    by_span: dict[tuple[int, int], list[str]] = {}
    for r in ranges:
        by_span.setdefault((r["offset"], r["length"]), []).append(r["style"])
    out = []
    for (offset, length), styles in by_span.items():
        if "bold" in styles and "italic" in styles:
            # reference-exact: when bold+italic co-locate, ONLY
            # bold_italic is emitted — a third co-located style
            # (UNDERLINE, sup) is dropped with it
            # (protocol_io_util.py:393-400 emits just the merged item)
            out.append({"style": "bold_italic", "offset": offset, "length": length})
        else:
            for s in styles:
                out.append({"style": s, "offset": offset, "length": length})
    return out


def splice(repl: dict[tuple[int, int], str | None], text: str) -> str:
    """Replace [start, end) spans of ``text`` with their mapped fragments,
    in start order (reference get_new_text, text_deal.py:63-80)."""
    out, cur = [], 0
    for start, end in sorted(repl.keys(), key=lambda k: k[0]):
        out.append(text[cur:start])
        out.append(repl[(start, end)] or "")
        cur = end
    out.append(text[cur:])
    return "".join(out)


def escape_markdown(text: str) -> str:
    """Escape '#', '~', '$' (reference text_deal.py:136-143)."""
    for ch in ("#", "~", "$"):
        text = text.replace(ch, "\\" + ch)
    return text


_ABC_RE = re.compile(r"(^ {8,})([a-z]\.)(.*)", re.MULTILINE)


def abc_to_numbered(text: str) -> str:
    """Deep-indented 'a.'..'z.' ladder (reference get_abc_pattern_result,
    text_deal.py:83-124): the 8+-space indent always collapses to 4
    spaces; only 'a.'..'j.' renumber to '1.'..'10.' (the reference's
    if/elif ladder stops at 'j.'), 'k.'..'z.' keep their letter."""

    def sub(m: re.Match) -> str:
        letter = m.group(2)[0]
        marker = f"{ord(letter) - ord('a') + 1}." if letter <= "j" else m.group(2)
        return f"    {marker}{m.group(3)}"

    return _ABC_RE.sub(sub, text)


def natural_key(s: str) -> list:
    """'step 2' < 'step 10' (reference natural_keys, text_deal.py:273-297)."""
    return [int(p) if p.isdigit() else p.lower() for p in re.split(r"(\d+)", s or "")]


def _fmt_duration(seconds) -> str:
    s = int(seconds)
    return f"{s // 3600}h {s // 60 - (s // 3600) * 60}m {s % 60}s"


def _unit_name(units: dict[str, str], key, default: str | None = None) -> str | None:
    return units.get(str(key), default)


def _quantity(value, unit_key, units: dict[str, str]) -> str:
    """`{value}{unit}` code span — amount/temperature/concentration/shaker
    (reference get_clean_amount_text et al., protocol_io_util.py:238-264,
    297-306, 322-334)."""
    name = _unit_name(units, unit_key)
    return f"`{value}{name}`" if name is not None else f"`{value}`"


def _spell(n: int) -> str:
    """0 -> 'A' column letters (reference get_spell_by_number, :333-335)."""
    return chr(n + 65)


def _md_table(rows: list[list[str]]) -> str:
    out = "| " + " | ".join(rows[0]) + " |\n"
    out += "| " + " | ".join(["---"] * len(rows[0])) + " |\n"
    for row in rows[1:]:
        out += "| " + " | ".join(row) + " |\n"
    return out + "\n"


def _kv_table(title: str, pairs: list[tuple[str, str]]) -> str:
    rows = [["Value", "Label"]] + [[v, k] for k, v in pairs if v]
    return f"\n{title}\n\n" + _md_table(rows)


def _blocks_text(data) -> str:
    """Concatenated plain text of a nested blocks payload (image legends,
    table captions — reference get_clean_image_text :263-285)."""
    if not data:
        return ""
    if isinstance(data, str):
        try:
            data = json.loads(data)
        except (ValueError, TypeError):
            return ""
    return "".join(b.get("text") or "" for b in (data.get("blocks") or []))


def _guarded_source(source: str) -> str | None:
    """googleusercontent -> notice code block; blob: -> ''; else None
    (= caller renders normally). Reference :275-283."""
    if source and "googleusercontent" in source:
        return f"\n\n```\n#{RESTRICTED_NOTICE}\n{source}\n```\n"
    if source and source.startswith("blob:"):
        return ""
    return None


# ------------------------------------------------------ entity renderers ----
# Each: (data, ctx) -> fragment. ctx carries units / block text slice / doi.
# Formats mirror the reference's get_clean_*_text functions
# (protocol_io_util.py:238-378, 1031-1975); citations inline below.


def _r_link(data, ctx):  # :1216-1224
    uri = data.get("url")
    return f"[{ctx['slice']}]({uri})" if uri else f"<{ctx['slice']}>"


def _r_amount(data, ctx):  # :251-264
    return _quantity(data.get("amount"), data.get("unit"), ctx["units"])


def _r_temperature(data, ctx):  # :238-249
    return _quantity(data.get("temperature"), data.get("unit"), ctx["units"])


def _r_concentration(data, ctx):  # :297-306
    return _quantity(data.get("concentration"), data.get("unit"), ctx["units"])


def _r_shaker(data, ctx):  # :322-331
    return _quantity(data.get("shaker"), data.get("unit"), ctx["units"])


def _r_duration(data, ctx):  # :1170-1178
    d = int(data.get("duration") or 0)
    return f"`{_fmt_duration(d)}`" if d else ""


def _r_centrifuge(data, ctx):  # :1311-1356 (duration condition fixed)
    units = ctx["units"]
    parts = []
    if data.get("centrifuge"):
        parts.append(
            f"{data['centrifuge']}{_unit_name(units, data.get('unit'), 'undefine')}"
        )
    if data.get("temperature"):
        parts.append(
            f"{data['temperature']}"
            f"{_unit_name(units, data.get('temperatureUnit'), 'undefine')}"
        )
    if data.get("duration"):
        parts.append(_fmt_duration(int(data["duration"])))
    return "`" + ",".join(parts) + "`"


def _r_centrifugation(data, ctx):  # :1387-1400
    if not data.get("centrifuge"):
        return ""
    return (
        f"`{data['centrifuge']}"
        f"{_unit_name(ctx['units'], data.get('unit'), 'undefine')}`"
    )


def _r_ph(data, ctx):  # :1417-1426
    return f"`{data['number']}`" if data.get("number") else ""


def _r_cost(data, ctx):  # :1440-1450
    return f"`{data['value']}`" if data.get("value") else ""


def _r_pressure(data, ctx):  # :1514-1526
    if not data.get("value"):
        return ""
    return f"`{data['value']} {_unit_name(ctx['units'], data.get('unit'), 'undefine')}`"


def _r_humidity(data, ctx):  # :1490-1499
    return f"`{data['amount']}`" if data.get("amount") else ""


def _r_sample(data, ctx):  # :1464-1476
    return f"`{data['name']}`" if data.get("name") else "`Sample`"


def _r_thickness(data, ctx):  # :1808-1819
    name = _unit_name(ctx["units"], data.get("unit"))
    label, value = data.get("label"), data.get("value")
    return f"`{value} {name} {label}`" if name else f"`{value} {label}`"


_NUM_RE = re.compile(r"[-+]?\d*\.\d+|\d+")


def _r_geographic(data, ctx):  # :1798-1805
    value = data.get("value")
    if not value:
        return ""
    nums = _NUM_RE.findall(value)
    if len(nums) < 2:
        return ""
    uri = f"https://geohack.toolforge.org/geohack.php?params={nums[0]};{nums[1]}"
    return f"[ {value}]({uri})"


def _r_gotostep(data, ctx):  # :1251-1254 (intentionally empty)
    return ""


def _r_reagents(data, ctx):  # :308-314
    if not data.get("name"):
        return ""
    vendor = (data.get("vendor") or {}).get("name")
    return f'<reagents  text="{data["name"]}" label="{vendor}"/>'


def _r_emoji(data, ctx):  # :1924-1933
    name = str(data.get("name") or "").replace(":", "")
    if name.strip() == "tm":
        name = "TM"
    elif name.strip() == "registered":
        name = "®"
    return f"<sup>{name}</sup>"


def _r_tex_formula(data, ctx):  # :1163-1165
    return f"${data.get('formula')}$"


def _r_protocols(data, ctx):  # :1135-1147
    return f"[{data.get('title')}](https://www.protocols.io/view/{data.get('uri')})"


def _r_image(data, ctx):  # :263-285
    legend = _blocks_text(data.get("legend"))
    guard = _guarded_source(data.get("source") or "")
    if guard is not None:
        return guard
    return (
        f'<img src="{data.get("source")}" alt="{legend}" loading="lazy" '
        f'title="{legend}"/>\n\n'
    )


def _r_imageblock(data, ctx):  # :1001-1023
    source = data.get("source")
    if not source:
        return ""
    guard = _guarded_source(source)
    if guard is not None:
        return guard
    name = data.get("original_name") or ""
    return f'<img src="{source}" alt="{name}" loading="lazy" title="{name}"/>\n'


def _r_spectral(data, ctx):  # :290-294
    return f'<img src="{data.get("source")}" alt="" loading="lazy" title=""/>\n'


def _r_video(data, ctx):  # :364-377
    guard = _guarded_source(data.get("source") or "")
    if guard is not None:
        return guard
    return (
        f'<video  src="{data.get("source")}" text="{data.get("original_name")}"'
        f"  controls muted/>"
    )


def _r_file(data, ctx):  # :1776-1789
    source = data.get("source")
    guard = _guarded_source(source or "")
    if guard is not None and guard != "":
        return guard
    return f"[{data.get('original_name')}]({source})"


def _r_embed(data, ctx):  # :1955-1961
    return f"\n```\n#{RESTRICTED_NOTICE}\n{data.get('code')}\n```\n"


def _r_code_insert(data, ctx):  # :1919-1921 + get_normal_content :1881-1916
    if isinstance(data, str):
        try:
            data = json.loads(data)
        except (ValueError, TypeError):
            return f"```{data}\n```"
    body = "".join("\n" + (b.get("text") or "") for b in (data.get("blocks") or []))
    return f"```{body}\n```"


def _r_command(data, ctx):  # :1935-1951
    name = data.get("name")
    cmd = data.get("command_name")
    os_name, os_version = data.get("os_name"), data.get("os_version")
    suffix = ""
    if os_name:
        suffix = f"({os_name}"
    if os_version:
        suffix += f" {os_version}"
    if os_name:
        suffix += ")"
    if cmd:
        return f"\n\n\n```\n#{cmd} {suffix}\n{name}\n```"
    return f"\n\n\n```\n{name}\n```"


def _r_tables(data, ctx):  # get_clean_table_text :337-361 — the entity's
    # data payload carries both the cell matrix ('data') and the caption
    # ('legend'). Cells pass through as-is (the reference runs html2text
    # per cell; no HTML-typed cells exist in the engine's corpus).
    caption = _blocks_text(data.get("legend"))
    rows = data.get("data")
    if not rows:
        return ""
    header = [_spell(i) for i in range(len(rows[0]))]
    body = [["" if x is None else str(x) for x in row] for row in rows]
    return _md_table([header] + body) + "\n" + caption + "\n"


def _r_equipment(data, ctx):  # :1031-1073
    link = data.get("link") or (data.get("vendor") or {}).get("link") or ""
    return _kv_table(
        "Equipment",
        [
            ("NAME", data.get("name") or ""),
            ("TYPE", data.get("type") or ""),
            ("BRAND", data.get("brand") or ""),
            ("SKU", data.get("sku") or ""),
            ("LINK", link if data.get("link") else ""),
            ("SPECIFICATIONS", data.get("specifications") or ""),
        ],
    )


def _r_software(data, ctx):  # :1822-1858
    return _kv_table(
        "Software",
        [
            ("NAME", data.get("name") or ""),
            ("OS_NAME", data.get("os_name") or ""),
            ("OS_VERSION", data.get("os_version") or ""),
            ("REPOSITORY", data.get("repository") or ""),
            ("DEVELOPER", data.get("developer") or ""),
            ("LINK", data.get("link") or ""),
            ("VERSION", data.get("version") or ""),
        ],
    )


def _r_citation(data, ctx):  # :1076-1103
    import datetime

    parts = ""
    if data.get("authors"):
        parts += f"{data['authors']} "
    if data.get("date"):
        year = datetime.datetime.utcfromtimestamp(int(data["date"])).year
        parts += f"{year} "
    if data.get("title"):
        parts += f"{data['title']} "
    if data.get("journal"):
        parts += f" {data['journal']} "
    if data.get("doi"):
        parts += f'<a href="{data["doi"]}">{data["doi"]}</a>'
    parts = parts.replace("\n", "")
    return f'<Note title="Citation" type="info" >{parts}</Note>'


def _r_dataset(data, ctx):  # :1106-1132 ('Dateset' is the reference's
    body = ""  # output string — kept verbatim for parity)
    if data.get("affiliation"):
        body += data["affiliation"]
    if data.get("name"):
        body += data["name"]
    if data.get("link"):
        body += f'<a href="{data["link"]}">{data["link"]}</a>'
    body = body.replace("\n", "")
    return f'<Note title="Dateset" type="activity" >{body}</Note>'


def _r_well_plate_map(data, ctx):  # :1963-1973
    return f'<Well data="{data.get("well")}" columns="{data.get("wellColumns", "")}" />'


# nested note/safety/result — HTML-variant styles inside a <Note> wrapper
# (reference get_safety_content/get_note_content/get_result_content
# :716-800 + get_sub_result :806-1000)

_SUB_STYLE = {
    "italic": ("<i>", "</i> "),
    "UNDERLINE": ("<i>", "</i> "),
    "bold": ("<b>", "</b> "),
    "bold_italic": ("<strong><em>", "</em></strong> "),
    "sup": ("<sup>", "</sup>"),
    "sub": ("<sub>", "</sub>"),
}


def _render_nested(data, units: dict[str, str]) -> str:
    if isinstance(data, str):
        try:
            data = json.loads(data)
        except (ValueError, TypeError):
            return str(data)
    entity_map = data.get("entityMap") or {}
    if isinstance(entity_map, list):
        entity_map = {str(i): e for i, e in enumerate(entity_map)}
    out, tail = [], []
    for block in data.get("blocks") or []:
        text = block.get("text") or ""
        repl: dict[tuple[int, int], str | None] = {}
        for r in merge_style_ranges(block.get("inlineStyleRanges") or []):
            seg = text[r["offset"] : r["offset"] + r["length"]]
            if not seg:
                continue
            pre, post = _SUB_STYLE.get(r["style"], ("", ""))
            repl[(r["offset"], r["offset"] + r["length"])] = (
                pre + seg.strip() + post if seg.strip() else seg
            )
        for er in block.get("entityRanges") or []:
            ent = entity_map.get(str(er.get("key")))
            if not ent:
                continue
            span = (er["offset"], er["offset"] + er["length"])
            etype, edata = ent.get("type"), ent.get("data") or {}
            ctx = {"units": units, "slice": text[span[0] : span[1]]}
            if etype == "link":
                # reference-exact (get_sub_clean_link_text,
                # protocol_io_util.py:1227): nested links bold the WHOLE
                # sub-block text and drop the URL — unlike the top-level
                # renderer's [slice](url); not a wrong-variable bug here
                repl[span] = f"\n<b>{text}</b>\n"
            elif etype in ("amount", "temperature", "concentration", "shaker"):
                val = edata.get(
                    {"amount": "amount", "temperature": "temperature",
                     "concentration": "concentration", "shaker": "shaker"}[etype]
                )
                name = _unit_name(units, edata.get("unit"))
                repl[span] = f"<b>{val}{name}</b>" if name else f"<b>{val}</b>"
            elif etype == "duration":
                repl[span] = f"<b>{_fmt_duration(int(edata.get('duration') or 0))}</b>"
            elif etype in ("command", "embed"):
                tail.append(ENTITY_RENDERERS[etype](edata, ctx))
            elif etype in ENTITY_RENDERERS:
                repl[span] = ENTITY_RENDERERS[etype](edata, ctx)
        rendered = (
            repl[(0, len(text))]
            if (0, len(text)) in repl
            else splice(repl, text)
        )
        if rendered.startswith("<"):
            out.append(rendered)
        else:
            out.append(f"<span>{rendered}</span>")
    return ("".join(out) + "".join(tail)).replace("\n", "")


def _note_wrapper(title: str, ntype: str):
    def render(data, ctx):
        return f'<Note title="{title}" type="{ntype}" >{_render_nested(data, ctx["units"])}</Note>'

    return render


ENTITY_RENDERERS = {
    "link": _r_link,
    "amount": _r_amount,
    "temperature": _r_temperature,
    "concentration": _r_concentration,
    "shaker": _r_shaker,
    "duration": _r_duration,
    "centrifuge": _r_centrifuge,
    "centrifugation": _r_centrifugation,
    "ph": _r_ph,
    "cost": _r_cost,
    "pressure": _r_pressure,
    "humidity": _r_humidity,
    "sample": _r_sample,
    "thickness": _r_thickness,
    "geographic": _r_geographic,
    "gotostep": _r_gotostep,
    "reagents": _r_reagents,
    "emoji": _r_emoji,
    "tex_formula": _r_tex_formula,
    "protocols": _r_protocols,
    "image": _r_image,
    "imageblock": _r_imageblock,
    "spectral": _r_spectral,
    "video": _r_video,
    "file": _r_file,
    "embed": _r_embed,
    "code_insert": _r_code_insert,
    "command": _r_command,
    "tables": _r_tables,
    "equipment": _r_equipment,
    "software": _r_software,
    "citation": _r_citation,
    "dataset": _r_dataset,
    "well_plate_map": _r_well_plate_map,
    "safety": _note_wrapper("Safety information", "error"),
    "notes": _note_wrapper("Note", "warning"),
    "result": _note_wrapper("Expected result", "success"),
}

# Entity types that exempt their block from markdown escaping — the
# reference's flag=False set (protocol_io_util.py:489-663).
_BLOCK_LEVEL_TYPES = {
    "protocols", "equipment", "software", "image", "video", "tables",
    "safety", "notes", "result", "citation", "dataset", "file",
    "code_insert", "command", "tex_formula", "imageblock", "embed",
    "well_plate_map",
}

# Markdown wrappers for the top-level style pass (reference :430-476).
_TOP_STYLE = {
    "italic": (" _", "_ "),
    "UNDERLINE": (" _", "_ "),
    "bold": (" **", "** "),
    "bold_italic": (" ***", "*** "),
    "sup": ("<sup>", "</sup>"),
    "sub": ("<sub>", "</sub>"),
}


# ----------------------------------------------------------- block pass ----


def render_block(
    block: dict,
    entity_map: dict,
    units: dict[str, str],
    is_first: bool,
    doi: str | None = None,
) -> str:
    """One Draft.js block -> markdown fragment (reference
    get_md_result_from_blocks body, :419-700)."""
    text = block.get("text") or ""
    btype = block.get("type") or "unstyled"
    repl: dict[tuple[int, int], str | None] = {}

    for r in merge_style_ranges(block.get("inlineStyleRanges") or []):
        seg = text[r["offset"] : r["offset"] + r["length"]]
        if not seg:
            continue
        pre, post = _TOP_STYLE.get(r["style"], (None, None))
        if pre is None:
            continue
        repl[(r["offset"], r["offset"] + r["length"])] = (
            pre + seg.strip() + post if seg.strip() else seg
        )

    block_level = False
    for er in block.get("entityRanges") or []:
        ent = entity_map.get(str(er.get("key")))
        if not ent:
            continue
        etype = ent.get("type")
        fn = ENTITY_RENDERERS.get(etype)
        if fn is None:
            continue
        if etype in _BLOCK_LEVEL_TYPES:
            block_level = True
        span = (er["offset"], er["offset"] + er["length"])
        ctx = {"units": units, "slice": text[span[0] : span[1]], "doi": doi}
        data = ent.get("data")
        repl[span] = fn(data if data is not None else {}, ctx)

    if repl and (0, len(text)) in repl:
        out = repl[(0, len(text))] or ""
    else:
        out = splice(repl, text)
        if btype in ("unstyled", "align-justify"):
            # deviation (documented in module docstring): newline doubling
            # happens AFTER splicing so offsets stay true
            out = out.replace("\n", "\n\n") + "\n\n"

    out = abc_to_numbered(out)
    if not is_first:
        if not block_level and out:
            out = escape_markdown(out)
        if btype == "unordered-list-item":
            out = "* " + out.strip() + "\n"
        elif btype == "ordered-list-item":
            # the reference resets its counter every block (:686-693), so
            # ordered items always render as '1.'
            out = "1. " + out.strip() + "\n"
    return out


def render_draft(content, units) -> str:
    """A whole Draft.js payload ({'blocks': [...], 'entityMap': {...}})
    -> markdown (reference get_md_result_from_blocks)."""
    if isinstance(content, str):
        try:
            content = json.loads(content)
        except (ValueError, TypeError):
            return content
    if not isinstance(content, dict):
        return "" if content is None else str(content)
    entity_map = content.get("entityMap") or {}
    if isinstance(entity_map, list):
        entity_map = {str(i): e for i, e in enumerate(entity_map)}
    units_map = _units_as_map(units)
    out = []
    for i, block in enumerate(content.get("blocks") or []):
        out.append(render_block(block, entity_map, units_map, is_first=i == 0))
    return "".join(out)


def _units_as_map(units) -> dict[str, str]:
    if units is None:
        return {}
    if isinstance(units, dict):
        return {str(k): str(v) for k, v in units.items()}
    return {str(u["id"]): str(u["name"]) for u in units if u.get("id") is not None}


def render_steps(steps, units) -> str:
    """Ordered step documents -> one markdown body: natural-key pre-sort
    then float(number) sort (reference get_content_from_steps,
    :2064-2068), '## Step {n}: {title}' headers, distinct section headers
    emitted once in first-occurrence order (:2069-2078)."""
    if isinstance(steps, str):
        try:
            steps = json.loads(steps)
        except (ValueError, TypeError):
            return ""
    steps = [s for s in (steps or []) if s.get("number")]
    steps.sort(key=lambda s: natural_key(str(s["number"])))

    # deviation: the reference calls float(x['number']) unguarded and
    # crashes the task on a non-float number ('1.1.1', '2a'); here that
    # would kill the whole Arrow batch, so unparseable numbers sort
    # AFTER the floats in their natural-key order instead (identical
    # output on every input the reference survives)
    def _float_key(s):
        try:
            return (0, float(s["number"]))
        except (TypeError, ValueError):
            return (1, 0.0)

    steps.sort(key=_float_key)
    seen_sections: set[str] = set()
    out = []
    for s in steps:
        section = s.get("section")
        if section:
            # the reference strips markup first (BeautifulSoup .text,
            # protocol_io_util.py:2074-2076), so HTML-tagged sections
            # dedup and render identically to their plain-text twins
            section = _html_mod.unescape(re.sub(r"<[^>]*>", "", section))
        if section and section not in seen_sections:
            seen_sections.add(section)
            out.append(f"# {section}")
        header = f"## Step {s['number']}"
        if s.get("title"):
            header += f": {s['title']}"
        out.append(header)
        body = render_draft(s.get("step"), units)
        if body:
            out.append(body)
    return "\n\n".join(out)


# ------------------------------------------------------ resource traversal ----

# entity types that carry a downloadable payload and how to read it
# (reference get_resource_attrs, protocol_io_util.py:95-149)
_RESOURCE_READERS = {
    "image": lambda d: (d.get("original_name"), d.get("source"), d.get("mime")),
    "video": lambda d: (d.get("original_name"), d.get("source"), d.get("mime")),
    "file": lambda d: (d.get("original_name"), d.get("source"), ""),
    "imageblock": lambda d: ("", d.get("source"), ""),
    "spectral": lambda d: ("", d.get("source"), ""),
}


def _resource_of(entity: dict) -> tuple | None:
    data = entity.get("data")
    if not isinstance(data, dict):
        return None
    reader = _RESOURCE_READERS.get(entity.get("type"))
    if reader is None:
        return None
    name, uri, mime = reader(data)
    return (name, uri, mime) if uri else None


def extract_resources(steps) -> list[dict]:
    """Downloadable resources from every step's entityMap, including the
    TWO-LEVEL traversal: an IMMUTABLE non-image/video entity (notes,
    safety, result, ...) may nest its own ``data.entityMap`` whose
    entities carry the actual payloads (reference
    get_all_uri_from_interface_steps, protocol_io_util.py:57-95).
    Returns [{'original_name', 'uri', 'mime'}] in traversal order —
    the download work-list the crawl's J2 anti-join consumes.

    Deviation: an IMMUTABLE payload entity WITHOUT a nested entityMap
    still emits its own resource here; the reference's branch structure
    silently drops it (only MUTABLE entities reach get_resource_attrs
    directly, :63-88)."""
    if isinstance(steps, str):
        try:
            steps = json.loads(steps)
        except (ValueError, TypeError):
            return []
    out = []

    def emit(entity):
        r = _resource_of(entity)
        if r is not None:
            out.append({"original_name": r[0], "uri": r[1], "mime": r[2]})

    for step in steps or []:
        content = step.get("step")
        if isinstance(content, str):
            try:
                content = json.loads(content)
            except (ValueError, TypeError):
                continue
        if not isinstance(content, dict):
            continue
        emap = content.get("entityMap") or {}
        if isinstance(emap, list):
            emap = {str(i): e for i, e in enumerate(emap)}
        for entity in emap.values():
            if entity.get("mutability") == "IMMUTABLE" and entity.get("type") not in (
                "image", "video",
            ):
                data = entity.get("data")
                nested = data.get("entityMap") if isinstance(data, dict) else None
                if nested:
                    if isinstance(nested, list):
                        nested = {str(i): e for i, e in enumerate(nested)}
                    for sub in nested.values():
                        emit(sub)
                else:
                    emit(entity)
            else:
                emit(entity)
    return out


_RESOURCE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("original_name", T.StringType()),
            T.StructField("uri", T.StringType()),
            T.StructField("mime", T.StringType()),
        ]
    )
)


@F.pandas_udf(_RESOURCE_SCHEMA)
def extract_step_resources_udf(steps_json: pd.Series) -> pd.Series:
    """steps JSON -> array<struct<original_name, uri, mime>> download list."""
    return pd.Series(
        [
            [(r["original_name"], r["uri"], r["mime"]) for r in extract_resources(s)]
            if s is not None
            else None
            for s in steps_json
        ]
    )


# -------------------------------------------------------------- Spark UDF ----


@F.pandas_udf(T.StringType())
def render_draft_steps_udf(steps_json: pd.Series, units_json: pd.Series) -> pd.Series:
    """(steps JSON, units JSON) -> markdown, one Arrow batch at a time.
    steps JSON: [{"number": "...", "title": ..., "section": ...,
    "step": {blocks, entityMap} | JSON string}]; units JSON:
    [{"id": ..., "name": ...}] or {"id": "name"}."""

    def go(sj, uj):
        if sj is None:
            return None
        try:
            units = json.loads(uj) if uj else {}
        except (ValueError, TypeError):
            units = {}
        return render_steps(sj, units)

    return pd.Series([go(s, u) for s, u in zip(steps_json, units_json)])


def render_rich_documents(
    df: DataFrame, steps_json_col: str, units_json_col: str | None = None
) -> DataFrame:
    """Adds ``content_md`` from a Draft.js steps JSON column (and an
    optional per-document units JSON column)."""
    units = (
        F.col(units_json_col) if units_json_col is not None else F.lit("[]")
    )
    return df.withColumn(
        "content_md", render_draft_steps_udf(F.col(steps_json_col), units)
    )
