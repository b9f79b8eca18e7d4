"""Browser-rendered fetch (SURVEY §2 S6) — the Selenium crawl path.

The reference renders JS-gated publisher pages in a real Chrome before
parsing (``app/util/current_protocol_crawl_util.py:39-130``):

1. **Readiness wait** — ``WebDriverWait(...).until(presence_of_element_
   located('#pane-pcw-relatedcon'))``: the page is unparseable until its
   readiness element appears; the reference blocks up to a timeout.
2. **Scroll-to-bottom lazy settle** — ``driver.execute_script("window.
   scrollTo(0, document.body.scrollHeight)")``: below-the-fold content
   and lazy figure images (``<img data-lg-src=...>``) only materialize
   after scrolling the rendered DOM.
3. **Figure screenshotting** — each figure's full-size URL is navigated,
   ``driver.save_screenshot`` rasterizes it, black letterbox borders are
   cropped (``app/util/pic_back_deal.py``), and the raster is stored as
   a resource, deduplicated by ``original_name``
   (``current_protocol_crawl_util.py:64-120``).
4. **Browser recycling** — the Chrome process is torn down and restarted
   every 8 figure navigations (``:80-86``, ``i % 8 == 0: driver.quit();
   uc.Chrome()``) to cap renderer memory.

Spark-first shape: rendering is a *pluggable renderer callable* driven
from ``mapInPandas`` exactly like the fetch stage (``operators/
fetch.py``) — one renderer per Python worker, whole Arrow batches, the
readiness wait re-expressed as a bounded in-batch settle ladder (a page
whose DOM has not settled returns ``None`` and is retried; pages that
never settle are *marked* ``timeout`` rather than failing the task, the
same poisoned-URL contract as the fetch retry ladder). Real Chrome is
not installable in this sandbox, so the default renderer is a
deterministic fake over the synthetic corpus (``make_synthetic_
renderer``) and the real one is a documented swap point
(``make_selenium_renderer``) — the same pattern as the image/audio
codec swap points in ``operators/images.py``.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from literature_crawler_spark.operators.fetch import FETCH_RESULT_FIELDS
from literature_crawler_spark.operators.images import (
    BORDER_RGB,
    crop_border_pixels,
    decode_image,
    encode_image,
    psnr,
)

# renderer: url -> dict(status=..., caption=..., links=[...], image_id=...,
#                       content=<rendered pagefulltext html>,
#                       figures=[full-size figure URLs])
#           or None while the DOM has not settled (retried)
Renderer = Callable[[str], dict | None]

RENDER_RESULT_FIELDS = FETCH_RESULT_FIELDS + [
    T.StructField("content", T.StringType()),
    T.StructField("figures", T.ArrayType(T.StringType())),
    T.StructField("n_annotations", T.IntegerType()),
    T.StructField("annotation_rounds", T.IntegerType()),
]

SCREENSHOT_FIELDS = [
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("browser_session", T.IntegerType()),
]

_FIGURE_URL_RE = re.compile(r"https://h(\d+)\.example\.org/figures/fig(\d+)\.jpg$")
_DATA_LG_SRC_RE = re.compile(r'data-lg-src="([^"]+)"')


# ------------------------------------------------------ synthetic DOM ----


def _figure_path_of_index(i: int) -> str | None:
    """Pages carry at most one lazy full-size figure link; every third
    page has none (exercises the empty-figure branch the reference
    guards with ``len(figure_list) > 0``)."""
    if i % 3 == 2:
        return None
    return f"/figures/fig{i:08d}.jpg"


def raw_html_of_index(i: int, n_hosts: int) -> str:
    """The page as a plain HTTP fetch sees it: no readiness pane, figure
    images lazy (``data-lg-src`` only, no ``src``), below-the-fold text
    absent. This is what S4 (``operators/fetch.py``) would return; the
    renderer's output is strictly richer."""
    from literature_crawler_spark.sources import synthetic as syn

    cap = syn._caption_of_index(i)
    fig = _figure_path_of_index(i)
    fig_html = (
        f'<figure class="figure"><a target="_blank">'
        f'<img data-lg-src="{fig}"/></a></figure>'
        if fig
        else ""
    )
    return (
        '<html><body><div class="page-body pagefulltext">'
        f"<p>{cap}</p>{fig_html}</div></body></html>"
    )


def rendered_html_of_index(i: int, n_hosts: int) -> str:
    """The settled DOM after the readiness wait + scroll: the readiness
    pane is present, lazy images are promoted (``src`` set; ``data-lg-
    src`` retained — the reference extracts from ``data-lg-src`` on the
    *rendered* DOM, ``current_protocol_crawl_util.py:78-88``), and the
    below-the-fold tail text exists."""
    from literature_crawler_spark.sources import synthetic as syn

    cap = syn._caption_of_index(i)
    fig = _figure_path_of_index(i)
    fig_html = (
        f'<figure class="figure"><a target="_blank">'
        f'<img src="{fig}" data-lg-src="{fig}"/></a></figure>'
        if fig
        else ""
    )
    tail = f"<p>lazy tail of page {i}</p>"
    return (
        '<html><body><div id="pane-pcw-relatedcon"></div>'
        '<div class="page-body pagefulltext">'
        f"<p>{cap}</p>{fig_html}{tail}</div></body></html>"
    )


def _annotation_total_of_index(i: int) -> int:
    """Expected <annotation> count of page i (0-4)."""
    return i % 5


def load_annotations(total: int, per_round: int = 2, max_rounds: int = 8) -> tuple[int, int]:
    """Deterministic twin of the reference's incremental-scroll annotation
    loader (``app/routes/current_local_deal.py:337-361``
    ``load_annotations`` + ``scroll_and_load_more``): each scroll round
    materializes up to ``per_round`` more ``<annotation>`` nodes; the loop
    stops when the count reaches the expected total, after 3 rounds of
    zero progress, or at the absolute round cap. Returns
    ``(n_loaded, rounds_used)``.

    This loop belongs INSIDE the renderer (it is browser interaction, not
    dataflow), so the Spark plumbing stays one settle ladder regardless of
    how many scroll rounds a page needs.
    """
    loaded, index = 0, 0
    while True:
        index += 1
        loaded = min(total, loaded + per_round)
        if loaded == total:
            break
        if index > 3 and loaded == 0:
            break
        if index > max_rounds:
            break
    return loaded, index


def make_synthetic_renderer(
    n_pages: int, n_hosts: int, settle_every: int | None = None
) -> Renderer:
    """Deterministic stand-in for the headless browser.

    ``settle_every=k``: every k-th page's DOM is "still loading" on the
    first visit in this process (returns None once) — exercising the
    readiness-wait ladder the way ``make_synthetic_fetcher``'s
    ``fail_every`` exercises the HTTP retry ladder.
    """
    from literature_crawler_spark.sources import synthetic as syn

    unsettled_seen: set[int] = set()

    def render(url: str) -> dict | None:
        m = syn.page_index_of_url(url, n_hosts)
        if m is None or m >= n_pages:
            return {"status": "missing"}
        if settle_every and m % settle_every == 0 and m not in unsettled_seen:
            unsettled_seen.add(m)  # readiness element not present yet
            return None
        html = rendered_html_of_index(m, n_hosts)
        host = url.split("/page/")[0]
        figures = [host + p for p in _DATA_LG_SRC_RE.findall(html)]
        n_ann, rounds = load_annotations(_annotation_total_of_index(m))
        return {
            "status": "rendered",
            "image_id": f"img-{m:010d}",
            "caption": syn._caption_of_index(m),
            "links": syn._links_of_index(m, n_pages, n_hosts),
            "content": html,
            "figures": figures,
            "n_annotations": n_ann,
            "annotation_rounds": rounds,
        }

    return render


def make_selenium_renderer(
    readiness_selector: str = "body",
    annotation_selector: str | None = None,
    timeout_s: float = 10.0,
    recycle_every: int = 100,
    scroll_rounds: int = 3,
    scroll_wait_s: float = 0.5,
    headless: bool = True,
) -> Renderer:
    """Real-browser renderer behind a guarded selenium import (raises
    NotImplementedError where selenium/Chrome are absent — this sandbox).

    The returned closure holds ONE headless Chrome per Python worker:
    created lazily on first call, recycled every ``recycle_every``
    navigations (the ``screenshot_figures`` recycle model), quit via
    ``atexit``. Per page: ``driver.get(url)`` -> bounded
    ``WebDriverWait`` on ``readiness_selector`` (a timeout returns
    ``None`` so the Spark stage's retry ladder doubles as the readiness
    wait, exactly like the synthetic renderer's settle behavior) ->
    ``scroll_rounds`` scrolls to ``document.body.scrollHeight`` (the
    incremental annotation loader's browser half; rounds stop early once
    the height stops growing) -> ``page_source`` parsed into the
    renderer dict (title caption / absolutized links / og:image via the
    shared ``httpclient.parse_fetch_page``, lazy figures from
    ``data-lg-src`` promotion). A dead browser poisons only its own row:
    the closure drops the driver and returns ``None`` for a ladder
    retry on a fresh Chrome. Reference recipe:
    ``current_protocol_crawl_util.py:396-425`` (driver options) and
    ``:39-130`` (wait + scroll + parse loop).
    """
    try:
        from selenium import webdriver  # noqa: PLC0415 — deploy-only
        from selenium.common.exceptions import (  # noqa: PLC0415
            TimeoutException,
            WebDriverException,
        )
        from selenium.webdriver.common.by import By  # noqa: PLC0415
        from selenium.webdriver.support import (  # noqa: PLC0415
            expected_conditions as EC,
        )
        from selenium.webdriver.support.ui import WebDriverWait  # noqa: PLC0415
    except ImportError as e:
        raise NotImplementedError(
            "selenium/Chrome not available in this environment; "
            "use make_synthetic_renderer (deterministic fake) instead"
        ) from e

    import atexit
    from urllib.parse import urljoin

    state: dict = {"driver": None, "navs": 0}

    def _quit():
        if state["driver"] is not None:
            try:
                state["driver"].quit()
            except Exception:
                pass
            state["driver"] = None

    atexit.register(_quit)

    def _driver():
        if state["driver"] is None or state["navs"] >= recycle_every:
            _quit()
            opts = webdriver.ChromeOptions()
            if headless:
                opts.add_argument("--headless=new")
            # reference driver flags (current_protocol_crawl_util.py:396-425);
            # images off — the download stage fetches binaries, not the DOM pass
            for a in (
                "--no-sandbox",
                "--disable-gpu",
                "--disable-dev-shm-usage",
                "--blink-settings=imagesEnabled=false",
            ):
                opts.add_argument(a)
            state["driver"] = webdriver.Chrome(options=opts)
            state["navs"] = 0
        state["navs"] += 1
        return state["driver"]

    def render(url: str) -> dict | None:
        try:
            d = _driver()
            d.get(url)
            WebDriverWait(d, timeout_s).until(
                EC.presence_of_element_located((By.CSS_SELECTOR, readiness_selector))
            )
            import time as _time

            rounds, last_h = 0, -1
            for rounds in range(1, scroll_rounds + 1):  # noqa: B007
                h = d.execute_script("return document.body.scrollHeight")
                if h == last_h:
                    break
                last_h = h
                d.execute_script("window.scrollTo(0, document.body.scrollHeight)")
                # lazy XHRs need a beat before the next height read, or
                # every page exits after one scroll (reference loop waits
                # between rounds, current_protocol_crawl_util.py:39-130)
                _time.sleep(scroll_wait_s)
            n_ann = (
                len(d.find_elements(By.CSS_SELECTOR, annotation_selector))
                if annotation_selector
                else 0
            )
            html = d.page_source
        except TimeoutException:
            return None  # DOM not settled yet: ladder retries
        except WebDriverException:
            _quit()  # quit() the dead pair — dropping the reference alone
            return None  # leaks a chromedriver+Chrome per failure
        from literature_crawler_spark.operators.httpclient import parse_fetch_page

        parsed = parse_fetch_page(html.encode("utf-8", "replace"), url, "utf-8")
        figures = [urljoin(url, f) for f in _DATA_LG_SRC_RE.findall(html)]
        return {
            "status": "rendered",
            "image_id": parsed["image_id"],
            "caption": parsed["caption"],
            "links": parsed["links"],
            "content": html,
            "figures": figures,
            "n_annotations": n_ann,
            "annotation_rounds": rounds,
        }

    return render


def as_fetcher(renderer: Renderer):
    """Adapt a renderer to the fetch-stage contract (``operators/fetch.
    Fetcher``) so ``CrawlEngine`` runs browser-rendered waves unchanged:
    ``rendered`` maps to the engine's success status ``fetched``; the
    rendered-only keys (content, figures) pass through harmlessly —
    ``fetch_extract`` reads only its own result fields. ``None`` (DOM not
    settled) stays ``None``, so the engine's retry ladder doubles as the
    readiness wait."""

    def fetch(url: str) -> dict | None:
        out = renderer(url)
        if out is not None and out.get("status") == "rendered":
            out = dict(out, status="fetched")
        return out

    return fetch


# ------------------------------------------------------ Spark operators ----


def rendered_fetch_extract(
    scheduled: DataFrame,
    renderer: Renderer,
    url_col: str = "canon_url",
    settle_attempts: int = 3,
    salt_col: str = "salt",
    n_partitions: int | None = None,
) -> DataFrame:
    """Scheduled frontier -> rendered rows (S6 twin of ``fetch_extract``).

    Same partitioning contract as the fetch stage (repartition on the
    politeness scheduler's ``salt`` so supernode hosts spread across
    tasks); adds the rendered-DOM columns ``content`` (the pagefulltext
    html, ready for the thirds splitter ``functions/text.content_
    thirds``) and ``figures`` (full-size figure URLs extracted from
    ``data-lg-src``). Pages whose DOM never settles within
    ``settle_attempts`` get status ``timeout`` — marked, not raised
    (the WebDriverWait-timeout analogue).
    """
    schema = T.StructType(list(scheduled.schema.fields) + RENDER_RESULT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            results = []
            for url in pdf[url_col]:
                out, attempts = None, 0
                while attempts < settle_attempts:
                    attempts += 1
                    out = renderer(url)
                    if out is not None:
                        break
                if out is None:
                    out = {"status": "timeout"}
                results.append(
                    {
                        "fetch_status": out.get("status", "error"),
                        "image_id": out.get("image_id"),
                        "caption": out.get("caption"),
                        "links": out.get("links"),
                        "attempts": attempts,
                        "content": out.get("content"),
                        "figures": out.get("figures"),
                        "n_annotations": out.get("n_annotations"),
                        "annotation_rounds": out.get("annotation_rounds"),
                    }
                )
            res = pd.DataFrame(results)
            # timeout/missing rows carry None in the int columns; pandas
            # would widen them to float64, which Arrow refuses to cast
            # back to int32 (NaN) — use the nullable Int32 dtype instead
            for c in ("n_annotations", "annotation_rounds"):
                res[c] = res[c].astype("Int32")
            pdf = pdf.reset_index(drop=True)
            for f in RENDER_RESULT_FIELDS:
                pdf[f.name] = res[f.name]
            yield pdf

    if salt_col in scheduled.columns:
        parts = n_partitions or scheduled.sparkSession.sparkContext.defaultParallelism
        scheduled = scheduled.repartition(parts, F.col(salt_col))
    return scheduled.mapInPandas(run, schema)


def new_figures(figures: DataFrame, resources: DataFrame) -> DataFrame:
    """Figure URLs not yet stored as resources — the reference's
    ``original_name not in resource_original_name_list`` check
    (``current_protocol_crawl_util.py:64-70``), done BEFORE navigating so
    known figures never cost a browser round-trip. ``original_name`` is
    the URL's last path segment (``:89-91``); the anti-join broadcasts
    whichever side Spark sizes smaller (resources are a dimension table
    next to a 10^10 frontier)."""
    named = figures.withColumn(
        "original_name", F.element_at(F.split(F.col("figure_url"), "/"), -1)
    )
    return named.join(
        resources.select("original_name").distinct(),
        on="original_name",
        how="left_anti",
    )


def screenshot_figures(
    figures: DataFrame,
    url_col: str = "figure_url",
    recycle_every: int = 8,
    border: int = 4,
) -> DataFrame:
    """Navigate + rasterize each full-size figure URL (S6 stage 3).

    The deterministic screenshot stand-in letterboxes the figure's true
    pixel field (``sources/synthetic.page_image_pixels``) inside a
    border-color canvas — what a browser screenshot of an ``<img>``-only
    page looks like — then crops the border with the SAME kernel the reference's
    ``remove_black_border`` maps to (``operators/images.crop_border_
    pixels``) and re-encodes as jpeg (the reference stores ``type=
    'jpg'`` screenshots). Fidelity of the crop is the input_hint's
    per-row invariant: decoded pixels vs origin at PSNR >= 40 dB
    (tests/test_browser.py asserts it row-by-row).

    ``browser_session`` numbers each row's renderer process within its
    partition (floor(nav_index / recycle_every)) — the observable twin
    of the reference's recycle-every-8 ``driver.quit(); uc.Chrome()``
    loop; a real renderer swaps in at the same seam.

    Every input column passes through to the output (a figure row's
    ``page_url``/``original_name`` attribution survives without a
    re-join against the pre-screenshot plan); ``original_name`` is
    derived from the URL's last path segment when the input lacks it.
    """
    derive_name = "original_name" not in figures.columns
    added = (
        [T.StructField("original_name", T.StringType())] if derive_name else []
    ) + SCREENSHOT_FIELDS
    schema = T.StructType(list(figures.schema.fields) + added)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from literature_crawler_spark.sources import synthetic as syn

        navs = 0  # per-partition navigation counter drives recycling
        for pdf in batches:
            if len(pdf) == 0:
                continue
            names, blobs, ws, hs, fmts, sessions = [], [], [], [], [], []
            for url in pdf[url_col]:
                m = _FIGURE_URL_RE.match(url or "")
                navs += 1
                sessions.append((navs - 1) // recycle_every)
                if not m:
                    names.append(None)
                    blobs.append(None)
                    ws.append(0)
                    hs.append(0)
                    fmts.append(None)
                    continue
                i = int(m.group(2))
                px = syn.page_image_pixels(i)
                # letterbox in the reference's exact border color
                # (pic_back_deal.py scans for RGB 14,14,14, not pure black)
                canvas = np.full(
                    (px.shape[0] + 2 * border, px.shape[1] + 2 * border, 3),
                    BORDER_RGB,
                    dtype=np.uint8,
                )
                canvas[border:-border, border:-border] = px
                cropped = crop_border_pixels(canvas)
                names.append(url.rsplit("/", 1)[-1])  # last path segment
                blobs.append(encode_image(cropped, "jpeg"))
                ws.append(cropped.shape[1])
                hs.append(cropped.shape[0])
                fmts.append("jpeg")
            pdf = pdf.reset_index(drop=True)
            if derive_name:
                pdf["original_name"] = names
            pdf["bytes"] = blobs
            pdf["w"] = ws
            pdf["h"] = hs
            pdf["fmt"] = fmts
            pdf["browser_session"] = sessions
            yield pdf

    return figures.mapInPandas(run, schema)


def harvest_figures(
    rendered: DataFrame,
    resources: DataFrame | None = None,
    recycle_every: int = 8,
) -> DataFrame:
    """Rendered wave rows -> NEW screenshot resource rows.

    The reference's per-article figure loop
    (``current_protocol_crawl_util.py:64-120``): for each rendered page's
    figure URLs, skip names already stored (the dedup happens BEFORE any
    browser navigation), rasterize + crop the rest, and emit rows shaped
    like ``CurrentProtocolResources`` (original_name, uri, source page,
    type) ready to append to the resources state table. ``resource_id``
    is a content-stable hash of the name, not the reference's racy
    ``MAX(id)+1`` (same policy as ``upsert_dimension``, A5).

    Scale shape: explode + one shuffle on ``figure_url`` (dedup across
    pages), broadcast-or-shuffle anti-join vs the resources dimension,
    then the screenshot mapInPandas over only the NEW figures.
    """
    figs = (
        rendered.filter(F.col("fetch_status").isin("fetched", "rendered"))
        .filter(F.col("figures").isNotNull())
        .select(
            F.col("canon_url").alias("page_url"),
            F.explode("figures").alias("figure_url"),
        )
        # many pages may cite one figure; screenshot each name once,
        # attributed to a deterministic representative page
        .groupBy("figure_url")
        .agg(F.min("page_url").alias("page_url"))
    )
    if resources is not None:
        fresh = new_figures(figs, resources)
    else:
        fresh = figs.withColumn(
            "original_name", F.element_at(F.split(F.col("figure_url"), "/"), -1)
        )
    # The reference also dedups by name WITHIN the run: each screenshotted
    # name is appended to resource_original_name_list as the loop goes
    # (current_protocol_crawl_util.py:64-70), so a name reached from two
    # hosts is navigated once. First-seen pick is deterministic by URL.
    w = Window.partitionBy("original_name").orderBy("figure_url")
    fresh = (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # screenshot_figures passes fresh's columns through, so the figure's
    # name/page attribution survives without re-running the dedup plan on
    # a join-back side (one computation of the explode/anti-join/window)
    shots = screenshot_figures(fresh, recycle_every=recycle_every)
    return shots.select(
        F.xxhash64("original_name").alias("resource_id"),
        "original_name",
        F.col("figure_url").alias("uri"),
        "page_url",
        "bytes",
        "w",
        "h",
        F.col("fmt").alias("type"),
        "browser_session",
    )


def screenshot_fidelity(shots: DataFrame) -> DataFrame:
    """Per-row PSNR of each screenshot against its origin pixel field —
    the input_hint's decoded-pixel invariant as a queryable column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from literature_crawler_spark.sources import synthetic as syn

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = []
            for url, blob in zip(pdf["figure_url"], pdf["bytes"]):
                m = _FIGURE_URL_RE.match(url or "")
                px, _, _, _ = decode_image(bytes(blob) if blob is not None else None)
                if m is None or px is None:
                    vals.append(float("nan"))
                    continue
                origin = syn.page_image_pixels(int(m.group(2)))
                vals.append(
                    psnr(origin, px) if origin.shape == px.shape else float("nan")
                )
            pdf = pdf.reset_index(drop=True)
            pdf["psnr_vs_origin"] = pd.Series(vals).clip(upper=999.0)
            yield pdf[["figure_url", "original_name", "psnr_vs_origin"]]

    out_schema = T.StructType(
        [
            T.StructField("figure_url", T.StringType()),
            T.StructField("original_name", T.StringType()),
            T.StructField("psnr_vs_origin", T.DoubleType()),
        ]
    )
    return shots.select("figure_url", "original_name", "bytes").mapInPandas(
        run, out_schema
    )
