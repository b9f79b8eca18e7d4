"""Browser-rendered fetch (S6): readiness settle ladder, lazy-attribute
promotion, figure screenshot + crop fidelity, resource dedup by name.

Reference semantics under test: ``app/util/current_protocol_crawl_util.py``
39-130 (WebDriverWait readiness, scroll-settle, data-lg-src figure
extraction, screenshot + remove_black_border + original_name dedup,
browser recycle every 8 navigations).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from literature_crawler_spark.operators import browser as br
from literature_crawler_spark.operators import fetch as fetch_mod
from literature_crawler_spark.sources import synthetic as syn

N_PAGES, N_HOSTS = 60, 5


def _scheduled(spark, n=N_PAGES):
    rows = [(syn._url_of_index(i, N_HOSTS), i % 7) for i in range(n)]
    return spark.createDataFrame(rows, "canon_url string, salt int")


def test_readiness_settle_ladder(spark):
    rendered = br.rendered_fetch_extract(
        _scheduled(spark),
        br.make_synthetic_renderer(N_PAGES, N_HOSTS, settle_every=4),
        settle_attempts=3,
    ).collect()
    assert len(rendered) == N_PAGES
    for r in rendered:
        i = syn.page_index_of_url(r.canon_url, N_HOSTS)
        assert r.fetch_status == "rendered"
        # every 4th page's DOM needs one extra settle round
        assert r.attempts == (2 if i % 4 == 0 else 1), r


def test_readiness_timeout_marks_not_raises(spark):
    rendered = br.rendered_fetch_extract(
        _scheduled(spark),
        br.make_synthetic_renderer(N_PAGES, N_HOSTS, settle_every=4),
        settle_attempts=1,
    ).collect()
    timed_out = {
        syn.page_index_of_url(r.canon_url, N_HOSTS)
        for r in rendered
        if r.fetch_status == "timeout"
    }
    assert timed_out == {i for i in range(N_PAGES) if i % 4 == 0}
    for r in rendered:
        if r.fetch_status == "timeout":
            assert r.caption is None and r.figures is None


def test_lazy_promotion_and_figure_extraction(spark):
    # raw DOM: no readiness pane, figure img lazy (data-lg-src, no src)
    raw = br.raw_html_of_index(0, N_HOSTS)
    assert "pane-pcw-relatedcon" not in raw
    assert "data-lg-src=" in raw and "<img src=" not in raw
    # rendered DOM: pane present, src promoted, data-lg-src retained
    done = br.rendered_html_of_index(0, N_HOSTS)
    assert "pane-pcw-relatedcon" in done
    assert "<img src=" in done and "data-lg-src=" in done

    rendered = br.rendered_fetch_extract(
        _scheduled(spark), br.make_synthetic_renderer(N_PAGES, N_HOSTS)
    ).collect()
    for r in rendered:
        i = syn.page_index_of_url(r.canon_url, N_HOSTS)
        host = r.canon_url.split("/page/")[0]
        path = br._figure_path_of_index(i)
        expect = [host + path] if path else []
        assert list(r.figures) == expect, (i, r.figures)
        assert r.content and "pagefulltext" in r.content


def test_rendered_superset_of_plain_fetch(spark):
    """On settled pages S6 returns exactly what S4 returns, plus the
    rendered-DOM columns — the two fetch stages agree on the shared
    contract (caption/links/image_id)."""
    plain = fetch_mod.fetch_extract(
        _scheduled(spark), fetch_mod.make_synthetic_fetcher(N_PAGES, N_HOSTS)
    ).select("canon_url", "image_id", "caption", "links")
    rich = br.rendered_fetch_extract(
        _scheduled(spark), br.make_synthetic_renderer(N_PAGES, N_HOSTS)
    ).select("canon_url", "image_id", "caption", "links")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, rich.collect()))


def test_screenshot_crop_restores_origin_dims_and_psnr(spark):
    rendered = br.rendered_fetch_extract(
        _scheduled(spark), br.make_synthetic_renderer(N_PAGES, N_HOSTS)
    )
    figs = rendered.select(F.explode("figures").alias("figure_url"))
    shots = br.screenshot_figures(figs, border=4).cache()
    try:
        rows = shots.collect()
        assert rows and all(r.fmt == "jpeg" for r in rows)
        for r in rows:
            i = int(br._FIGURE_URL_RE.match(r.figure_url).group(2))
            w, h = syn.page_image_size(i)
            # the black letterbox border is fully cropped away
            assert (r.w, r.h) == (w, h), r.figure_url
        fid = br.screenshot_fidelity(shots).collect()
        assert all(f.psnr_vs_origin >= 40.0 for f in fid), min(
            f.psnr_vs_origin for f in fid
        )
    finally:
        shots.unpersist()


def test_screenshot_browser_recycling(spark):
    figs = spark.createDataFrame(
        [(f"https://h1.example.org/figures/fig{i:08d}.jpg",) for i in range(7)],
        "figure_url string",
    ).coalesce(1)
    rows = br.screenshot_figures(figs, recycle_every=2).collect()
    # 7 navigations in one partition, recycle every 2: sessions 0..3
    assert sorted(r.browser_session for r in rows) == [0, 0, 1, 1, 2, 2, 3]


def test_new_figures_dedup_by_original_name(spark):
    figs = spark.createDataFrame(
        [(f"https://h1.example.org/figures/fig{i:08d}.jpg",) for i in range(6)],
        "figure_url string",
    )
    resources = spark.createDataFrame(
        [("fig00000000.jpg",), ("fig00000003.jpg",)], "original_name string"
    )
    fresh = br.new_figures(figs, resources).collect()
    names = sorted(r.original_name for r in fresh)
    assert names == [f"fig{i:08d}.jpg" for i in (1, 2, 4, 5)]
    # after storing everything, a second pass costs zero navigations
    all_named = figs.withColumn(
        "original_name", F.element_at(F.split("figure_url", "/"), -1)
    ).select("original_name")
    assert br.new_figures(figs, all_named).count() == 0


def test_engine_rendered_fetch_equals_join_fetch(spark, tmp_path):
    """The wave loop run on the browser-rendered fetcher reproduces the
    join-path crawl exactly (same seen set, same crawl order) — S6 is a
    drop-in fetch stage, not a fork of the engine."""
    from literature_crawler_spark.plans.crawl import CrawlEngine
    from literature_crawler_spark.plans.state import SnapshotStore

    corpus = {
        "pages": syn.generate_pages(spark, 200, 6, with_images=False),
        "seeds": syn.generate_seeds(spark, 20, 200, 6),
        "robots": syn.generate_robots(spark),
        "politeness": syn.generate_politeness(spark, 6),
    }

    def run(path, fetcher):
        eng = CrawlEngine(
            spark, SnapshotStore(path), corpus["pages"], corpus["robots"],
            corpus["politeness"], fetcher=fetcher,
        )
        eng.run(corpus["seeds"], max_waves=2)
        seen = {r.canon_url for r in eng.seen().collect()}
        order = [
            (r.wave, r.seq, r.canon_url)
            for r in eng.crawl_order().orderBy("wave", "seq").collect()
        ]
        return seen, order

    join_state = run(str(tmp_path / "join"), None)
    rendered_state = run(
        str(tmp_path / "rendered"),
        br.as_fetcher(br.make_synthetic_renderer(200, 6, settle_every=5)),
    )
    assert join_state == rendered_state


def test_harvest_figures_resource_rows(spark):
    """Full figure tail: rendered rows -> name-dedup -> screenshot ->
    resource rows; a second harvest against the grown resources table
    re-navigates nothing (the reference's original_name skip)."""
    rendered = br.rendered_fetch_extract(
        _scheduled(spark, 12), br.make_synthetic_renderer(N_PAGES, N_HOSTS)
    )
    pre = spark.createDataFrame(
        [("fig00000000.jpg",), ("fig00000003.jpg",)], "original_name string"
    )
    rows = br.harvest_figures(rendered, pre).collect()
    # pages 0..11 minus no-figure pages (i%3==2) minus the 2 pre-stored
    want = sorted(
        f"fig{i:08d}.jpg" for i in range(12) if i % 3 != 2 and i not in (0, 3)
    )
    assert sorted(r.original_name for r in rows) == want
    for r in rows:
        assert r.type == "jpeg" and r.bytes is not None and r.w > 0
        assert r.uri.endswith(r.original_name)
        assert r.page_url and "/page/" in r.page_url
    # append-everything then harvest again: zero new rows
    grown = pre.unionByName(
        spark.createDataFrame([(n,) for n in want], "original_name string")
    )
    assert br.harvest_figures(rendered, grown).count() == 0


def test_harvest_dedups_shared_names_within_run(spark):
    """A name reachable from two hosts is navigated ONCE per run — the
    reference appends each screenshotted name to
    resource_original_name_list as its loop goes
    (current_protocol_crawl_util.py:64-70), so within-run repeats of a
    name are skipped, not just names already in the resources table."""
    rendered = spark.createDataFrame(
        [
            ("https://h1.example.org/page/a", "fetched",
             ["https://h1.example.org/figures/fig00000001.jpg"]),
            ("https://h2.example.org/page/b", "fetched",
             ["https://h2.example.org/figures/fig00000001.jpg"]),
        ],
        "canon_url string, fetch_status string, figures array<string>",
    )
    rows = br.harvest_figures(rendered).collect()
    assert len(rows) == 1
    # deterministic first-seen pick: lexicographically smallest figure URL
    assert rows[0].uri == "https://h1.example.org/figures/fig00000001.jpg"
    assert rows[0].original_name == "fig00000001.jpg"


def test_annotation_loader_loop_semantics():
    """The incremental-scroll loader's exact loop behavior
    (current_local_deal.py:337-361): reach the total, bail after 3 empty
    rounds, respect the absolute cap."""
    assert br.load_annotations(0) == (0, 1)
    assert br.load_annotations(1) == (1, 1)
    assert br.load_annotations(4) == (4, 2)
    assert br.load_annotations(5, per_round=1) == (5, 5)
    # a page that never produces annotations: 3 zero-progress rounds, bail
    assert br.load_annotations(3, per_round=0) == (0, 4)
    # absolute round cap wins over slow progress
    loaded, rounds = br.load_annotations(100, per_round=1, max_rounds=8)
    assert rounds == 9 and loaded == 9


def test_rendered_annotation_columns(spark):
    rendered = br.rendered_fetch_extract(
        _scheduled(spark, 15), br.make_synthetic_renderer(N_PAGES, N_HOSTS)
    ).collect()
    for r in rendered:
        i = syn.page_index_of_url(r.canon_url, N_HOSTS)
        total = i % 5
        assert r.n_annotations == total
        assert r.annotation_rounds == max(1, -(-total // 2))


def test_selenium_renderer_guarded():
    """Without selenium the factory raises the documented swap-point
    error; with it, the renderer contract is exercised against a real
    headless Chrome over a loopback page (skips wherever either piece
    is absent — this sandbox ships neither)."""
    try:
        import selenium  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            br.make_selenium_renderer()
        return
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):  # noqa: N802
            body = (
                b"<html><head><title>Real T</title></head><body>"
                b'<img data-lg-src="/figs/f1.png">'
                b'<a href="/next">n</a></body></html>'
            )
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        try:
            render = br.make_selenium_renderer(timeout_s=5, scroll_rounds=2)
            out = render(f"http://127.0.0.1:{srv.server_address[1]}/page/x")
        except Exception:
            pytest.skip("selenium importable but no Chrome binary")
        assert out is not None and out["status"] == "rendered"
        assert out["caption"] == "Real T"
        assert any(f.endswith("/figs/f1.png") for f in out["figures"])
    finally:
        srv.shutdown()


def test_pixels_helper_matches_corpus(spark):
    """page_image_pixels is the SAME field generate_pages encodes — the
    screenshot fidelity gate compares against the true origin."""
    pages = syn.generate_pages(spark, 8, N_HOSTS).collect()
    from literature_crawler_spark.operators.images import decode_image

    for p in pages:
        i = int(p.image_id.split("-")[1])
        px, w, h, _ = decode_image(bytes(p.bytes))
        want = syn.page_image_pixels(i)
        assert (w, h) == (want.shape[1], want.shape[0])
        if p.fmt != "jpeg":  # lossless formats round-trip exactly
            assert np.array_equal(px, want)
