"""Image pipeline: fake-codec round-trip, PSNR gate, phash, resize, decode UDF.

FIXTURES.md invariant 3: decoded pixels allclose for lossless formats,
PSNR >= 40 dB for lossy, caption exact equality.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from literature_crawler_spark.operators import images as im
from literature_crawler_spark.sources import synthetic as syn


def test_lossless_roundtrip():
    px = im.pixels_for_id("img-0000000001", 32, 24)
    out, w, h, fmt = im.decode_image(im.encode_image(px, "png"))
    assert (w, h, fmt) == (32, 24, "png")
    assert np.array_equal(out, px)


def test_lossy_psnr_gate():
    px = im.pixels_for_id("img-0000000002", 48, 48)
    out, *_ = im.decode_image(im.encode_image(px, "jpeg"))
    assert not np.array_equal(out, px)  # genuinely lossy
    v = im.psnr(px, out)
    assert 40.0 <= v < 60.0, v


def test_phash_properties():
    a = im.pixels_for_id("img-a", 40, 40)
    near = np.clip(a.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    far = im.pixels_for_id("img-b", 40, 40)[:, ::-1][::-1]
    ha, hn, hf = map(im.phash64_pixels, (a, near, far))
    ham = lambda x, y: bin((x % 2**64) ^ (y % 2**64)).count("1")
    assert ham(ha, hn) <= 4
    assert ham(ha, hf) > 4


def test_decode_stats_udf_and_fidelity(spark):
    pages = syn.generate_pages(spark, 120, 6, with_images=True)
    stats = pages.select(
        F.col("w").alias("gen_w"), F.col("h").alias("gen_h"), F.col("fmt").alias("gen_fmt"),
        im.decode_image_stats(F.col("bytes")).alias("d"),
    ).select("gen_w", "gen_h", "gen_fmt", "d.*")
    rows = stats.collect()
    assert len(rows) == 120
    for r in rows:
        assert r.ok, r
        assert (r.w, r.h, r.fmt) == (r.gen_w, r.gen_h, r.gen_fmt)


def test_decode_stats_phash_matches_stored(spark):
    """phash recomputed by the decode UDF == phash stored at generation
    time for lossless formats (lossy may flip borderline bits)."""
    pages = syn.generate_pages(spark, 100, 6, with_images=True)
    chk = pages.filter(F.col("fmt") != "jpeg").select(
        "phash", im.decode_image_stats(F.col("bytes")).alias("d")
    )
    mismatches = chk.filter(F.col("phash") != F.col("d.phash")).count()
    assert mismatches == 0


def test_psnr_udf_lossy_gate(spark):
    """All jpeg rows in the corpus re-encode within [40, 60) dB; lossless = 999."""
    pages = syn.generate_pages(spark, 100, 6, with_images=True)
    v = pages.select(
        "fmt", im.psnr_udf(F.col("bytes"), F.col("bytes")).alias("self_psnr")
    )
    assert v.filter(F.col("self_psnr") != 999.0).count() == 0


def test_resize(spark):
    pages = syn.generate_pages(spark, 20, 4, with_images=True)
    out = im.resize_images(pages, "bytes", 8, 8).select("image_id", "resized").collect()
    for r in out:
        px, w, h, _ = im.decode_image(r.resized)
        assert (w, h) == (8, 8) and px is not None


def test_external_codec_guarded():
    """Without Pillow the explicit swap point raises; the in-stage
    dispatch (decode_any) instead degrades to a marked-undecodable row."""
    if im._pillow() is None:
        with pytest.raises(NotImplementedError):
            im.decode_external_format(b"\xff\xd8\xff")
    assert im.decode_any(b"\xff\xd8\xff\x00not-an-image") == (None, 0, 0, "") or (
        im._pillow() is not None
    )
    # FIMG blobs always dispatch to the fake codec, Pillow or not
    px = im.pixels_for_id("disp", 6, 5)
    got, w, h, fmt = im.decode_any(im.encode_image(px, "png"))
    assert (w, h, fmt) == (6, 5, "png") and (got == px).all()


def test_video_roundtrip_and_frame_sampling(spark):
    vids = syn.generate_videos(spark, 12, n_frames=6, side=12)
    out = im.sample_video_frames(
        vids.select("video_id", "bytes"), "bytes", "video_id", stride=2, max_frames=3
    )
    rows = out.collect()
    # 6 frames, stride 2 -> indices 0,2,4 per video
    assert len(rows) == 12 * 3
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r)
    for vid, frames in by_vid.items():
        assert sorted(f.frame_idx for f in frames) == [0, 2, 4]
        for f in frames:
            assert f.n_frames == 6 and (f.w, f.h) == (12, 12)
            px, w, h, _ = im.decode_image(f.frame)
            assert px is not None and (w, h) == (12, 12)
            assert f.phash == im.phash64_pixels(px) - (1 << 64) * (im.phash64_pixels(px) >= 1 << 63)


def test_video_decode_garbage_is_empty():
    assert im.decode_video(b"nope") == []
    assert im.decode_video(None) == []
    assert im.decode_video(im.VIDEO_MAGIC + (5).to_bytes(2, "big") + b"\x00") == []


def test_audio_features_deterministic_shape(spark):
    pages = syn.generate_pages(spark, 10, 4, with_images=True)
    f1 = im.audio_features(pages.select("image_id", "bytes"), "bytes", n_bands=16)
    rows = {r.image_id: r.audio_feat for r in f1.collect()}
    assert all(len(v) == 16 for v in rows.values())
    rows2 = {r.image_id: r.audio_feat for r in f1.collect()}
    assert rows == rows2


def _wav_bytes(freq_hz=440.0, rate=8000, n=2048, channels=1, width=2):
    """Deterministic PCM WAV via the stdlib wave module."""
    import io
    import wave

    import numpy as np

    t = np.arange(n) / rate
    mono = np.sin(2 * np.pi * freq_hz * t)
    if width == 2:
        pcm = (mono * 32767).astype(np.int16)
    elif width == 1:
        pcm = ((mono * 127) + 128).astype(np.uint8)
    else:
        pcm = (mono * (2**31 - 1)).astype(np.int32)
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue(), mono


def test_audio_decode_real_wav():
    """The real-audio path: stdlib-WAV blobs decode to mono float32
    samples allclose to the source signal, at the declared rate."""
    import numpy as np

    blob, mono = _wav_bytes()
    samples, rate = im.decode_audio(blob)
    assert rate == 8000 and samples.dtype == np.float32
    assert np.allclose(samples, mono, atol=2 / 32767)
    # stereo averages to mono; 8-bit decodes too
    blob2, mono2 = _wav_bytes(channels=2)
    s2, _ = im.decode_audio(blob2)
    assert np.allclose(s2, mono2, atol=2 / 32767)
    blob3, mono3 = _wav_bytes(width=1)
    s3, _ = im.decode_audio(blob3)
    assert np.allclose(s3, mono3, atol=2 / 127)
    # garbage / truncated RIFF: marked undecodable, never a raise
    assert im.decode_audio(b"RIFF\x00\x00\x00\x00WAVEjunk") == (None, 0)
    assert im.decode_audio(b"\x00" * 64) == (None, 0)


def test_audio_features_real_wav_spark(spark):
    """audio_features dispatches WAV blobs to the decode->rFFT path in
    the real mapInPandas stage: a 440 Hz tone's dominant band is the one
    containing 440 Hz, and the vector matches the local computation."""
    import numpy as np

    blob, _ = _wav_bytes()
    df = spark.createDataFrame([("a", bytearray(blob))], "id string, bytes binary")
    feats = im.audio_features(df, "bytes", n_bands=16).collect()[0].audio_feat
    samples, rate = im.decode_audio(blob)
    want = im._fft_band_energies(samples, 16)
    assert np.allclose(feats, want, rtol=1e-5)
    # band k spans [k, k+1) * (rate/2)/16 = 250 Hz: 440 Hz -> band 1
    assert int(np.argmax(feats)) == 1


def test_crop_border_pixels_numpy():
    import numpy as np

    inner = im.pixels_for_id("crop-test", 10, 8)
    # guarantee no interior pixel equals the border color
    inner = np.where(np.all(inner == 14, axis=2, keepdims=True), 15, inner).astype(np.uint8)
    padded = np.full((8 + 5, 10 + 7, 3), 14, dtype=np.uint8)
    padded[2 : 2 + 8, 3 : 3 + 10] = inner
    out = im.crop_border_pixels(padded)
    assert out.shape == inner.shape
    assert (out == inner).all()
    # all-border image crops to empty
    assert im.crop_border_pixels(np.full((4, 4, 3), 14, dtype=np.uint8)).size == 0
    # no border: unchanged
    assert (im.crop_border_pixels(inner) == inner).all()


def test_crop_black_borders_spark(spark):
    import numpy as np
    import pandas as pd

    def make_blob(i):
        inner = im.pixels_for_id(f"img-{i}", 12, 9)
        inner = np.where(np.all(inner == 14, axis=2, keepdims=True), 15, inner).astype(np.uint8)
        padded = np.full((9 + 4, 12 + 6, 3), 14, dtype=np.uint8)
        padded[1 : 1 + 9, 2 : 2 + 12] = inner
        return im.encode_image(padded, "png")

    df = spark.createDataFrame(
        pd.DataFrame({"image_id": [f"i{i}" for i in range(6)],
                      "bytes": [make_blob(i) for i in range(6)]})
    )
    rows = im.crop_black_borders(df, "bytes").collect()
    for r in rows:
        assert (r.crop_w, r.crop_h) == (12, 9)
        px, w, h, fmt = im.decode_image(bytes(r.cropped))
        assert (w, h, fmt) == (12, 9, "png") and px is not None


def test_real_codec_roundtrip_when_pillow_present(spark):
    """The SAME fidelity gates through the real codec wherever Pillow
    exists (skips cleanly in codec-less sandboxes): lossless PNG
    round-trip is exact, lossy JPEG clears the PSNR >= 40 dB gate, and a
    real blob flows through the decode_image_stats Spark stage via
    decode_any."""
    pytest.importorskip("PIL")
    import numpy as np

    px = im.pixels_for_id("real-codec", 24, 18)
    png = im.encode_external_format(px, "png")
    got, w, h, fmt = im.decode_external_format(png)
    assert (w, h, fmt) == (24, 18, "png") and (got == px).all()
    jpg = im.encode_external_format(px, "jpeg")
    got2, *_ = im.decode_any(jpg)
    assert got2 is not None and im.psnr(px, got2) >= 40
    df = spark.createDataFrame(
        [("p", bytearray(png)), ("j", bytearray(jpg))], "id string, bytes binary"
    )
    rows = {
        r.id: r.s
        for r in df.select("id", im.decode_image_stats(F.col("bytes")).alias("s")).collect()
    }
    assert rows["p"].ok and (rows["p"].w, rows["p"].h) == (24, 18)
    assert rows["j"].ok and rows["j"].fmt == "jpeg"
    assert rows["p"].phash == im.phash64_pixels(px)
    assert np.int64(rows["j"].phash) is not None


def test_audio_24bit_routes_to_soundfile(monkeypatch):
    """24-bit PCM (sampwidth 3 — no NumPy dtype) must be handed to the
    guarded soundfile codec, not silently fall back to the fake
    byte-spectrum as if it were not audio."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02" * 64)
    blob = buf.getvalue()

    calls = []

    def fake_sf(data):
        calls.append(len(data))
        return None, 0

    monkeypatch.setattr(im, "_soundfile_decode", fake_sf)
    assert im.decode_audio(blob) == (None, 0)
    assert calls, "24-bit WAV bypassed the soundfile fall-through"
