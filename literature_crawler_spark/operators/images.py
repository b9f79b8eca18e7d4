"""Image payload pipeline: encode/decode, perceptual hash, PSNR — Arrow UDFs.

The reference stores binary assets as ``LargeBinary content`` rows and does
per-row NumPy/PIL work (black-border crop ``app/util/pic_back_deal.py:4-35``,
PDF->PNG raster ``app/service/common/parse_pdf.py:266-305``, md5 read-back
``app/util/oss_util.py:54-72``). Here images are an opaque ``binary`` column
processed in Arrow batches via pandas UDFs / ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partitioning) is real and scale-correct.

Real-world codecs (libjpeg/libpng via Pillow) are NOT in this container, so
the byte format is a deterministic fake codec ("FIMG"): a tiny header +
raw/quantized RGB payload. ``fmt='jpeg'`` quantizes pixel values (step 6),
giving a true lossy round-trip with PSNR ~42 dB — exercising the
PSNR >= 40 dB fidelity gate from BASELINE.json for real. Swapping in Pillow
means replacing `_encode_payload`/`_decode_payload` only; every Spark-facing
signature stays fixed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FIMG"
_JPEG_Q = 5  # round-to-nearest quantization step: PSNR ~= 45 dB (>= 40 gate)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


# ---------------------------------------------------------------- codec ----


def pixels_for_id(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixel field for a synthetic image id:
    gradient + seeded noise (seed = stable hash of the id)."""
    rng = np.random.default_rng(_stable_seed(image_id))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-20, 21, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _stable_seed(s: str) -> np.uint32:
    # FNV-1a — Python's hash() is salted per-process, unusable for fixtures
    h = np.uint64(0xCBF29CE484222325)
    for b in s.encode():
        h = np.uint64((int(h) ^ b) * 0x100000001B3 % (2**64))
    return np.uint32(int(h) % (2**32))


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode HxWx3 uint8 pixels into the fake byte format.

    png/gif: lossless raw payload. jpeg: quantized payload (lossy).
    """
    h, w, _ = pixels.shape
    payload = pixels
    if fmt == "jpeg":
        q = np.uint16(_JPEG_Q)
        payload = np.clip(
            (pixels.astype(np.uint16) + q // 2) // q * q, 0, 255
        ).astype(np.uint8)
    header = (
        MAGIC
        + fmt.encode().ljust(4, b"\0")
        + int(w).to_bytes(2, "big")
        + int(h).to_bytes(2, "big")
    )
    return header + payload.tobytes()


def decode_image(data: bytes) -> tuple[np.ndarray | None, int, int, str]:
    """Decode fake-codec bytes -> (pixels|None, w, h, fmt)."""
    if data is None or len(data) < 12 or data[:4] != MAGIC:
        return None, 0, 0, ""
    fmt = data[4:8].rstrip(b"\0").decode()
    w = int.from_bytes(data[8:10], "big")
    h = int.from_bytes(data[10:12], "big")
    body = np.frombuffer(data, dtype=np.uint8, offset=12)
    if body.size != w * h * 3:
        return None, w, h, fmt
    return body.reshape(h, w, 3), w, h, fmt


# ------------------------------------------------------------ numpy core ----


def phash64_pixels(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean of the gray image vs its
    mean — the classic aHash. Deterministic, pure NumPy."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # block-mean resize to 8x8 (pad to multiples of 8 by edge-clamping)
    ys = (np.arange(8 + 1) * h // 8).astype(int)
    xs = (np.arange(8 + 1) * w // 8).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


# ------------------------------------------------------------- Spark UDFs ----


@F.pandas_udf(DECODE_SCHEMA)
def decode_image_stats(data: pd.Series) -> pd.DataFrame:
    """Vectorized decode: bytes -> (w, h, fmt, phash, ok) per Arrow batch."""
    rows = []
    for blob in data:
        px, w, h, fmt = decode_any(blob)
        if px is None:
            rows.append((w, h, fmt, 0, False))
        else:
            rows.append((w, h, fmt, phash64_pixels(px), True))
    return pd.DataFrame(rows, columns=["w", "h", "fmt", "phash", "ok"])


@F.pandas_udf(T.DoubleType())
def psnr_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """PSNR between two image-bytes columns (inf -> 999.0 for SQL-friendliness)."""
    out = []
    for ba, bb in zip(a, b):
        pa, *_ = decode_any(ba)
        pb, *_ = decode_any(bb)
        if pa is None or pb is None or pa.shape != pb.shape:
            out.append(float("nan"))
        else:
            v = psnr(pa, pb)
            out.append(999.0 if np.isinf(v) else float(v))
    return pd.Series(out)


def resize_images(df: DataFrame, bytes_col: str, out_w: int, out_h: int) -> DataFrame:
    """Block-mean resize of every image to (out_w, out_h); adds
    ``resized`` binary column. ``mapInPandas`` so one Arrow batch of blobs
    is processed per call — the multimodal feature-extraction shape."""

    schema = T.StructType(df.schema.fields + [T.StructField("resized", T.BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for blob in pdf[bytes_col]:
                px, w, h, fmt = decode_any(blob)
                if px is None:
                    res.append(None)
                    continue
                ys = (np.arange(out_h + 1) * h // out_h).astype(int)
                xs = (np.arange(out_w + 1) * w // out_w).astype(int)
                out = np.empty((out_h, out_w, 3), dtype=np.uint8)
                for i in range(out_h):
                    for j in range(out_w):
                        out[i, j] = px[
                            ys[i] : max(ys[i + 1], ys[i] + 1),
                            xs[j] : max(xs[j + 1], xs[j] + 1),
                        ].mean(axis=(0, 1))
                res.append(encode_image(out, fmt or "png"))
            pdf = pdf.copy()
            pdf["resized"] = res
            yield pdf

    return df.mapInPandas(run, schema)


# The reference crops screenshots' black borders with per-line while
# loops over this exact RGB value (pic_back_deal.py:4-35).
BORDER_RGB = (14, 14, 14)


def crop_border_pixels(px: np.ndarray, border=BORDER_RGB) -> np.ndarray:
    """Trim outer rows/columns that are entirely the border color — the
    reference's edge scan (pic_back_deal.py:18-29) vectorized to one
    boolean mask + argmax instead of four Python while loops.

    Deviation: the reference's PIL ``crop((left, top, right, bottom))``
    drops the last non-border row/column (off-by-one, right/bottom are
    exclusive there); this keeps every non-border row/column. An image
    that is ALL border crops to an empty 0x0 array.
    """
    mask = np.all(px == np.asarray(border, dtype=px.dtype), axis=2)
    keep_rows = ~mask.all(axis=1)
    keep_cols = ~mask.all(axis=0)
    if not keep_rows.any() or not keep_cols.any():
        return px[0:0, 0:0]
    r0 = int(np.argmax(keep_rows))
    r1 = len(keep_rows) - int(np.argmax(keep_rows[::-1]))
    c0 = int(np.argmax(keep_cols))
    c1 = len(keep_cols) - int(np.argmax(keep_cols[::-1]))
    return px[r0:r1, c0:c1]


def crop_black_borders(df: DataFrame, bytes_col: str) -> DataFrame:
    """Adds ``cropped`` (binary), ``crop_w``, ``crop_h``: decode ->
    border trim -> re-encode per Arrow batch (mapInPandas, same multimodal
    plumbing shape as resize_images)."""
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("cropped", T.BinaryType()),
            T.StructField("crop_w", T.IntegerType()),
            T.StructField("crop_h", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_b, out_w, out_h = [], [], []
            for blob in pdf[bytes_col]:
                px, _w, _h, fmt = decode_any(blob)
                if px is None:
                    out_b.append(None)
                    out_w.append(None)
                    out_h.append(None)
                    continue
                cropped = crop_border_pixels(px)
                h, w = cropped.shape[:2]
                out_b.append(encode_image(cropped, fmt or "png") if h and w else None)
                out_w.append(w)
                out_h.append(h)
            pdf = pdf.copy()
            pdf["cropped"], pdf["crop_w"], pdf["crop_h"] = out_b, out_w, out_h
            yield pdf

    return df.mapInPandas(run, schema)


def _pillow():
    """Guarded Pillow import: the sandbox has no image libs baked in, so
    the real codec activates only where the lib exists (deploy)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_external_format(data: bytes) -> tuple[np.ndarray | None, int, int, str]:
    """Decode a real-world codec (JPEG/PNG/GIF/WebP via Pillow) into the
    same ``(pixels|None, w, h, fmt)`` tuple the fake codec produces —
    drop-in for every stage. Reference decode sites:
    ``app/util/pic_back_deal.py:4-35`` (cv2 reads screenshots),
    ``app/service/common/parse_pdf.py:266-305`` (fitz rasters).

    Raises NotImplementedError where Pillow is absent (this sandbox) —
    the documented swap point; inside the Spark stages use
    ``decode_any``, which degrades to a marked-undecodable row instead
    of failing the task."""
    Image = _pillow()
    if Image is None:
        raise NotImplementedError(
            "real image codecs require Pillow/libjpeg, absent from this "
            "environment; use the FIMG fake codec (encode_image/decode_image)"
        )
    import io

    try:
        with Image.open(io.BytesIO(data)) as im:
            fmt = (im.format or "").lower()
            px = np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None, 0, 0, ""
    h, w = px.shape[:2]
    return px, w, h, fmt


def encode_external_format(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode HxWx3 uint8 pixels through Pillow (the real-codec twin of
    ``encode_image``); raises where Pillow is absent."""
    Image = _pillow()
    if Image is None:
        raise NotImplementedError("Pillow absent; use encode_image (FIMG)")
    import io

    buf = io.BytesIO()
    Image.fromarray(pixels, mode="RGB").save(buf, format=fmt.upper())
    return buf.getvalue()


def decode_any(data: bytes) -> tuple[np.ndarray | None, int, int, str]:
    """Codec dispatch for the Spark stages: FIMG blobs take the fake
    codec; anything else takes the Pillow codec when the lib exists.
    Never raises — an undecodable blob is ``(None, 0, 0, "")``, the
    marked-row contract every mapInPandas stage already handles — so a
    real JPEG fed to the pipeline decodes at deploy and degrades to a
    counted failure (not a task abort) in codec-less environments."""
    if data is not None and len(data) >= 4 and bytes(data[:4]) == MAGIC:
        return decode_image(data)
    if _pillow() is None:
        return None, 0, 0, ""
    return decode_external_format(data)


def phash_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two phash64 columns (JVM-side bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


# ------------------------------------------------------- video / audio ----
# Multimodal columns are opaque binary + typed metadata; decode runs inside
# mapInPandas so one Arrow batch of blobs is handled per call. Real codecs
# (ffmpeg/libav) are NOT in this container — the byte format is a fake
# container ("FVID": frame count + length-prefixed FIMG frames) so the
# Spark-side plumbing (schema, row explosion, batch shape) is real and
# tested; swap decode_video/decode_audio for the real thing at deploy.

VIDEO_MAGIC = b"FVID"

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def encode_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Fake video container: FVID + u16 frame count + [u32 len | FIMG]*."""
    blobs = [encode_image(f, fmt) for f in frames]
    out = [VIDEO_MAGIC, len(blobs).to_bytes(2, "big")]
    for b in blobs:
        out.append(len(b).to_bytes(4, "big"))
        out.append(b)
    return b"".join(out)


def decode_video(data: bytes) -> list[bytes]:
    """FVID container -> list of FIMG frame blobs ([] on garbage)."""
    if data is None or len(data) < 6 or data[:4] != VIDEO_MAGIC:
        return []
    n = int.from_bytes(data[4:6], "big")
    frames, off = [], 6
    for _ in range(n):
        if off + 4 > len(data):
            return []
        ln = int.from_bytes(data[off : off + 4], "big")
        off += 4
        if off + ln > len(data):
            return []
        frames.append(data[off : off + ln])
        off += ln
    return frames


def sample_video_frames(
    df: DataFrame,
    bytes_col: str,
    id_col: str,
    stride: int = 2,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling: one row per kept frame (every ``stride``-th, capped
    at ``max_frames``) with decoded stats + the frame blob. One input row
    fans out to <= max_frames output rows inside the same Arrow batch — no
    shuffle; at 100 TB partition on the video id upstream so blobs of one
    asset stay together."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name == id_col] + FRAME_SCHEMA.fields
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                frames = decode_video(blob)
                n = len(frames)
                for idx in list(range(0, n, max(stride, 1)))[:max_frames]:
                    px, w, h, _fmt = decode_image(frames[idx])
                    rows.append(
                        {
                            id_col: rid,
                            "frame_idx": idx,
                            "n_frames": n,
                            "w": w,
                            "h": h,
                            # phash64_pixels already returns the signed
                            # 64-bit view; a uint64 round-trip would raise
                            # on negative hashes under NumPy >= 2
                            "phash": phash64_pixels(px) if px is not None else None,
                            "frame": frames[idx],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema)


def decode_audio(data: bytes) -> tuple[np.ndarray | None, int]:
    """Decode an audio blob into ``(mono float32 samples in [-1, 1],
    sample_rate)``.

    Real formats: uncompressed RIFF/WAVE decodes through the stdlib
    ``wave`` module (always available, 8/16/32-bit PCM, channels
    averaged to mono); everything the wave module cannot handle —
    non-RIFF formats AND RIFF variants like 24-bit PCM or float WAV —
    falls through to ``soundfile`` (libsndfile) when importable, the
    guarded deploy codec. Returns ``(None, 0)`` for undecodable blobs:
    inside the Spark stages a bad blob is a marked row, never a task
    abort."""
    if data is None or len(data) < 12:
        return None, 0
    if bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(bytes(data))) as w:
                n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError, OSError):
            return _soundfile_decode(data)  # e.g. float/extensible WAV
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None or n_ch < 1:
            # 24-bit PCM etc.: the wave module read it but NumPy has no
            # 3-byte dtype — a real recording must not silently fall back
            # to the fake byte-spectrum, so hand the blob to soundfile
            return _soundfile_decode(data)
        arr = np.frombuffer(raw, dtype=dtype).astype(np.float32)
        if width == 1:
            arr = (arr - 128.0) / 128.0
        else:
            arr = arr / float(2 ** (8 * width - 1))
        if n_ch > 1:
            arr = arr[: (arr.size // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
        return arr, rate
    return _soundfile_decode(data)


def _soundfile_decode(data: bytes) -> tuple[np.ndarray | None, int]:
    """Guarded libsndfile decode — (None, 0) where the lib is absent or
    the blob is not audio."""
    try:
        import soundfile as sf  # noqa: PLC0415 — deploy-only codec
    except ImportError:
        return None, 0
    import io

    try:
        arr, rate = sf.read(io.BytesIO(bytes(data)), dtype="float32")
    except Exception:
        return None, 0
    if arr.ndim > 1:
        arr = arr.mean(axis=1)
    return arr.astype(np.float32), int(rate)


def _fft_band_energies(samples: np.ndarray, n_bands: int) -> np.ndarray:
    """Mean |rFFT| magnitude per equal-width frequency band — the
    deterministic real-signal feature the fake byte-spectrum stands in
    for (MFCC/mel at deploy would slot in here)."""
    mag = np.abs(np.fft.rfft(samples))
    pad = (-mag.size) % n_bands
    if pad:
        mag = np.pad(mag, (0, pad))
    return mag.reshape(n_bands, -1).mean(axis=1).astype(np.float32)


def audio_features(df: DataFrame, bytes_col: str, n_bands: int = 16) -> DataFrame:
    """Fixed-length feature vector per audio blob. RIFF/WAVE (and any
    soundfile-decodable) blobs take the REAL path — ``decode_audio`` to
    mono PCM, then rFFT band energies; other blobs keep the deterministic
    fake byte-spectrum (the stand-in the driver fixture uses). Adds
    ``audio_feat: array<float>``; Arrow-batched, schema/partitioning are
    the real multimodal plumbing either way."""
    schema = T.StructType(
        df.schema.fields + [T.StructField("audio_feat", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[bytes_col]:
                if blob is None:
                    feats.append(None)
                    continue
                samples, _rate = decode_audio(blob)
                if samples is not None and samples.size:
                    feats.append(_fft_band_energies(samples, n_bands).tolist())
                    continue
                arr = np.frombuffer(blob[:4096], dtype=np.uint8).astype(np.float32)
                pad = (-arr.size) % n_bands
                if pad:
                    arr = np.pad(arr, (0, pad))
                bands = arr.reshape(n_bands, -1).mean(axis=1) / 255.0
                feats.append(bands.astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["audio_feat"] = feats
            yield pdf

    return df.mapInPandas(run, schema)
