"""Multimodal column plumbing + native codecs (training-data extension).

Images/audio/video travel as opaque `binary` columns with typed metadata.
The Spark-side plumbing — schemas, batch shapes, partition-friendly
signatures — is real and tested, and the decode step is REAL for every
format that needs no external library: uncompressed 24-bpp BMP and
binary PPM (P6) images, PCM WAV audio, and YUV4MPEG2 (y4m) video, all
parsed with struct/numpy only. Richer formats (JPEG/PNG/MP3/MP4) route
through PIL/soundfile WHEN those libraries exist (import-try); otherwise
the row keeps its plumbing columns and null decode columns — never a
crash, and never a fake value pretending to be a decode.

Pattern: mapInPandas over (id, media, meta) so each Arrow batch carries
the raw bytes once; per-batch numpy work; output is a feature row per
asset (or per sampled frame).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("media", BinaryType()),       # opaque encoded bytes
    StructField("width", IntegerType()),      # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes int, content_sha string, "
    "feat array<float>, frame_idx int, "
    "width int, height int, mean_pixel double, "
    "n_samples int, sample_rate int, duration_ms int, rms double"
)


# --------------------------------------------------------------------------
# native codecs (no external libraries)
# --------------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> uncompressed 24-bpp BMP bytes (BITMAPFILE-
    HEADER + BITMAPINFOHEADER, rows bottom-up, 4-byte padded)."""
    h, w, _ = pixels.shape
    row_size = (3 * w + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_size - 3 * w)
    for y in range(h - 1, -1, -1):            # bottom-up row order
        body += pixels[y, :, ::-1].tobytes()  # BGR on disk
        body += pad
    return header + info + bytes(body)


def decode_image(data: bytes) -> dict:
    """Real image decode: BMP (24-bpp uncompressed) and PPM (P6) natively;
    other formats via PIL when installed. Returns {width, height,
    mean_pixel, pixels}; raises NotImplementedError for formats with no
    available decoder."""
    if data[:2] == b"BM":
        (_, _, _, _, offset) = struct.unpack("<2sIHHI", data[:14])
        (hdr, w, h, _, bpp) = struct.unpack("<IiiHH", data[14:30])
        compression = struct.unpack("<I", data[30:34])[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        row_size = (3 * w + 3) // 4 * 4
        rows = []
        for y in range(abs(h)):
            off = offset + y * row_size
            row = np.frombuffer(data, dtype=np.uint8, count=3 * w, offset=off)
            rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
        px = np.stack(rows[::-1] if h > 0 else rows)  # bottom-up -> top-down
        return {"width": w, "height": abs(h),
                "mean_pixel": float(px.astype(np.float64).mean()), "pixels": px}
    if data[:2] == b"P6":
        # P6\n<w> <h>\n<maxval>\n<binary rgb>
        parts = data.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        px = np.frombuffer(parts[3], dtype=np.uint8,
                           count=w * h * 3).reshape(h, w, 3)
        return {"width": w, "height": h,
                "mean_pixel": float(px.astype(np.float64).mean()), "pixels": px}
    try:  # pragma: no cover - PIL absent in this sandbox
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(data)).convert("RGB")
        px = np.asarray(im)
        return {"width": im.width, "height": im.height,
                "mean_pixel": float(px.astype(np.float64).mean()), "pixels": px}
    except ImportError as exc:
        raise NotImplementedError(
            "unrecognized image format and PIL is not installed "
            "(native decoders: BMP 24-bpp, PPM P6)"
        ) from exc


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize on a (h, w, 3) array — pure numpy indexing,
    the library-free counterpart of PIL's Image.resize."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[np.ix_(ys, xs)]


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples -> PCM WAV bytes (44-byte canonical header)."""
    pcm = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )


def decode_audio(data: bytes) -> dict:
    """Real audio decode: PCM WAV (16/8-bit) natively; other formats raise
    NotImplementedError (soundfile/ffmpeg territory). Returns {n_samples,
    sample_rate, n_channels, duration_ms, rms, samples}."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "unrecognized audio format (native decoder: PCM WAV)")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos:pos + 8])
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if fmt is None or pcm is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(f"WAV fmt={audio_fmt} bits={bits}")
    if bits == 16:
        samples = np.frombuffer(pcm, dtype=np.int16)
    else:
        # 8-bit PCM is UNSIGNED with 0x80 as the zero level — center it,
        # or digital silence reads as rms 128 and every file carries a
        # +128 DC bias
        samples = np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128
    n = len(samples) // n_ch
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if n else 0.0
    return {"n_samples": n, "sample_rate": rate, "n_channels": n_ch,
            "duration_ms": n * 1000 // rate, "rms": rms, "samples": samples}


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               colorspace: str = "C420") -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 bytes (plain-text header
    + FRAME markers + planar YUV; chroma planes neutral 0x80). C420
    requires even dimensions."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    if colorspace.startswith("C420"):
        chroma = b"\x80" * ((w // 2) * (h // 2) * 2)
    elif colorspace.startswith("C422"):
        chroma = b"\x80" * ((w // 2) * h * 2)
    elif colorspace.startswith("C444"):
        chroma = b"\x80" * (w * h * 2)
    elif colorspace.startswith("Cmono"):
        chroma = b""
    else:
        raise NotImplementedError(f"y4m colorspace {colorspace}")
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    )
    for f in frames:
        out += b"FRAME\n" + f.tobytes() + chroma
    return bytes(out)


def _parse_y4m_header(data: bytes) -> tuple[int, int, int, int, int, int]:
    """-> (width, height, fps_num, fps_den, chroma_bytes, body_start)."""
    if not data.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "unrecognized video container (native decoder: YUV4MPEG2/y4m)")
    nl = data.index(b"\n")
    w = h = None
    fn, fd, cs = 25, 1, "C420"
    for tok in data[:nl].decode("ascii").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fn, fd = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            cs = tok
    if not w or not h:
        raise NotImplementedError("y4m header missing W/H")
    if cs.startswith("C420"):
        chroma = (w // 2) * (h // 2) * 2
    elif cs.startswith("C422"):
        chroma = (w // 2) * h * 2
    elif cs.startswith("C444"):
        chroma = w * h * 2
    elif cs.startswith("Cmono"):
        chroma = 0
    else:
        raise NotImplementedError(f"y4m colorspace {cs}")
    return w, h, fn, fd, chroma, nl + 1


def probe_video(data: bytes) -> dict:
    """Header metadata + per-frame LUMA BYTE OFFSETS, no pixel
    materialization: O(n_frames) ints regardless of stream length. The
    marker walk validates every FRAME header and the full chroma extent
    of each frame (a partial trailing frame — even one truncated inside
    the chroma planes — is malformed data and must not decode as
    garbage). Pair with decode_video_frame to read only the frames a
    sampler asks for: extract_features' per-asset memory is then
    O(frames_per_video x frame) however long the stream is (round 5
    materialized the full (n, h, w) stack first — an executor OOM on the
    first long video at scale). Non-y4m containers raise
    NotImplementedError (ffmpeg territory; malformed media is data, not
    a bug — callers null the decode columns)."""
    w, h, fn, fd, chroma, pos = _parse_y4m_header(data)
    frame_bytes = w * h + chroma
    offsets: list[int] = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise NotImplementedError("y4m stream desync (no FRAME marker)")
        if fnl + 1 + frame_bytes > len(data):
            raise ValueError("y4m truncated frame")
        offsets.append(fnl + 1)
        pos = fnl + 1 + frame_bytes
    n = len(offsets)
    return {"width": w, "height": h, "n_frames": n, "fps_num": fn,
            "fps_den": fd, "duration_ms": n * 1000 * fd // fn,
            "frame_offsets": offsets}


def decode_video_frame(data: bytes, probe: dict, idx: int) -> np.ndarray:
    """Decode ONE luma frame (h, w) by direct offset seek — frombuffer is
    a zero-copy view over the asset bytes; only this frame's pixels are
    ever touched."""
    w, h = probe["width"], probe["height"]
    y = np.frombuffer(data, np.uint8, count=w * h,
                      offset=probe["frame_offsets"][idx])
    return y.reshape(h, w)


def decode_video(data: bytes) -> dict:
    """Full video decode: probe_video + every frame, returning {width,
    height, n_frames, fps_num, fps_den, duration_ms, frames} with frames
    the (n, h, w) uint8 luma stack. Kept for callers that genuinely want
    all frames (tests, short clips); the feature extractor uses
    probe_video + decode_video_frame instead and never materializes the
    stack."""
    p = probe_video(data)
    n, h, w = p["n_frames"], p["height"], p["width"]
    frames = ([decode_video_frame(data, p, i) for i in range(n)]
              if n else None)
    return {"width": w, "height": h, "n_frames": n, "fps_num": p["fps_num"],
            "fps_den": p["fps_den"], "duration_ms": p["duration_ms"],
            "frames": np.stack(frames) if n else np.empty((0, h, w), np.uint8)}


def _fake_decode(data: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature vector (hash expansion of the
    bytes) — the plumbing feature for every asset, and the only signal
    for containers with no available decoder."""
    if data is None:
        raise NotImplementedError("real decode requires a video codec")
    h = hashlib.sha256(data).digest()
    return (np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float32)
            / np.float32(2**32))


_NULL_DECODE = dict(width=None, height=None, mean_pixel=None, n_samples=None,
                    sample_rate=None, duration_ms=None, rms=None)


def extract_features(assets: DataFrame, frames_per_video: int = 3) -> DataFrame:
    """(asset_id, kind, media, ...) -> one feature row per asset (images/
    audio) or per sampled frame (video). Image/audio rows carry REAL
    decoded features (width/height/mean_pixel, n_samples/sample_rate/
    duration_ms/rms) when the bytes are a format the native decoders (or
    an installed PIL) understand, null decode columns otherwise; every
    row keeps the plumbing columns (byte count, content sha, frame
    index) and the deterministic hash feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        cols = ["asset_id", "kind", "n_bytes", "content_sha", "feat",
                "frame_idx", "width", "height", "mean_pixel", "n_samples",
                "sample_rate", "duration_ms", "rms"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.media) if r.media is not None else b""
                sha = hashlib.sha256(data).hexdigest()[:16]
                dec = dict(_NULL_DECODE)
                vid = None
                try:
                    if r.kind == "image":
                        d = decode_image(data)
                        dec.update(width=d["width"], height=d["height"],
                                   mean_pixel=d["mean_pixel"])
                    elif r.kind == "audio":
                        d = decode_audio(data)
                        dec.update(n_samples=d["n_samples"],
                                   sample_rate=d["sample_rate"],
                                   duration_ms=d["duration_ms"], rms=d["rms"])
                    elif r.kind == "video":
                        # metadata + frame offsets only; sampled frames
                        # are seek-decoded below — never the full stack
                        vid = probe_video(data)
                except Exception:  # noqa: BLE001
                    # unknown OR MALFORMED media is data, not a bug: a
                    # truncated BMP raises struct.error, a corrupt PPM
                    # IndexError, a partial y4m frame ValueError, PIL
                    # UnidentifiedImageError — none may fail the task.
                    # Plumbing columns survive, decode columns stay null
                    pass
                n_frames = frames_per_video if r.kind == "video" else 1
                for fi in range(n_frames):
                    row_dec = dec
                    if vid is not None and vid["n_frames"] > 0:
                        # evenly-spaced frame sample (floor stride): the
                        # fan-out stays a constant frames_per_video rows
                        # per asset regardless of stream length, and the
                        # seek decode touches ONLY the sampled frames'
                        # bytes (probe_video offsets) — per-asset memory
                        # is O(frames_per_video x frame), not O(stream)
                        src = fi * vid["n_frames"] // n_frames
                        y = decode_video_frame(data, vid, src)
                        row_dec = dict(
                            dec, width=vid["width"], height=vid["height"],
                            mean_pixel=float(y.astype(np.float64).mean()),
                            duration_ms=vid["duration_ms"])
                    feat = _fake_decode(data + fi.to_bytes(2, "big"))
                    rows.append(dict(asset_id=r.asset_id, kind=r.kind,
                                     n_bytes=len(data), content_sha=sha,
                                     feat=feat.tolist(), frame_idx=fi,
                                     **row_dec))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_assets(spark, n: int = 32) -> DataFrame:
    """Deterministic synthetic media table for tests (seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 3)
        rows.append((i, kind, bytearray(blob), 64 + i, 48 + i,
                     1000 * (i + 1) if kind != "image" else 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def dedupe_assets(assets: DataFrame) -> DataFrame:
    """Exact media dedup on content hash (binary columns hash JVM-side)."""
    h = assets.select("asset_id", F.sha2(F.col("media"), 256).alias("content_hash"))
    canon = h.groupBy("content_hash").agg(F.min("asset_id").alias("canonical_asset"))
    return h.join(canon, "content_hash").select("asset_id", "content_hash", "canonical_asset")
