"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media travel as opaque ``binary`` columns plus typed metadata — the only
sane layout at 100 TB: Spark never interprets the bytes until an operator
asks, partitioning/shuffling treat them as fixed-cost blobs, and column
pruning keeps scans narrow when a query needs only metadata.

Operator tiers:
- **metadata** (`media_metadata`): pure column math over the binary —
  byte length, container sniffing from magic prefixes (PNG/JPEG/GIF/RIFF/
  MP4/...), chunk accounting.  JVM-side, no UDF.
- **feature extraction** (`byte_histogram_features`, `media_embedding`):
  Arrow-batched ``mapInPandas`` over the raw bytes — vectorized numpy per
  batch, the shape every real decoder plugs into.  Byte histograms and the
  derived pseudo-embedding are *real* computations (useful for corrupt-file
  triage and exact-dup detection) and double as deterministic stand-ins for
  CNN/CLIP embeddings in tests.
- **frame sampling** (`sample_frames`): splits a payload into n evenly
  spaced byte-range "frames" (real video frame extraction swaps the slicer
  for a demuxer; the explode/one-row-per-frame plumbing is identical).
- **decoding** (`decode_image`): STUB — the container has no PIL/ffmpeg.
  Gated behind an import; raises NotImplementedError with the integration
  contract documented, so the Spark-side schema and batch shape are
  test-covered while the codec is a deployment concern.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# magic-prefix -> container format (hex prefix, format name)
_MAGICS = [
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp share the RIFF envelope
    ("66747970", "mp4_ftyp_at_4"),  # 'ftyp' usually at offset 4
    ("494433", "mp3_id3"),
    ("4f676753", "ogg"),
]


def sniff_format(data: Column) -> Column:
    """Container sniffing from magic prefixes — column math only."""
    head = F.lower(F.hex(F.substring(data, 1, 8)))
    expr = F.lit("unknown")
    for magic, name in reversed(_MAGICS):
        if name == "mp4_ftyp_at_4":
            cond = F.substring(head, 9, 8).startswith(magic)
            name = "mp4"
        else:
            cond = head.startswith(magic)
        expr = F.when(cond, name).otherwise(expr)
    return expr


def media_metadata(
    df: DataFrame, data_col: str = "data", chunk_bytes: int = 256
) -> DataFrame:
    """Attach ``n_bytes``, ``format``, ``n_chunks``, ``head_byte`` —
    metadata without touching Python."""
    d = F.col(data_col)
    return (
        df.withColumn("n_bytes", F.length(d).cast("long"))
        .withColumn("format", sniff_format(d))
        .withColumn(
            "n_chunks",
            F.ceil(F.length(d) / F.lit(chunk_bytes)).cast("long"),
        )
        .withColumn(
            "head_byte",
            F.coalesce(
                F.conv(F.hex(F.substring(d, 1, 1)), 16, 10).cast("long"), F.lit(-1)
            ),
        )
    )


def byte_histogram_features(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    bins: int = 16,
) -> DataFrame:
    """Per-payload normalized byte histogram as ``features array<double>``.

    Arrow-batched mapInPandas: each batch converts its binary column to
    numpy uint8 buffers and histograms them vectorized — the exact plumbing
    (schema in, iterator of pandas frames out) a real decoder/featurizer
    uses.  Output partitioning follows the input; no shuffle.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    edges = np.linspace(0, 256, bins + 1)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, feats = [], [], []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                arr = np.frombuffer(buf or b"", dtype=np.uint8)
                h, _ = np.histogram(arr, bins=edges)
                total = max(len(arr), 1)
                ids.append(i)
                sizes.append(len(arr))
                feats.append((h / total).tolist())
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": sizes, "features": feats}
            )

    return df.select(id_col, data_col).mapInPandas(extract, out_schema)


def media_embedding(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    dim: int = 64,
    bins: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Deterministic pseudo-embedding: byte histogram projected through a
    fixed random matrix, L2-normalized — a drop-in stand-in for a CLIP-style
    encoder that exercises the full downstream ANN/near-dup machinery."""
    hist = byte_histogram_features(df, data_col, id_col, bins=bins)
    rng = np.random.RandomState(seed)
    proj = rng.standard_normal((bins, dim))
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf["features"].tolist(), dtype=np.float64)
            if len(mat) == 0:
                yield pd.DataFrame({id_col: [], "embedding": []})
                continue
            emb = mat @ proj
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.where(norms == 0, 1.0, norms)
            yield pd.DataFrame(
                {id_col: pdf[id_col].tolist(), "embedding": list(map(list, emb))}
            )

    return hist.mapInPandas(project, out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    data_col: str = "data",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
) -> DataFrame:
    """Evenly spaced byte-range "frames" from each payload, one output row
    per frame: ``(id, frame_idx, frame_offset, frame)``.

    This is the video-frame-sampling plumbing (explode to one row per
    frame, preserve provenance offsets); a real demuxer replaces the byte
    slicer.  Implemented as column math: substring offsets are computed
    with a literal index array — no Python in the path.
    """
    d = F.col(data_col)
    n = F.length(d)
    idxs = F.array(*[F.lit(i) for i in range(n_frames)])
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("frame_idx"),
            (i * F.greatest((n - frame_bytes), F.lit(0)) / F.lit(max(n_frames - 1, 1)))
            .cast("long")
            .alias("frame_offset"),
        ),
    )
    return df.select(id_col, data_col, F.explode(frames).alias("fr")).select(
        id_col,
        F.col("fr.frame_idx").alias("frame_idx"),
        F.col("fr.frame_offset").alias("frame_offset"),
        F.expr(
            f"substring({data_col}, fr.frame_offset + 1, {frame_bytes})"
        ).alias("frame"),
    )


def resize_image(
    df: DataFrame,
    out_h: int = 16,
    out_w: int = 16,
    data_col: str = "data",
    id_col: str = "doc_id",
    decode_png: bool = False,
) -> DataFrame:
    """Nearest-neighbor resize of each payload to ``out_h x out_w``.

    With ``decode_png=True`` payloads that parse as real PNGs are decoded
    (functions.png / PIL) to a luma raster first — actual image resizing.
    Otherwise (and for payloads that don't parse) the bytes are
    interpreted as a square-ish single-channel raster (h = floor(sqrt(n)),
    w = h) — the deterministic byte-level fallback the oracle queries pin.
    Everything else is the production plumbing: Arrow-batched binary in,
    vectorized numpy gather per batch, binary out with typed shape
    metadata.  No shuffle; output partitioning follows the input.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("in_bytes", LongType()),
            StructField("in_h", LongType()),
            StructField("in_w", LongType()),
            StructField("resized", BinaryType()),
            StructField("out_bytes", LongType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, hs, ws, outs, outn = [], [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                buf = bytes(buf or b"")
                raster = None
                if decode_png:
                    decoded = _decode_raster(buf)
                    if decoded is not None:
                        from summarydb_spark.functions.png import to_gray

                        raster = to_gray(decoded)
                if raster is not None:
                    h, w = raster.shape
                    ids.append(i)
                    nbytes.append(len(buf))
                    hs.append(h)
                    ws.append(w)
                    if h == 0 or w == 0:
                        # a valid zero-dimension PNG decodes to an empty
                        # raster; same contract as the byte-fallback branch
                        outs.append(b"")
                        outn.append(0)
                        continue
                else:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    h = int(np.sqrt(arr.size))
                    w = h
                    ids.append(i)
                    nbytes.append(arr.size)
                    hs.append(h)
                    ws.append(w)
                    if h == 0:
                        outs.append(b"")
                        outn.append(0)
                        continue
                    raster = arr[: h * w].reshape(h, w)
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                resized = raster[np.ix_(ri, ci)]
                outs.append(resized.tobytes())
                outn.append(resized.size)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "in_bytes": nbytes,
                    "in_h": hs,
                    "in_w": ws,
                    "resized": outs,
                    "out_bytes": outn,
                }
            )

    return df.select(id_col, data_col).mapInPandas(resize, out_schema)


def _decode_raster(buf: bytes):
    """Decode a PNG payload to an (h, w, c) uint8 array, or None when the
    payload is not a decodable image.  PIL when installed (any format —
    the production codec); otherwise the built-in pure-numpy PNG decoder
    (functions.png) — REAL decoding either way, no fake path."""
    try:
        from io import BytesIO

        from PIL import Image

        with Image.open(BytesIO(buf)) as im:
            return _pil_to_array(im)
    except ImportError:
        pass
    except Exception:
        return None
    from summarydb_spark.functions.png import PngError, decode_png

    try:
        return decode_png(buf)
    except PngError:
        return None


def _pil_to_array(im) -> "np.ndarray":
    """PIL image -> (h, w, c) uint8 preserving the native channel count,
    so the PIL path and the pure-numpy decoder (functions.png) produce
    identical output for the same file: L->1, LA->2, RGB->3, RGBA->4.
    Only modes the PNG decoder also rejects (palette, bilevel, 16-bit,
    CMYK, ...) are converted — to RGBA when they carry alpha, else RGB."""
    if im.mode not in ("L", "LA", "RGB", "RGBA"):
        has_alpha = "A" in im.mode or "transparency" in getattr(im, "info", {})
        im = im.convert("RGBA" if has_alpha else "RGB")
    arr = np.asarray(im, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("pixels", BinaryType()),
        StructField("ok", LongType()),
    ]
)


def decode_image(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """Real raster decoding over binary media columns.

    Arrow-batched mapInPandas (binary -> (doc_id, width, height, channels,
    pixels, ok)): ``pixels`` is the row-major h*w*c uint8 buffer, ``ok``
    flags payloads that decoded (undecodable rows keep NULL dims — corrupt
    -file triage falls out for free).  Decoder: PIL when installed, else
    the dependency-free PNG codec in functions.png.  Same no-shuffle,
    partition-preserving shape as byte_histogram_features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                arr = _decode_raster(bytes(buf or b""))
                if arr is None:
                    rows.append((i, None, None, None, None, 0))
                else:
                    h, w, c = arr.shape
                    rows.append((i, w, h, c, arr.tobytes(), 1))
            yield pd.DataFrame(rows, columns=DECODED_SCHEMA.fieldNames())

    return df.select(
        F.col(id_col).alias("doc_id"), data_col
    ).mapInPandas(run, DECODED_SCHEMA)


def fake_media_from_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic binary payloads derived from text (UTF-8 bytes with a
    sniffable PNG header for every 7th id) — the test/fixture source for
    the media operators, clearly not a real media store."""
    payload = F.encode(F.col(text_col), "UTF-8")
    png = F.to_binary(F.lit("89504e470d0a1a0a"), F.lit("hex"))
    data = F.when(
        F.col(id_col) % 7 == 0, F.concat(png, payload)
    ).otherwise(payload)
    return df.select(id_col, data.alias("data"))


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_ss", LongType()),
        StructField("total_zc", LongType()),
        StructField("max_frame_ss", LongType()),
    ]
)


def audio_frame_features(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    frame_len: int = 32,
) -> DataFrame:
    """Audio feature extraction over binary PCM payloads (the audio leg of
    the modality surface; image=resize/histogram, video=sample_frames).

    Deterministic fake decode: the payload is read as unsigned 8-bit PCM
    centered at 128 (a real codec decode — soundfile/ffmpeg — slots in at
    the ``np.frombuffer`` line behind the same signature and schema).
    Non-overlapping frames of ``frame_len`` samples, trailing partial
    frame dropped.  Per payload, **exact integer** features so the DuckDB
    oracle can replay them bit-for-bit:

    - ``total_ss``     sum over kept frames of sum((x-128)^2)
    - ``total_zc``     zero crossings: adjacent in-frame sample pairs with
                       strictly negative product
    - ``max_frame_ss`` loudest frame's sum of squares

    RMS/loudness in dB are derived downstream in column math (sqrt/log of
    exact integers — see the audio_frame_features query), keeping all
    float rounding in one auditable place.  Arrow-batched mapInPandas,
    vectorized numpy per batch, no shuffle.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                arr = np.frombuffer(buf or b"", dtype=np.uint8).astype(np.int64)
                x = arr - 128
                n = len(x)
                nf = n // frame_len
                if nf == 0:
                    rows.append((i, n, 0, 0, 0, 0))
                    continue
                fr = x[: nf * frame_len].reshape(nf, frame_len)
                ss = (fr * fr).sum(axis=1)
                zc = int(((fr[:, :-1] * fr[:, 1:]) < 0).sum())
                rows.append(
                    (i, n, nf, int(ss.sum()), zc, int(ss.max()))
                )
            yield pd.DataFrame(rows, columns=AUDIO_FRAME_SCHEMA.fieldNames())

    return df.select(
        F.col(id_col).alias("doc_id"), data_col
    ).mapInPandas(extract, AUDIO_FRAME_SCHEMA)
