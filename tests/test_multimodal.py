"""Multimodal column plumbing tests: metadata sniffing, Arrow-batched
feature extraction, frame sampling, pseudo-embedding integration with the
similarity operators, and the decode stub contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from summarydb_spark.functions import multimodal, similarity


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return multimodal.fake_media_from_text(docs).cache()


def test_metadata_sniffing_and_sizes(spark, media):
    out = multimodal.media_metadata(media).collect()
    assert len(out) > 0
    for r in out:
        if r["doc_id"] % 7 == 0:
            assert r["format"] == "png"
            assert r["head_byte"] == 0x89
        else:
            assert r["format"] == "unknown"
        assert r["n_bytes"] == len(r["data"])
        assert r["n_chunks"] == -(-r["n_bytes"] // 256)


def test_magic_sniffing_planted(spark):
    rows = [
        (1, bytes.fromhex("ffd8ffe000104a46494600") + b"x" * 10, "jpeg"),
        (2, bytes.fromhex("474946383961") + b"x" * 10, "gif"),
        (3, b"RIFF" + b"\x00" * 8 + b"WAVE", "riff"),
        (4, b"\x00\x00\x00\x18ftypmp42more", "mp4"),
        (5, b"ID3\x04rest", "mp3_id3"),
        (6, b"OggS\x00rest", "ogg"),
        (7, b"plain bytes", "unknown"),
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d, _ in rows], "doc_id long, data binary"
    )
    got = {
        r["doc_id"]: r["format"]
        for r in multimodal.media_metadata(df).collect()
    }
    for i, _, fmt in rows:
        assert got[i] == fmt, (i, got[i], fmt)


def test_byte_histogram_features(spark, media):
    out = multimodal.byte_histogram_features(media, bins=16).collect()
    for r in out:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized
    # deterministic across runs
    out2 = multimodal.byte_histogram_features(media, bins=16).collect()
    a = {r["doc_id"]: r["features"] for r in out}
    b = {r["doc_id"]: r["features"] for r in out2}
    assert a == b


def test_frame_sampling_shape(spark, media):
    n_frames, frame_bytes = 4, 64
    out = multimodal.sample_frames(
        media, n_frames=n_frames, frame_bytes=frame_bytes
    )
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r)
    for i, frames in per.items():
        assert len(frames) == n_frames
        offs = [f["frame_offset"] for f in sorted(frames, key=lambda f: f["frame_idx"])]
        assert offs == sorted(offs)
        assert offs[0] == 0
        for f in frames:
            assert 0 < len(f["frame"]) <= frame_bytes
    assert len(ids) == media.count()


def test_media_embedding_drives_similarity(spark, media):
    emb = multimodal.media_embedding(media, dim=32, bins=64)
    rows = emb.limit(5).collect()
    for r in rows:
        v = np.array(r["embedding"])
        assert len(v) == 32
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # plug straight into the ANN operator (vec_id/embedding contract)
    e = emb.select(F.col("doc_id").alias("vec_id"), "embedding")
    topk = similarity.brute_force_topk(e, e.limit(3), k=3)
    got = topk.collect()
    assert len(got) == 9
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in got)


def test_png_codec_roundtrip():
    """Pure-numpy PNG codec: encode -> decode is identity for gray / RGB /
    RGBA, and every filter type unfilters correctly (decode a stream
    re-filtered per row)."""
    from summarydb_spark.functions import png

    rng = np.random.RandomState(11)
    for shape in [(7, 5), (16, 16, 3), (9, 4, 4), (1, 1), (3, 8, 2)]:
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = png.decode_png(png.encode_png(arr))
        expect = arr[:, :, None] if arr.ndim == 2 else arr
        assert out.shape == expect.shape
        assert np.array_equal(out, expect), shape


def test_png_decoder_all_filter_types():
    """Hand-build a PNG whose rows use filters 0..4 and check against the
    reference unfiltering (spec §9)."""
    import struct
    import zlib

    from summarydb_spark.functions import png

    rng = np.random.RandomState(5)
    h, w, c = 5, 6, 3
    raster = rng.randint(0, 256, size=(h, w * c)).astype(np.int32)

    def flt(y, ftype):
        cur = raster[y]
        prev = raster[y - 1] if y > 0 else np.zeros(w * c, dtype=np.int32)
        out = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            left = cur[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if ftype == 0:
                out[i] = cur[i]
            elif ftype == 1:
                out[i] = cur[i] - left
            elif ftype == 2:
                out[i] = cur[i] - up
            elif ftype == 3:
                out[i] = cur[i] - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[i] = cur[i] - pred
        return np.concatenate([[ftype], out & 0xFF]).astype(np.uint8)

    scanlines = b"".join(flt(y, y % 5).tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(scanlines))
        + png._chunk(b"IEND", b"")
    )
    out = png.decode_png(data)
    assert np.array_equal(out.reshape(h, w * c), raster.astype(np.uint8))


def test_decode_image_real_png(spark):
    """decode_image really decodes: a PNG-encoded raster comes back
    bit-identical through the distributed mapInPandas path; junk payloads
    (including fake PNG-magic ones) surface ok=0, not a crash."""
    from summarydb_spark.functions import png

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(6, 6), dtype=np.uint8)
    rows = [
        (1, png.encode_png(rgb)),
        (2, png.encode_png(gray)),
        (3, bytes.fromhex("89504e470d0a1a0a") + b"not really a png"),
        (4, b"plain junk"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "data"])
    got = {r["doc_id"]: r for r in multimodal.decode_image(df).collect()}
    assert got[1]["ok"] == 1 and (got[1]["height"], got[1]["width"]) == (12, 9)
    assert bytes(got[1]["pixels"]) == rgb.tobytes()
    assert got[2]["ok"] == 1 and got[2]["channels"] == 1
    assert bytes(got[2]["pixels"]) == gray.tobytes()
    assert got[3]["ok"] == 0 and got[4]["ok"] == 0


def test_resize_decodes_real_png(spark):
    """A real PNG through resize_image(decode_png=True) resizes the DECODED
    luma raster (numpy reference), while non-PNG payloads keep the
    byte-raster fallback."""
    from summarydb_spark.functions import png

    rng = np.random.RandomState(4)
    rgb = rng.randint(0, 256, size=(20, 14, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, png.encode_png(rgb)), (2, b"x" * 100)], ["doc_id", "data"]
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.resize_image(
            df, out_h=8, out_w=8, decode_png=True
        ).collect()
    }
    luma = png.to_gray(rgb)
    ri = (np.arange(8) * 20) // 8
    ci = (np.arange(8) * 14) // 8
    assert (got[1]["in_h"], got[1]["in_w"]) == (20, 14)
    assert bytes(got[1]["resized"]) == luma[np.ix_(ri, ci)].tobytes()
    # fallback payload: sqrt-raster interpretation unchanged
    arr = np.frombuffer(b"x" * 100, dtype=np.uint8)[:100].reshape(10, 10)
    ri10 = (np.arange(8) * 10) // 8
    assert bytes(got[2]["resized"]) == arr[np.ix_(ri10, ri10)].tobytes()


def test_resize_matches_numpy_reference(spark, media):
    out = multimodal.resize_image(media, out_h=16, out_w=16)
    rows = {r["doc_id"]: r for r in out.collect()}
    src = {r["doc_id"]: bytes(r["data"]) for r in media.collect()}
    assert set(rows) == set(src)
    for i, buf in src.items():
        arr = np.frombuffer(buf, dtype=np.uint8)
        h = int(np.sqrt(arr.size))
        r = rows[i]
        assert r["in_bytes"] == arr.size
        assert r["in_h"] == h and r["in_w"] == h
        if h == 0:
            assert r["out_bytes"] == 0
            continue
        raster = arr[: h * h].reshape(h, h)
        ri = (np.arange(16) * h) // 16
        expected = raster[np.ix_(ri, ri)]
        assert r["out_bytes"] == 256
        assert bytes(r["resized"]) == expected.tobytes()


def test_audio_frame_features_hand_reference(spark):
    import numpy as np

    from summarydb_spark.functions.multimodal import audio_frame_features

    # 70 bytes -> frame_len=32 gives 2 frames (64 samples kept, 6 dropped)
    payload = bytes(range(100, 170))
    df = spark.createDataFrame([(1, payload), (2, b"abc")], ["doc_id", "data"])
    rows = {
        r.doc_id: r for r in audio_frame_features(df, frame_len=32).collect()
    }
    x = np.arange(100, 170, dtype=np.int64) - 128
    fr = x[:64].reshape(2, 32)
    assert rows[1].n_samples == 70
    assert rows[1].n_frames == 2
    assert rows[1].total_ss == int((fr * fr).sum())
    assert rows[1].max_frame_ss == int((fr * fr).sum(axis=1).max())
    # values cross zero once (byte 128 -> x=0 contributes no sign change)
    assert rows[1].total_zc == int(((fr[:, :-1] * fr[:, 1:]) < 0).sum())
    # payload shorter than one frame: zero frames, zero features
    assert rows[2].n_frames == 0 and rows[2].total_ss == 0


class _StubPil:
    """Minimal PIL.Image stand-in (the container has no Pillow): enough
    surface for _pil_to_array's mode mapping."""

    def __init__(self, arr, mode, info=None):
        self._arr, self.mode, self.info = arr, mode, info or {}

    def convert(self, mode):
        h, w = self._arr.shape[:2]
        c = {"RGB": 3, "RGBA": 4}[mode]
        flat = self._arr.reshape(h, w, -1)[:, :, :1]
        return _StubPil(np.repeat(flat, c, axis=2), mode)

    def __array__(self, dtype=None, copy=None):
        return self._arr


def test_pil_to_array_preserves_native_channels():
    """ADVICE r3: the PIL path must match the pure-numpy decoder's channel
    count (L->1, LA->2, RGB->3, RGBA->4), not force RGB."""
    from summarydb_spark.functions.multimodal import _pil_to_array

    h, w = 4, 5
    gray = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    assert _pil_to_array(_StubPil(gray, "L")).shape == (h, w, 1)
    la = np.dstack([gray, gray])
    assert _pil_to_array(_StubPil(la, "LA")).shape == (h, w, 2)
    rgb = np.dstack([gray] * 3)
    assert _pil_to_array(_StubPil(rgb, "RGB")).shape == (h, w, 3)
    rgba = np.dstack([gray] * 4)
    assert _pil_to_array(_StubPil(rgba, "RGBA")).shape == (h, w, 4)
    # unsupported modes convert: palette -> RGB, palette+alpha -> RGBA
    assert _pil_to_array(_StubPil(gray, "P")).shape == (h, w, 3)
    assert (
        _pil_to_array(_StubPil(gray, "P", {"transparency": 0})).shape
        == (h, w, 4)
    )
    # values preserved bit-exactly on the native path
    assert (_pil_to_array(_StubPil(gray, "L"))[:, :, 0] == gray).all()


def test_resize_zero_dimension_png(spark):
    """ADVICE r3: a valid zero-dimension PNG decodes to an empty raster;
    resize must emit empty output, not crash in the executor."""
    from summarydb_spark.functions.multimodal import resize_image
    from summarydb_spark.functions.png import encode_png

    zero = encode_png(np.zeros((0, 3, 1), dtype=np.uint8))
    df = spark.createDataFrame([(1, bytearray(zero))], "doc_id long, data binary")
    row = resize_image(df, out_h=4, out_w=4, decode_png=True).collect()[0]
    assert row["out_bytes"] == 0 and row["resized"] == b""
