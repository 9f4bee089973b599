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


def test_decode_stub_contract(spark, media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(media)


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
