"""Engine-level sketch queries: bloom membership, HLL distinct, KLL
quantile over decayed windows — the reference's declared-but-unbuilt
operator surface (protos/summarydb.capnp:6-13) made real."""

import pytest

from summarydb_spark.engine import SummaryDB
from summarydb_spark.windowing import ExpWindowing


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sketchdb")
    db = SummaryDB(spark, str(d))
    s = db.new_stream(
        ops=["count", "sum", "max", "min", "bloom", "hll", "kll", "freq"],
        windowing=ExpWindowing(2.0),
    )
    # values 0..499 at ts=i; value v at ts=v (membership is checkable)
    s.append_pairs([(i, float(i)) for i in range(500)])
    s.flush()
    return db


def test_frequency(db):
    s = db.get_stream(0)
    # every value occurs exactly once; CMS estimate >= 1, tightly 1 for a
    # wide sketch on a 500-item domain
    for v in (0.0, 250.0, 499.0):
        r = s.query_frequency(v, 0, 499)
        assert r.value >= 1.0
        assert r.value <= 1.0 + r.error
    absent = s.query_frequency(90210.5, 0, 499)
    assert absent.value <= absent.error  # at most the overcount bound


def test_membership_present(db):
    s = db.get_stream(0)
    for v in (0.0, 17.0, 250.0, 499.0):
        r = s.query_membership(v, 0, 499)
        assert r.value == 1.0, v
        assert 0 <= r.error < 0.25  # windows are small -> low fp
    # range-restricted: probe a value outside the queried time range;
    # sketches answer over covering windows, so restrict to an exactly
    # covered old span [0, 255] (a canonical boundary at N=500... use a
    # narrow recent range instead)
    r = s.query_membership(499.0, 490, 499)
    assert r.value == 1.0


def test_membership_absent(db):
    s = db.get_stream(0)
    misses = 0
    for v in (1000.5, 2000.25, 777.125, 12345.0):
        r = s.query_membership(v, 0, 499)
        misses += r.value == 0.0
        if r.value == 0.0:
            assert r.error == 0.0
    assert misses >= 3  # bloom fp possible but rare at this fill rate


def test_membership_landmark_exact(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "lm"))
    s = db.new_stream(ops=["count", "sum", "bloom"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(10)])
    s.start_landmark(10)
    s.append_pairs([(10, 123.5), (11, 124.5)])
    s.end_landmark(12)
    s.flush()
    r = s.query_membership(123.5, 9, 12)
    assert r.value == 1.0
    assert r.error == 0.0  # landmark answers exactly


def test_distinct(db):
    s = db.get_stream(0)
    r = s.query_distinct(0, 499)
    assert abs(r.value - 500) / 500 < 0.05
    assert r.error > 0
    r2 = s.query_distinct(450, 499)
    # covering windows of the newest span: between 50 and ~128+ items
    assert 40 <= r2.value <= 200


def test_quantile(db):
    s = db.get_stream(0)
    r = s.query_quantile(0.5, 0, 499)
    assert abs(r.value - 249.5) / 249.5 < 0.05
    r9 = s.query_quantile(0.9, 0, 499)
    assert abs(r9.value - 449.0) / 449.0 < 0.05
    assert r.error == pytest.approx(0.0165)


def test_sketchless_stream_raises(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "nosketch"))
    s = db.new_stream(ops=["count", "sum"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(10)])
    s.flush()
    with pytest.raises(ValueError):
        s.query_membership(1.0, 0, 9)


def test_reopen_preserves_sketches(spark, db):
    db2 = SummaryDB.open(spark, db.path)
    s = db2.get_stream(0)
    r = s.query_membership(42.0, 0, 499)
    assert r.value == 1.0


def test_query_many_sketch_parity(db):
    """The batched column-math path (sketch_range_frame) must agree with
    the driver-side single-query functions over a grid of ranges — same
    merged sketch state, same probe hashes, same defaults on empty spans."""
    s = db.get_stream(0)
    grid = [(0, 499), (450, 499), (0, 0), (100, 300), (600, 700)]

    for member in (0.0, 250.0, 90210.5):
        batched = {
            r["qid"]: r
            for r in s.query_many_sketch("membership", grid, member).collect()
        }
        for i, (t0, t1) in enumerate(grid):
            single = s.query_membership(member, t0, t1)
            assert batched[i]["value"] == single.value, (member, t0, t1)
            assert batched[i]["error"] == pytest.approx(single.error), (member, t0, t1)

    for member in (0.0, 250.0, 90210.5):
        batched = {
            r["qid"]: r
            for r in s.query_many_sketch("frequency", grid, member).collect()
        }
        for i, (t0, t1) in enumerate(grid):
            single = s.query_frequency(member, t0, t1)
            assert batched[i]["value"] == single.value, (member, t0, t1)
            assert batched[i]["error"] == pytest.approx(single.error), (member, t0, t1)

    batched = {
        r["qid"]: r for r in s.query_many_sketch("distinct", grid).collect()
    }
    for i, (t0, t1) in enumerate(grid):
        single = s.query_distinct(t0, t1)
        assert batched[i]["value"] == pytest.approx(single.value), (t0, t1)
        assert batched[i]["error"] == pytest.approx(single.error), (t0, t1)

    import math

    batched = {
        r["qid"]: r
        for r in s.query_many_sketch("quantile", grid, [0.5, 0.9, 0.5, 0.1, 0.5]).collect()
    }
    for i, ((t0, t1), q) in enumerate(zip(grid, [0.5, 0.9, 0.5, 0.1, 0.5])):
        single = s.query_quantile(q, t0, t1)
        if math.isnan(single.value):
            assert math.isnan(batched[i]["value"]), (t0, t1, q)
        else:
            # KLL compaction is randomized (DataSketches), so two merge
            # evaluations may differ by a couple of ranks; both carry
            # ~1.65% rank error.  values here are dense integers, so a
            # rank tolerance is a value tolerance.
            tol = max(2.0, 0.05 * abs(single.value))
            assert abs(batched[i]["value"] - single.value) <= tol, (t0, t1, q)


def test_db_query_many_sketch_cross_stream(spark, tmp_path):
    """DB-level batched sketch queries: mixed (stream, op, range, arg)
    requests across TWO streams answered in one plan must agree with the
    per-stream single-query functions row for row."""
    import math

    db = SummaryDB(spark, str(tmp_path / "xsketch"))
    ops = ["count", "sum", "max", "min", "bloom", "hll", "kll", "freq"]
    s0 = db.new_stream(ops=ops, windowing=ExpWindowing(2.0))
    s1 = db.new_stream(ops=ops, windowing=ExpWindowing(2.0))
    s0.append_pairs([(i, float(i)) for i in range(300)])
    s1.append_pairs([(i, float(1000 + i)) for i in range(200)])
    db.flush()

    requests = [
        (0, "membership", 0, 299, 17.0),
        (1, "membership", 0, 199, 17.0),          # absent in stream 1
        (1, "membership", 0, 199, 1017.0),        # present in stream 1
        (0, "frequency", 0, 299, 250.0),
        (1, "frequency", 0, 199, 1050.0),
        (0, "distinct", 0, 299),
        (1, "distinct", 100, 199),
        (0, "quantile", 0, 299, 0.5),
        (1, "quantile", 0, 199, 0.9),
        (0, "distinct", 600, 700),                # empty overlap
    ]
    rows = {r["qid"]: r for r in db.query_many_sketch(requests).collect()}
    assert len(rows) == len(requests)

    streams = {0: s0, 1: s1}
    single_fn = {
        "membership": lambda s, t0, t1, a: s.query_membership(a, t0, t1),
        "frequency": lambda s, t0, t1, a: s.query_frequency(a, t0, t1),
        "distinct": lambda s, t0, t1, a: s.query_distinct(t0, t1),
        "quantile": lambda s, t0, t1, a: s.query_quantile(a, t0, t1),
    }
    for qid, req in enumerate(requests):
        sid, op, t0, t1 = req[:4]
        arg = req[4] if len(req) == 5 else None
        got = rows[qid]
        assert got["op"] == op and got["stream_id"] == sid
        want = single_fn[op](streams[sid], t0, t1, arg)
        if op == "quantile":
            if math.isnan(want.value):
                assert math.isnan(got["value"]), req
            else:
                tol = max(2.0, 0.05 * abs(want.value))
                assert abs(got["value"] - want.value) <= tol, req
        else:
            assert got["value"] == pytest.approx(want.value), req
            assert got["error"] == pytest.approx(want.error), req


def test_query_many_sketch_landmark_exact(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "lm2"))
    s = db.new_stream(ops=["count", "sum", "bloom"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(10)])
    s.start_landmark(10)
    s.append_pairs([(10, 123.5), (11, 124.5)])
    s.end_landmark(12)
    s.flush()
    rows = {
        r["qid"]: r
        for r in s.query_many_sketch(
            "membership", [(9, 12), (0, 8)], 123.5
        ).collect()
    }
    assert rows[0]["value"] == 1.0 and rows[0]["error"] == 0.0
    assert rows[1]["value"] == 0.0


def test_fused_multi_frame_matches_per_op_frames(db):
    """sketch_range_frame_multi (one join + one aggregation for all ops)
    must reproduce each per-op sketch_range_frame row for row, including
    empty-overlap defaults."""
    import math as _math

    from summarydb_spark.operators.sketch_windows import (
        sketch_range_frame,
        sketch_range_frame_multi,
    )

    s = db.get_stream(0)
    spark = db.spark
    ranges = spark.createDataFrame(
        [
            (0, 0, 0, 499, 17.0),
            (0, 1, 450, 499, 499.0),
            (0, 2, 100, 300, 90210.5),
            (0, 3, 600, 700, 1.0),   # empty overlap
        ],
        "stream_id long, qid long, t0 long, t1 long, member double",
    )
    fused = {
        r["qid"]: r
        for r in sketch_range_frame_multi(
            s._sketch_df(), ranges, q=0.5
        ).collect()
    }
    for op in ("membership", "frequency", "distinct", "quantile"):
        kw = {"q": 0.5} if op == "quantile" else {}
        per = {
            r["qid"]: r
            for r in sketch_range_frame(s._sketch_df(), ranges, op, **kw).collect()
        }
        for qid in range(4):
            want_v, want_e = per[qid]["value"], per[qid]["error"]
            got_v, got_e = fused[qid][f"{op}_value"], fused[qid][f"{op}_error"]
            if isinstance(want_v, float) and _math.isnan(want_v):
                assert _math.isnan(got_v), (op, qid)
            else:
                assert got_v == pytest.approx(want_v), (op, qid)
            if isinstance(want_e, float) and _math.isnan(want_e):
                assert _math.isnan(got_e), (op, qid)
            else:
                assert got_e == pytest.approx(want_e), (op, qid)


def test_generic_member_key_stability():
    """The str/bytes -> float64 encoding is stable, injective across the
    test domain, exactly integer-representable (top 52 md5 bits), and
    numeric members pass through untouched."""
    import hashlib

    from summarydb_spark.engine import generic_member_key as gk

    assert gk(3.5) == 3.5 and gk(7) == 7.0
    assert gk("abc") == gk(b"abc") == gk(bytearray(b"abc"))
    assert gk("abc") != gk("abd")
    expect = float(int(hashlib.md5(b"abc").hexdigest()[:13], 16))
    assert gk("abc") == expect
    assert gk("abc") == int(gk("abc"))  # exactly representable
    with pytest.raises(TypeError):
        gk(True)
    with pytest.raises(TypeError):
        gk(["x"])


def test_generic_data_bloom_membership(spark, tmp_path):
    """Bloom membership over ARBITRARY data (the reference README's
    unbuilt promise): append string members, probe strings/bytes via
    the single, batched, and DB-batched paths."""
    db = SummaryDB(spark, str(tmp_path / "gdb"))
    s = db.new_stream(ops=["count", "bloom", "freq"], windowing=ExpWindowing(2.0))
    words = [f"user-{i}@example.com" for i in range(64)]
    s.append_pairs([(i, w) for i, w in enumerate(words)])
    s.flush()
    # present strings hit (no false negatives, ever)
    for w in (words[0], words[31], words[63]):
        r = s.query_membership(w, 0, 63)
        assert r.value == 1.0
    # str and its utf-8 bytes are the same member
    rb = s.query_membership(words[5].encode(), 0, 63)
    assert rb.value == 1.0
    # absent member: overwhelmingly a miss at this fill factor
    miss = s.query_membership("nobody@else.invalid", 0, 63)
    assert miss.value == 0.0 and miss.error == 0.0
    # frequency of a present string >= 1 within the CMS bound
    fr = s.query_frequency(words[7], 0, 63)
    assert fr.value >= 1.0
    # batched stream path accepts strings
    out = {
        r["qid"]: r
        for r in s.query_many_sketch(
            "membership", [(0, 63), (0, 63)], arg=[words[3], "zzz.missing"]
        ).collect()
    }
    assert out[0]["value"] == 1.0 and out[1]["value"] == 0.0
    # DB-level mixed batch accepts strings too
    rows = db.query_many_sketch(
        [(0, "membership", 0, 63, words[9]), (0, "frequency", 0, 63, words[9])]
    ).collect()
    assert all(r["value"] >= 1.0 for r in rows)


def test_generic_member_landmark_exact(spark, tmp_path):
    """A landmark bracket holding a string member answers membership
    EXACTLY (error 0) — the encoded key comparison carries landmark
    exactness over to generic data."""
    db = SummaryDB(spark, str(tmp_path / "gldb"))
    s = db.new_stream(ops=["count", "bloom"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, f"w{i}") for i in range(32)])
    s.start_landmark(100)
    s.append_pairs([(101, "landmark-token")])
    s.end_landmark(102)
    s.flush()
    hit = s.query_membership("landmark-token", 100, 102)
    assert hit.value == 1.0 and hit.error == 0.0  # exact, not probabilistic


def test_bulk_append_encodes_generic_members(spark, tmp_path):
    """Bulk Stream.append(df) with a STRING value column must encode
    identically to append_pairs (column md5 == hashlib md5), so probes
    hit regardless of ingest path."""
    from pyspark.sql import functions as F

    from summarydb_spark.engine import generic_member_key

    db = SummaryDB(spark, str(tmp_path / "bulkdb"))
    s = db.new_stream(ops=["count", "bloom"], windowing=ExpWindowing(2.0))
    words = [f"bulk-{i}" for i in range(32)]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "ts long, value string"
    )
    s.append(df)
    s.flush()
    # the stored values ARE the driver-side encoding
    got = {
        r["value"]
        for r in db.events().select("value").collect()
    }
    assert got == {generic_member_key(w) for w in words}
    # and probes hit through the normal query surface
    assert s.query_membership(words[3], 0, 31).value == 1.0
    assert s.query_membership("not-there", 0, 31).value == 0.0


def test_generic_member_key_distinct_at_scale():
    """Birthday-bound contract (engine.generic_member_key docstring): at
    1e6 distinct members — well inside the documented ~2^23 capacity —
    the 52-bit keys must be collision-free.  Expected collisions at this
    scale are (1e6)^2 / 2^53 ~ 1.1e-4, so a single observed collision
    would mean the encoding lost bits (e.g. a truncation bug), not bad
    luck."""
    import hashlib

    n = 1_000_000
    keys = set()
    for i in range(n):
        h = hashlib.md5(f"member-{i}".encode()).hexdigest()[:13]
        keys.add(int(h, 16))
    assert len(keys) == n


def test_generic_member_key_property_distinct(spark):
    """Hypothesis: over arbitrary str/bytes inputs, keys are equal iff
    the UTF-8 byte content is equal (injective-in-practice + the
    str/bytes aliasing the encoding promises), and every key is an
    exactly-representable 52-bit integer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from summarydb_spark.engine import generic_member_key as gk

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.one_of(st.text(max_size=30), st.binary(max_size=30)),
            max_size=20,
        )
    )
    def check(members):
        def as_bytes(m):
            return m.encode("utf-8") if isinstance(m, str) else bytes(m)

        keys = {}
        for m in members:
            k = gk(m)
            assert k == int(k) and 0 <= k < 2**52
            b = as_bytes(m)
            if b in keys:  # same bytes -> same key (str/bytes aliasing)
                assert keys[b] == k
            else:  # distinct bytes -> distinct key
                assert k not in keys.values()
                keys[b] = k

    check()
