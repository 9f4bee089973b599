"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference carries a dormant per-stream statistics tracker — Welford
mean/variance over values and inter-arrival gaps (stats/welford.go:19-25,
stats/stream_statistics.go:21-33) — that is instantiated but never wired
into the pipeline (the TODO at core/sum_op.go:39 wanted it for the error
model's SD multiplier).  Here it runs live on the stream: per-stream Welford
state maintained across micro-batches with Spark's arbitrary-stateful-
processing API, emitting an updated statistics row per stream per batch.

Design notes for scale:

- State is O(1) per stream (seven scalars) — the total state store is
  O(#streams) regardless of event volume, and parallelizes on the group key
  exactly like the reference's per-stream pipelines (core/pipeline.go:72-78).
- Each batch's contribution is computed **vectorized** (numpy) and folded
  into the carried state with Chan's parallel-merge formula, i.e. the same
  partial/merge monoid contract every other operator in this engine uses —
  per-row Python never runs.
- Inter-arrival gaps need the previous batch's last timestamp: it is part
  of the state, so gaps are exact across batch boundaries as long as each
  stream's events arrive time-ordered (the engine's monotonicity clamp,
  operators/summary.clamp_monotonic, enforces exactly that upstream — the
  reference's core/pipeline.go:80-84 contract).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_OUTPUT_SCHEMA = (
    "stream_id long, n long, value_mean double, value_m2 double, "
    "gap_n long, gap_mean double, gap_m2 double, last_ts long"
)
STATS_STATE_SCHEMA = (
    "n long, value_mean double, value_m2 double, "
    "gap_n long, gap_mean double, gap_m2 double, last_ts long"
)


def _welford_merge(
    n_a: int, mean_a: float, m2_a: float, n_b: int, mean_b: float, m2_b: float
) -> Tuple[int, float, float]:
    """Chan et al. parallel variance merge of two Welford partials."""
    if n_a == 0:
        return n_b, mean_b, m2_b
    if n_b == 0:
        return n_a, mean_a, m2_a
    n = n_a + n_b
    delta = mean_b - mean_a
    mean = mean_a + delta * n_b / n
    m2 = m2_a + m2_b + delta * delta * n_a * n_b / n
    return n, mean, m2


def _series_welford(s: pd.Series) -> Tuple[int, float, float]:
    # Arrow delivers null doubles as NaN; pandas mean()/sum() skip them but
    # .size counts them — an unfiltered n would inflate the running count
    # with zero-weight samples and silently understate variance forever
    # (state is cumulative).  Count only the real samples.
    s = s.dropna()
    n = int(s.size)
    if n == 0:
        return 0, 0.0, 0.0
    mean = float(s.mean())
    m2 = float(((s - mean) ** 2).sum())
    return n, mean, m2


def _update_stats(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, v_mean, v_m2, g_n, g_mean, g_m2, last_ts = state.get
    else:
        n, v_mean, v_m2, g_n, g_mean, g_m2, last_ts = 0, 0.0, 0.0, 0, 0.0, 0.0, None

    # One group's rows within a micro-batch can span several Arrow chunks
    # whose relative order after the shuffle is NOT time-ordered (e.g. many
    # source files in one availableNow batch).  Sorting each chunk alone
    # would fold wrong/negative gaps into the state, so concatenate the
    # whole group's batch and sort by ts ONCE before computing gaps.
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # a null ts has no position on the time axis: NaN sorts last and
        # int(ts.iloc[-1]) then poisons the micro-batch (and every restart
        # replays it — the query wedges permanently).  Drop such rows;
        # their values still can't contribute a gap.
        pdf = pdf[pdf["ts"].notna()]
        if not pdf.empty:
            pdf = pdf.sort_values(["ts"], kind="mergesort")
            bn, b_mean, b_m2 = _series_welford(pdf["value"])
            n, v_mean, v_m2 = _welford_merge(n, v_mean, v_m2, bn, b_mean, b_m2)

            ts = pdf["ts"]
            gaps = ts.diff()
            if last_ts is not None:
                gaps.iloc[0] = ts.iloc[0] - last_ts
            else:
                gaps = gaps.iloc[1:]
            gn, gp_mean, gp_m2 = _series_welford(gaps.astype("float64"))
            g_n, g_mean, g_m2 = _welford_merge(g_n, g_mean, g_m2, gn, gp_mean, gp_m2)
            last_ts = int(ts.iloc[-1])

    state.update((n, v_mean, v_m2, g_n, g_mean, g_m2, last_ts))
    yield pd.DataFrame(
        {
            "stream_id": [key[0]],
            "n": [n],
            "value_mean": [v_mean],
            "value_m2": [v_m2],
            "gap_n": [g_n],
            "gap_mean": [g_mean],
            "gap_m2": [g_m2],
            "last_ts": [last_ts],
        }
    )


def streaming_stream_stats(events: DataFrame) -> DataFrame:
    """Per-stream running Welford statistics over a streaming DataFrame of
    ``(stream_id long, ts long, value double, ...)``.

    Emits one updated row per stream per micro-batch:
    ``(stream_id, n, value_mean, value_m2, gap_n, gap_mean, gap_m2,
    last_ts)`` — variance = m2 / (n - 1).  Works identically on a batch
    DataFrame fed through one "batch" (tests do both)."""
    return events.groupBy("stream_id").applyInPandasWithState(
        _update_stats,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = "user_id long, n_events long, t_start long, t_end long"
SESSION_STATE_SCHEMA = "t_start long, t_end long, n long"

#: 1h session gap in micros / ms — shared by the operator and its oracle
SESSION_GAP_US = 3_600_000_000
SESSION_GAP_MS = SESSION_GAP_US // 1000


def _sessionize_update(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Timeout-closing sessionizer: sessions closed by an in-batch
    successor event emit immediately; the trailing open session is held
    in state with an EVENT-TIME timeout at (t_end + gap), so the
    watermark — not a later event — closes it.  Input rows carry
    ``t`` (epoch micros) alongside the watermark timestamp column."""
    uid = int(key[0])
    if state.hasTimedOut:
        t_start, t_end, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [n],
                "t_start": [t_start],
                "t_end": [t_end],
            }
        )
        return

    ts = _group_event_times(pdfs)
    if not ts:
        return

    closed, (t_start, t_end, n) = _merge_session_events(
        ts, state.get if state.exists else None
    )
    state.update((t_start, t_end, n))
    # event-time timeout at session end + gap; never behind the current
    # watermark (Spark rejects that), which only matters for groups whose
    # open session already expired mid-stream — the clamp fires them at
    # the next watermark advance, the same no-data batch either way
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(t_end // 1000 + SESSION_GAP_MS, wm + 1))
    if closed:
        yield pd.DataFrame(
            [(uid, n_, s_, e_) for (n_, s_, e_) in closed],
            columns=["user_id", "n_events", "t_start", "t_end"],
        )


def _group_event_times(pdfs) -> list:
    """Extract one group's event times from its Arrow chunks as a SORTED
    list of python ints, dropping null timestamps (a null has no position
    on the time axis; kept, it would poison the session span and every
    restart replays it).

    Works on the ``t`` column only — the sessionizer never reads another
    column, and the old whole-frame path (concat -> boolean-mask copy ->
    sort_values) cost ~0.35 ms per group in pure pandas overhead
    (measured) with thousands of groups per micro-batch.  ``np.sort``
    copies, so a chunk that arrives as a zero-copy Arrow view is never
    mutated.  Chunks within one group are not mutually time-ordered
    after the shuffle, so the concatenated whole is sorted, exactly as
    before (stable, same order for duplicate timestamps)."""
    vals = [c["t"].to_numpy() for c in pdfs if len(c)]
    if not vals:
        return []
    t = vals[0] if len(vals) == 1 else np.concatenate(vals)
    if t.dtype.kind != "i":
        # nullable timestamps surface as float64/object with NaN
        t = t[~pd.isna(t)]
        if t.size == 0:
            return []
        t = t.astype(np.int64, copy=False)
    return np.sort(t, kind="stable").tolist()


def _merge_session_events(ts, prev):
    """The sessionizer's pure merge core, shared by BOTH arbitrary-state
    APIs (applyInPandasWithState and transformWithStateInPandas) so the
    semantics cannot drift: fold the SORTED in-batch event times ``ts``
    into the held open session ``prev`` ((t_start, t_end, n) or None),
    returning (closed sessions as (n, t_start, t_end) in close order,
    new open-session state)."""
    if prev is not None:
        t_start, t_end, n = prev
    else:
        t_start = t_end = None
        n = 0

    closed = []
    # Pre-session LATE run: within-watermark late events that precede the
    # open session by more than the gap form already-expired sessions.
    # They must gap-merge with EACH OTHER (two late events within the gap
    # are ONE session under batch semantics), so they accumulate in a
    # separate (l_start, l_end, l_n) run and close when the next event
    # breaks the gap or the batch ends.  The run CAN end up within the
    # gap of the open session after a later in-batch event min-merges
    # and shrinks t_start (gap=10, open [100,120], batch [89, 91]: 89
    # buffers, 91 min-merges t_start to 91, and 89 is now within gap) —
    # batch semantics say one session, so the min-merge branch flushes
    # the run INTO the open session whenever the new t_start lands
    # within gap of l_end.  Because the scan is sorted and t_start only
    # ever decreases, late events are a prefix of the batch; a run can
    # still split across MICRO-batches, the disclosed residual of
    # bounded state (unreachable when watermark delay <= gap, the gate
    # config).
    l_start = l_end = None
    l_n = 0
    for t in ts:
        if t_start is None:
            t_start, t_end, n = t, t, 1
        elif t < t_start - SESSION_GAP_US:
            if l_start is None:
                l_start, l_end, l_n = t, t, 1
            elif t - l_end <= SESSION_GAP_US:
                l_end = t
                l_n += 1
            else:
                closed.append((l_n, l_start, l_end))
                l_start, l_end, l_n = t, t, 1
        elif t - t_end <= SESSION_GAP_US:
            # min/max merge so a within-watermark LATE event (t < t_end,
            # arriving in a later micro-batch) extends the session's span
            # instead of moving t_end backward — which would both misreport
            # the span and fire the event-time timeout too early
            t_start = min(t_start, t)
            t_end = max(t_end, t)
            n += 1
            if l_start is not None and t_start - l_end <= SESSION_GAP_US:
                # min-merge pulled the open session within gap of the
                # buffered late run: they are ONE session under batch
                # semantics — absorb the run instead of emitting it
                t_start = min(t_start, l_start)
                n += l_n
                l_start = l_end = None
                l_n = 0
        else:
            closed.append((n, t_start, t_end))
            t_start, t_end, n = t, t, 1
    if l_start is not None:
        closed.append((l_n, l_start, l_end))

    return closed, (t_start, t_end, n)


def sessionize_with_timeout(events: DataFrame) -> DataFrame:
    """Custom stateful sessionizer over a WATERMARKED streaming DataFrame
    of ``(user_id long, tstamp timestamp, t long)`` — the
    applyInPandasWithState + EventTimeTimeout contract the built-in
    ``session_window`` hides: state is the one open session per user,
    closed sessions append as soon as a successor event proves them
    closed, and the WATERMARK (via timeout) closes trailing sessions
    that no later event ever would.  The reference has no streaming
    sessions at all; this is the engine-level primitive a user would
    otherwise hand-roll (compare q_streaming_sessionize_gate, which
    exercises the built-in operator on the same data)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _make_tws_sessionizer():
    """The SAME sessionizer on Spark 4's transformWithStateInPandas —
    the successor arbitrary-state API (SPARK-46815): typed state handles
    (ValueState) instead of one state tuple, explicit event-time TIMERS
    instead of a single timeout slot, and per-key expiry callbacks.  The
    merge core is shared (:func:`_merge_session_events`), so both APIs
    provably compute identical sessions — the gate pair
    (streaming_session_timeout_gate / streaming_session_tws_gate) checks
    both against ONE oracle.

    Timer discipline: exactly one live timer per key — the previous
    timer is deleted before registering the session's new expiry (stale
    timers would otherwise fire mid-session and close a live session);
    the registered timestamp is tracked in its own ValueState because
    the handle offers deleteTimer(ts), not clearTimers().  Expiry clamps
    to watermark+1 like the old API (TransformWithStateExec also fires
    timers only when expiry < watermark)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class SessionizerTWS(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._sess = handle.getValueState("sess", SESSION_STATE_SCHEMA)
            self._tmr = handle.getValueState("tmr", "ts long")

        def handleInputRows(self, key, rows, timerValues):
            uid = int(key[0])
            ts = _group_event_times(rows)
            if not ts:
                return
            prev = tuple(self._sess.get()) if self._sess.exists() else None
            closed, state = _merge_session_events(ts, prev)
            self._sess.update(state)
            wm = timerValues.getCurrentWatermarkInMs()
            if self._tmr.exists():
                self._handle.deleteTimer(int(self._tmr.get()[0]))
            expiry = max(state[1] // 1000 + SESSION_GAP_MS, wm + 1)
            self._handle.registerTimer(expiry)
            self._tmr.update((expiry,))
            if closed:
                yield pd.DataFrame(
                    [(uid, n, s, e) for (n, s, e) in closed],
                    columns=["user_id", "n_events", "t_start", "t_end"],
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._sess.exists():
                return
            t_start, t_end, n = self._sess.get()
            self._sess.clear()
            self._tmr.clear()
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_events": [n],
                    "t_start": [t_start],
                    "t_end": [t_end],
                }
            )

        def close(self):
            pass

    return SessionizerTWS()


def sessionize_with_tws(events: DataFrame) -> DataFrame:
    """:func:`sessionize_with_timeout` on the transformWithStateInPandas
    API (see :func:`_make_tws_sessionizer`); input contract identical.

    ENV GATE: the TWS Python state protocol imports google.protobuf
    (pyspark/sql/streaming/proto/StateMessage_pb2), which this container
    does not ship — fail fast driver-side with the real reason instead
    of a crashed streaming worker (the functions/multimodal.py codec
    pattern; the parity test auto-enables where protobuf exists)."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf for its "
            "state protocol; install protobuf to enable the TWS "
            "sessionizer (semantics are identical to "
            "sessionize_with_timeout — shared merge core)"
        ) from exc
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_tws_sessionizer(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
