"""Semantic pins for the event-stream ops (ops/events.py) beyond the
DuckDB oracle gate: pure-Python recompute of the gap-sessionization
and tumbling-window definitions over the sf0.001 events table."""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from swish_e_spark.ops import events as evops
from swish_e_spark.ops.corpus import events

SF = "/root/testdata/sf0.001"


def _pyevents(spark):
    """(user_id -> [(tms, event_id, event_type, value)] sorted)."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    out = collections.defaultdict(list)
    for r in events(spark, SF).collect():
        td = r.ts - epoch
        tms = ((td.days * 86400 + td.seconds) * 1000
               + td.microseconds // 1000)
        out[r.user_id].append((tms, r.event_id, r.event_type, r.value))
    for v in out.values():
        v.sort()
    return out


class TestSessionize:
    def test_matches_pure_python(self, spark):
        by_user = _pyevents(spark)
        exp = {}
        for uid, evs in by_user.items():
            sess = 0
            prev = None
            for tms, eid, etype, val in evs:
                if prev is None or tms - prev > evops.SESSION_GAP_MS:
                    sess += 1
                prev = tms
                exp.setdefault((uid, sess), []).append(
                    (tms, etype, val))
        rows = evops.sessionize(spark, SF).collect()
        assert {(r.user_id, r.session_n) for r in rows} == set(exp)
        for r in rows:
            evs = exp[(r.user_id, r.session_n)]
            assert r.n_events == len(evs)
            assert r.start_ms == evs[0][0]
            assert r.duration_ms == evs[-1][0] - evs[0][0]
            assert r.n_event_types == len({e[1] for e in evs})
            assert abs(r.total_value - sum(e[2] for e in evs)) < 1e-3

    def test_gap_invariant(self, spark):
        # consecutive sessions of one user are separated by > GAP
        rows = sorted(evops.sessionize(spark, SF).collect(),
                      key=lambda r: (r.user_id, r.session_n))
        for a, b in zip(rows, rows[1:]):
            if a.user_id == b.user_id:
                assert b.session_n == a.session_n + 1
                gap = b.start_ms - (a.start_ms + a.duration_ms)
                assert gap > evops.SESSION_GAP_MS


class TestEventRollup:
    def test_matches_pure_python(self, spark):
        by_user = _pyevents(spark)
        cells = collections.defaultdict(list)
        for uid, evs in by_user.items():
            for tms, eid, etype, val in evs:
                w = (tms // evops.WINDOW_MS) * evops.WINDOW_MS
                cells[(w, etype)].append((uid, val))
        rows = evops.event_rollup(spark, SF).collect()
        assert {(r.window_start_ms, r.event_type)
                for r in rows} == set(cells)
        for r in rows:
            c = cells[(r.window_start_ms, r.event_type)]
            assert r.n_events == len(c)
            assert r.n_users == len({u for u, _ in c})
            assert abs(r.total_value - sum(v for _, v in c)) < 1e-3
            assert abs(r.avg_value
                       - r.total_value / r.n_events) < 1e-3

    def test_windows_aligned(self, spark):
        for r in evops.event_rollup(spark, SF).collect():
            assert r.window_start_ms % evops.WINDOW_MS == 0
