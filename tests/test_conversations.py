"""Conversation/transcript assembly (operators/conversations.py):
gap splitting, turn ordering, cap semantics, tie-breaking."""

import datetime as dt

from ena_database_build_spark.operators.conversations import (
    assemble_transcripts,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def ev(eid, uid, minute, typ, props=None):
    return (eid, uid, T0 + dt.timedelta(minutes=minute), typ, props)


def test_transcripts_hand_computed(spark):
    rows = [
        # u1 session 1: three turns inside the gap, one with NULL props
        ev(1, 1, 0, "view", "a"),
        ev(2, 1, 5, "click", None),
        ev(3, 1, 10, "purchase", "c"),
        # u1 session 2: a 31-minute idle gap starts a new session
        ev(4, 1, 45, "view", "d"),
        # u2: five turns, cap at 3 -> truncated
        ev(10, 2, 0, "a", "1"),
        ev(11, 2, 1, "b", "2"),
        ev(12, 2, 2, "c", "3"),
        ev(13, 2, 3, "d", "4"),
        ev(14, 2, 4, "e", "5"),
        # u3: timestamp tie broken by event_id (21 before 22)
        ev(22, 3, 0, "second", "y"),
        ev(21, 3, 0, "first", "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, props string",
    )
    out = assemble_transcripts(df, gap="30 minutes", max_turns=3)
    got = sorted(
        ((r.user_id, r.transcript, r.n_turns, r.n_total_turns, r.truncated)
         for r in out.collect())
    )
    assert got == [
        (1, "view:a | click: | purchase:c", 3, 3, False),
        (1, "view:d", 1, 1, False),
        (2, "a:1 | b:2 | c:3", 3, 5, True),
        (3, "first:x | second:y", 2, 2, False),
    ]
    starts = {
        (r.user_id, r.transcript): r.session_start_s for r in out.collect()
    }
    # session_start_s is the epoch second of the first turn
    assert starts[(1, "view:d")] - starts[(1, "view:a | click: | purchase:c")] == 45 * 60


def test_transcripts_match_pure_python_randomized(spark):
    """Randomized differential vs a direct single-process
    implementation: random users, timestamp ties, NULL payloads, a
    bot session longer than the cap, and multi-session users."""
    import random

    rng = random.Random(11)
    rows = []
    eid = 0
    for uid in range(25):
        t = 0
        for _ in range(rng.randint(1, 15)):
            t += rng.choice([0, 1, 5, 40])  # minutes; 40 splits (gap 30)
            rows.append(
                (eid, uid, T0 + dt.timedelta(minutes=t),
                 rng.choice("abc"), rng.choice(["x", None]))
            )
            eid += 1
    # bot: 30 events inside one session, cap = 5
    for j in range(30):
        rows.append((eid, 99, T0 + dt.timedelta(seconds=j), "b", "p"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, props string",
    )
    got = sorted(
        (r.user_id, r.session_start_s, r.n_turns, r.n_total_turns,
         r.truncated, r.transcript)
        for r in assemble_transcripts(
            df, gap="30 minutes", max_turns=5
        ).collect()
    )

    # pure-python reference
    per_user = {}
    for eid_, uid, ts, typ, props in rows:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        per_user.setdefault(uid, []).append((us, eid_, typ, props))
    want = []
    gap_us = 30 * 60 * 1_000_000
    for uid, evs in per_user.items():
        evs.sort()
        sessions, cur = [], [evs[0]]
        for prev, nxt in zip(evs, evs[1:]):
            if nxt[0] - prev[0] > gap_us:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for sess in sessions:
            turns = [f"{t}:{p if p is not None else ''}" for _, _, t, p in sess]
            kept = turns[:5]
            want.append(
                (uid, sess[0][0] // 1_000_000, len(kept), len(sess),
                 len(sess) > 5, " | ".join(kept))
            )
    assert got == sorted(want)


def test_session_paths_shape(spark):
    """The path query's building block: transcripts with NULL payloads
    and a 3-turn cap reduce to pure type paths in arrival order."""
    rows = [
        (1, 1, T0, "view", None),
        (2, 1, T0 + dt.timedelta(minutes=1), "click", None),
        (3, 1, T0 + dt.timedelta(minutes=2), "purchase", None),
        (4, 1, T0 + dt.timedelta(minutes=3), "error", None),  # capped off
        (5, 2, T0, "view", None),
        (6, 2, T0 + dt.timedelta(minutes=1), "click", None),
        (7, 2, T0 + dt.timedelta(minutes=2), "purchase", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, props string",
    )
    import pyspark.sql.functions as F

    tr = assemble_transcripts(df, gap="30 minutes", max_turns=3)
    paths = {
        r.path: r.n
        for r in tr.groupBy(
            F.regexp_replace("transcript", ":", "").alias("path")
        ).agg(F.count("*").alias("n")).collect()
    }
    # both users' sessions reduce to the same capped 3-type path
    assert paths == {"view | click | purchase": 2}
