"""Rate-anomaly detection (operators/anomaly.py): hand-computed
z-scores, empty-window spine, constant-rate groups."""

import datetime as dt
import math

from ena_database_build_spark.operators.anomaly import rate_anomalies

T0 = dt.datetime(2024, 1, 1, 0, 30, 0)


def _ev(eid, minute_offset_h, typ):
    return (eid, T0 + dt.timedelta(hours=minute_offset_h), typ)


def test_rate_anomalies_hand_computed(spark):
    # type 'a': hours 0..4 get counts [1, 1, 1, 1, 6] -> hour 4 spikes
    rows = []
    eid = 0
    for h in range(4):
        rows.append(_ev(eid, h, "a")); eid += 1
    for _ in range(6):
        rows.append(_ev(eid, 4, "a")); eid += 1
    # type 'b': one event in hour 0, nothing after -> zero-count
    # windows must appear and score below any spike
    rows.append(_ev(eid, 0, "b")); eid += 1
    # type 'c': perfectly constant -> variance 0 -> z = 0 everywhere
    for h in range(5):
        rows.append(_ev(eid, h, "c")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = rate_anomalies(df, window_s=3600, z_threshold=1.5)
    got = {(r.event_type, r.win_start_s): r for r in out.collect()}
    # 3 types x 5 hourly windows, all materialized
    assert len(got) == 15
    a = sorted(
        (k[1], v.n, v.z, v.is_anomaly)
        for k, v in got.items() if k[0] == "a"
    )
    counts = [1, 1, 1, 1, 6]
    mean = sum(counts) / 5
    var = sum(c * c for c in counts) / 5 - mean * mean
    z_spike = round((6 - mean) / math.sqrt(var), 6)
    assert a[-1][1] == 6 and a[-1][2] == z_spike and a[-1][3]
    assert not any(x[3] for x in a[:-1])
    # b: zero-count windows exist as rows
    b_counts = [v.n for k, v in got.items() if k[0] == "b"]
    assert sorted(b_counts) == [0, 0, 0, 0, 1]
    # c: constant rate -> z == 0.0, never anomalous
    assert all(
        v.z == 0.0 and not v.is_anomaly
        for k, v in got.items() if k[0] == "c"
    )
