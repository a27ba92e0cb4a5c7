"""Seeded randomized property tests for the round-7 operator families
(gap filling, cumulative users, PII redaction): a pure-Python oracle
recomputes each result from scratch. House style of
test_upsert_property.py — seeded random batches instead of a hypothesis
engine, since one Spark job costs seconds and coverage comes from breadth
per batch."""

import datetime
import random
import re
from decimal import Decimal

from pyspark.sql import functions as F

from client_data_ingester_spark.operators.events import (
    cumulative_unique_users,
    gap_fill,
)
from client_data_ingester_spark.operators.text import PII_PATTERNS, redact_pii

BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _ts(hour, minute):
    return BASE + datetime.timedelta(hours=hour, minutes=minute)


def test_gap_fill_matches_python_fold(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(400):
        etype = rng.choice(["a", "b", "c"])
        # sparse hours 0..40 with deliberate holes per type
        hour = rng.choice([h for h in range(41) if (h + hash(etype)) % 4 != 1])
        rows.append((etype, _ts(hour, rng.randrange(60)),
                     round(rng.uniform(-50, 150), 2)))
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = {
        (r.event_type, r.bucket): (r.filled_value, r.was_gap)
        for r in gap_fill(df, unit="hour").collect()
    }

    # python oracle: exact decimal per-bucket sums, dense span, locf
    sums = {}
    for etype, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        sums.setdefault(etype, {}).setdefault(b, Decimal(0))
        sums[etype][b] += Decimal(str(v)).quantize(Decimal("0.01"))
    expect = {}
    for etype, per in sums.items():
        lo, hi = min(per), max(per)
        carried = None
        b = lo
        while b <= hi:
            if b in per:
                carried = float(per[b])
                expect[(etype, b)] = (carried, False)
            else:
                expect[(etype, b)] = (carried, True)
            b += datetime.timedelta(hours=1)
    assert got == expect


def test_cumulative_users_matches_python_fold(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(60), _ts(rng.randrange(30), rng.randrange(60)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = [
        (r.bucket, r.new_users, r.cum_users)
        for r in cumulative_unique_users(df, unit="hour").collect()
    ]

    first = {}
    for u, ts in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        if u not in first or b < first[u]:
            first[u] = b
    arrivals = {}
    for b in first.values():
        arrivals[b] = arrivals.get(b, 0) + 1
    lo, hi = min(arrivals), max(arrivals)
    expect, cum, b = [], 0, lo
    while b <= hi:
        n = arrivals.get(b, 0)
        cum += n
        expect.append((b, n, cum))
        b += datetime.timedelta(hours=1)
    assert got == expect


def test_redact_pii_matches_python_stagewise_re(spark):
    rng = random.Random(13)
    words = ["alpha", "beta", "x1", "-", "@", "2024", "a.b", "(12)", "9-9"]

    def pii(kind, i):
        return {
            "email": f"u{i}@host{i % 3}.example.org",
            "phone": f"({200 + i % 700}) {300 + i % 600}-{1000 + i % 9000}",
            "ssn": f"{100 + i % 900}-{10 + i % 90}-{1000 + i % 9000}",
        }[kind]

    rows = []
    for i in range(300):
        toks = [rng.choice(words) for _ in range(rng.randrange(1, 8))]
        for kind in ("email", "phone", "ssn"):
            if rng.random() < 0.5:
                toks.insert(rng.randrange(len(toks) + 1), pii(kind, i))
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: (r.clean_text, r.n_emails, r.n_phones, r.n_ssns)
        for r in redact_pii(df).collect()
    }

    for i, text in rows:
        stage, counts = text, []
        for pat, repl in PII_PATTERNS.values():
            counts.append(len(re.findall(pat, stage)))
            stage = re.sub(pat, lambda _m, r=repl: r, stage)
        assert got[i] == (stage, *counts), f"doc {i}: {text!r}"


def test_ts_shape_topk_finds_planted_pattern(spark):
    """A user whose daily counts ARE the query pattern (shifted by a
    constant baseline) must rank first with distance 0 — mean-centering
    makes the match baseline-invariant — and the output must follow the
    unique (dist, user, start_day) total order."""
    import datetime

    from client_data_ingester_spark.operators.events import ts_shape_topk

    pattern = [1, 1, 1, 1, 1, 5, 5]
    rows = []
    d0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def add(user, day_idx, n):
        for i in range(n):
            rows.append(
                (len(rows), d0 + datetime.timedelta(days=day_idx,
                                                    minutes=i), user)
            )

    # user 1: the pattern itself on days 3..9, +2 baseline (3,3,3,3,3,7,7)
    for j, q in enumerate(pattern):
        add(1, 3 + j, q + 2)
    # user 1 noise elsewhere; user 2: flat activity; user 3: anti-pattern
    add(1, 0, 4)
    for j in range(14):
        add(2, j, 2)
    for j, q in enumerate(reversed(pattern)):
        add(3, 3 + j, q)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = ts_shape_topk(df, pattern, k=5).collect()
    assert out[0]["user_id"] == 1
    assert out[0]["start_day"] == datetime.date(2024, 3, 4)
    assert out[0]["dist"] == 0
    # a perfectly flat window has zero centered energy of its own, so it
    # scores exactly the pattern's centered energy Σ(7q−15)² = 1120
    assert any(
        r["user_id"] == 2 and r["dist"] == 1120 for r in out
    ), out
    key = [(r["dist"], r["user_id"], r["start_day"]) for r in out]
    assert key == sorted(key)
