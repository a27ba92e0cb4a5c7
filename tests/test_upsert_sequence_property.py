"""Sequence property test (VERDICT r9 ask #7): the merge's MODE INTERPLAY
— randomized sequences interleaving default-mode and full_update batches
with empty-sku always-insert rows and batch REPLAYS — against a pure-Python
oracle of the reference's per-row loop + bulk deactivate
(B/ingestion/service.py:66-109).

The existing ``test_upsert_property`` covers the column-fold matrix of a
single short sequence; this one covers 200 random multi-batch scenarios.
To fit the CI budget the scenarios run VECTORIZED: scenarios sharing a
(full_update, replay) step pattern ride ONE ``merge_products`` chain with
namespaced skus (``<scenario>:<sku>``) — per-sku semantics are key-local,
and full_update's left-anti deactivation only ever compares a scenario's
own namespaced keys, so 25 scenarios per lane merge in one Spark job
without interacting. Anonymous (empty-sku) rows carry their scenario id in
``title`` for attribution. 8 lanes x 4 steps = 32 merges total instead of
800.

Scope: typed values go straight into ``merge_products`` (the parser/
transformer layer has its own parity tests) — what this test pins is the
sequencing semantics: fold order, None-never-overwrites across batches,
full_update deactivating prior anon rows and stale skus (including ones
deactivated and later revived), and replays re-applying updates
idempotently for keyed rows while re-INSERTING anon rows.
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from client_data_ingester_spark.ingestion.parsers import ROW_IDX_COL
from client_data_ingester_spark.ingestion.service import merge_products
from client_data_ingester_spark.schemas import CLIENT_PRODUCTS_SCHEMA

MAPPED = ["sku", "title", "stock_quantity", "active"]
N_SCENARIOS = 200
N_LANES = 8
STEPS = 4


def _random_batch(rng, scenario):
    rows = []
    for _ in range(rng.randint(2, 5)):
        if rng.random() < 0.15:
            sku = ""  # falsy -> always-insert, attributed via title
            title = f"A{scenario}-{rng.randint(1, 99)}"
        else:
            sku = f"{scenario}:S{rng.randint(1, 4)}"  # few keys -> many dups
            title = (
                f"T{rng.randint(1, 99)}" if rng.random() < 0.75 else None
            )
        qty = rng.choice([0, 5, 999, None]) if rng.random() < 0.7 else None
        active = rng.choice([True, False, None])
        rows.append({"sku": sku, "title": title, "qty": qty, "active": active})
    return rows


def _oracle_apply(table, anon, batch, full_update):
    """The reference loop (B/ingestion/service.py:66-109) over typed rows:
    bulk deactivate on full_update (anon rows are never in the file's sku
    set, so they always deactivate), then per-row upsert with intra-file
    last-non-None fold via sequential application."""
    skus = {r["sku"] for r in batch if r["sku"]}
    if full_update:
        for sku, rec in table.items():
            if sku not in skus:
                rec["active"] = False
        for rec in anon:
            rec["active"] = False
    for r in batch:
        if r["sku"]:
            if r["sku"] in table:
                rec = table[r["sku"]]
                for k in ("title", "qty"):
                    if r[k] is not None:
                        rec[k] = r[k]
                if r["active"] is not None:
                    rec["active"] = r["active"]
            else:
                table[r["sku"]] = {
                    "title": r["title"],
                    "qty": r["qty"],
                    "active": True if r["active"] is None else r["active"],
                }
        else:
            anon.append(
                {
                    "title": r["title"],
                    "qty": r["qty"],
                    "active": True if r["active"] is None else r["active"],
                }
            )


def test_mode_interplay_sequences_match_reference_oracle(spark):
    rng = random.Random(20260814)
    # 8 random step patterns; step 0 never replays (nothing to replay)
    patterns = []
    seen = set()
    while len(patterns) < N_LANES:
        p = tuple(
            (rng.random() < 0.4, i > 0 and rng.random() < 0.3)
            for i in range(STEPS)
        )
        if p not in seen:
            seen.add(p)
            patterns.append(p)
    # ensure the interesting interplays are present at least once
    patterns[0] = ((False, False), (True, False), (False, False), (True, True))
    patterns[1] = ((False, False), (False, True), (True, False), (False, False))

    per_lane = N_SCENARIOS // N_LANES
    scenarios = {}  # scenario id -> (lane, [batch per step])
    for lane in range(N_LANES):
        pat = patterns[lane]
        for j in range(per_lane):
            sid = f"c{lane}x{j}"
            batches = []
            for step, (_fu, replay) in enumerate(pat):
                if replay:
                    batches.append(batches[step - 1])  # exact re-application
                else:
                    batches.append(_random_batch(rng, sid))
            scenarios[sid] = (lane, batches)

    ts = dt.datetime(2026, 1, 1, 0, 0, 0)
    lane_final = {}
    for lane in range(N_LANES):
        pat = patterns[lane]
        current = spark.createDataFrame([], CLIENT_PRODUCTS_SCHEMA)
        for step, (fu, _replay) in enumerate(pat):
            rows = []
            for sid, (ln, batches) in scenarios.items():
                if ln != lane:
                    continue
                rows.extend(batches[step])
            updates = spark.createDataFrame(
                [
                    (r["sku"], r["title"], r["qty"], r["active"], i)
                    for i, r in enumerate(rows)
                ],
                f"sku string, title string, stock_quantity int, "
                f"active boolean, {ROW_IDX_COL} long",
            )
            current = merge_products(
                current, updates, MAPPED, 1, fu, ts, id_base=step * 100000
            ).localCheckpoint()
        lane_final[lane] = current.select(
            "sku", "title", "stock_quantity", "active"
        ).collect()

    # oracle per scenario, compared against the lane's namespaced slice
    n_checked = 0
    for sid, (lane, batches) in scenarios.items():
        table, anon = {}, []
        for step, (fu, _replay) in enumerate(patterns[lane]):
            _oracle_apply(table, anon, batches[step], fu)
        got_keyed = {}
        got_anon = []
        for r in lane_final[lane]:
            if r["sku"].startswith(f"{sid}:"):
                got_keyed[r["sku"]] = {
                    "title": r["title"],
                    "qty": r["stock_quantity"],
                    "active": r["active"],
                }
            elif r["sku"] == "" and (r["title"] or "").startswith(f"A{sid}-"):
                got_anon.append(
                    {
                        "title": r["title"],
                        "qty": r["stock_quantity"],
                        "active": r["active"],
                    }
                )
        assert got_keyed == table, (sid, patterns[lane], batches)
        key = lambda a: (a["title"] or "", -1 if a["qty"] is None else a["qty"], a["active"])  # noqa: E731
        assert sorted(got_anon, key=key) == sorted(anon, key=key), (
            sid,
            patterns[lane],
            batches,
        )
        n_checked += 1
    assert n_checked == N_SCENARIOS
