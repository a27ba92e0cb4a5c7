"""Property test (SURVEY §7 watch-list #1): the distributed merge must
reproduce the reference's per-row loop (B/ingestion/service.py:83-106)
exactly — intra-file duplicate folding, None-never-overwrites, empty-sku
always-insert, garbage-integer→0, and full-update deactivation.

A pure-Python oracle simulates the reference loop over the *effective* CSV
cells (a middle absent field serializes as "" = present-empty; only trailing
absent fields are truly missing — exactly what ragged client files do).
Seeded random batches instead of a hypothesis engine: one Spark merge costs
seconds, so coverage comes from breadth per batch, not example count."""

import random

from client_data_ingester_spark.ingestion import ParserConfig, ingest_data

CFG = ParserConfig(
    "csv",
    {
        "sku": ("sku", "text"),
        "title": ("title", "text"),
        "qty": ("stock_quantity", "integer"),
        "active": ("active", "boolean"),
    },
)

FIELDS = ["sku", "title", "qty", "active"]


def encode_batch(rows):
    """Build the ragged CSV and the effective cell view the parser will see:
    trailing None fields vanish (absent); middle None fields become ""."""
    lines = [",".join(FIELDS)]
    effective = []
    for r in rows:
        cells = [r.get(f) for f in FIELDS]
        while cells and cells[-1] is None:
            cells.pop()
        eff = {}
        for i, v in enumerate(cells):
            eff[FIELDS[i]] = "" if v is None else v
        effective.append(eff)
        lines.append(",".join("" if v is None else v for v in cells))
    return ("\n".join(lines) + "\n").encode(), effective


def transform(eff):
    """Reference transformer semantics over effective cells (absent = key
    missing entirely)."""
    rec = {}
    if "sku" in eff:
        rec["sku"] = eff["sku"].strip()
    if "title" in eff:
        rec["title"] = eff["title"].strip()
    if "qty" in eff:
        try:
            rec["qty"] = int(float(eff["qty"].strip()))
        except ValueError:
            rec["qty"] = 0
    if "active" in eff:
        v = eff["active"].strip().lower()
        if v in ("yes", "true", "1"):
            rec["active"] = True
        elif v in ("no", "false", "0"):
            rec["active"] = False
        else:
            raise ValueError(f"invalid boolean {eff['active']!r}")
    return rec


def python_oracle(batches):
    table = {}
    anon = []
    for effective_rows, full_update in batches:
        recs = [transform(e) for e in effective_rows if e]
        skus = {r["sku"] for r in recs if r.get("sku")}
        if full_update:
            for sku, rec in table.items():
                if sku not in skus:
                    rec["active"] = False
            for rec in anon:  # "" skus are never in the file's sku set →
                rec["active"] = False  # the bulk deactivate always hits them
        for rec in recs:
            if not rec:
                continue
            sku = rec.get("sku")
            if sku:
                if sku in table:
                    for k, v in rec.items():
                        if k != "sku" and v is not None:
                            table[sku][k] = v
                    continue
                table[sku] = {
                    "title": rec.get("title"),
                    "qty": rec.get("qty"),
                    "active": rec.get("active", True),
                }
            else:
                anon.append(
                    {
                        "title": rec.get("title"),
                        "qty": rec.get("qty"),
                        "active": rec.get("active", True),
                    }
                )
    by_sku = {
        sku: (rec["title"], rec["qty"], rec["active"])
        for sku, rec in table.items()
    }
    return by_sku, sorted(
        (a["title"] or "", a["qty"] or -1, a["active"]) for a in anon
    )


def random_rows(rng, n):
    rows = []
    for _ in range(n):
        r = {}
        kind = rng.random()
        if kind < 0.85:
            r["sku"] = f"S{rng.randint(1, 6)}"  # few keys → many dups
        else:
            r["sku"] = ""  # falsy → always-insert
        if rng.random() < 0.8:
            r["title"] = f"T{rng.randint(1, 99)}"
        else:
            r["title"] = None
        if rng.random() < 0.6:
            r["qty"] = rng.choice(["5", "12.7", "abc", "0", "999", ""])
        else:
            r["qty"] = None
        if rng.random() < 0.6:
            r["active"] = rng.choice(["1", "0", "yes", "No", "TRUE", "false"])
        else:
            r["active"] = None  # last field → truly absent when None
        rows.append(r)
    return rows


def test_merge_matches_python_oracle(spark, products_table):
    rng = random.Random(1234)
    batches = []
    for i in range(4):
        rows = random_rows(rng, 12)
        full_update = i == 2
        payload, effective = encode_batch(rows)
        batches.append((effective, full_update))
        rep = ingest_data(
            spark,
            products_table,
            payload,
            CFG,
            client_id=1,
            full_update=full_update,
        )
        assert rep.success, rep.message
        expected_processed = sum(1 for e in effective if e)
        assert rep.processed_items == expected_processed

    expected_by_sku, expected_anon = python_oracle(batches)
    got = products_table.read(spark, 1).collect()
    got_by_sku = {
        r["sku"]: (r["title"], r["stock_quantity"], r["active"])
        for r in got
        if r["sku"]
    }
    got_anon = sorted(
        (r["title"] or "", r["stock_quantity"] or -1, r["active"])
        for r in got
        if not r["sku"]
    )
    assert got_by_sku == expected_by_sku
    assert got_anon == expected_anon
