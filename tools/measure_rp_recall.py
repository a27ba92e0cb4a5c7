"""Empirical RP-LSH candidate recall vs corpus scale.

The adaptive geometry (similarity.adaptive_rp_bits) holds bucket
OCCUPANCY constant as the corpus grows by widening the band keys — but
wider keys cut the per-band collision probability of genuinely similar
pairs, so with a FIXED band count recall silently decays with scale
(8 → 16 bits halves-and-more the 2-band recall at the 0.95-cosine design
point: ~0.67 → ~0.33). ``rp_bands_for_recall`` repairs that by growing
the band count with bits. This tool MEASURES both sides of the claim on
the real corpora, per sf:

- ground truth: a deterministic hash-ordered sample of query vectors is
  exact-cosine-scored against the WHOLE corpus (sample x n dot products,
  embarrassingly parallel — this is why recall is measured on a sample:
  the full n² truth set is exactly the thing LSH exists to avoid);
- candidates: the sampled ids' band keys joined against the corpus keys
  at (a) the recall-targeted adaptive geometry the build now chooses and
  (b) the legacy fixed-2-band geometry at the same bits;
- recall@cos = |candidates ∩ truth| / |truth| over pairs with exact
  cosine ≥ the evaluation threshold.

Writes RECALL_RP.json at the repo root (override with
SPARK_GRAFT_RECALL_OUT); one entry per sf with both geometries'
recalls so the decay and the repair are visible side by side.

Usage:
  SPARK_GRAFT_RECALL_SFS="/root/testdata/sf0.01,/root/testdata/sf0.1,\
/root/repo/scaledata/sf0.5,/root/repo/scaledata/sf1" \
  python tools/measure_rp_recall.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from client_data_ingester_spark.operators import similarity as S  # noqa: E402
from client_data_ingester_spark.session import get_spark  # noqa: E402

SAMPLE = int(os.environ.get("SPARK_GRAFT_RECALL_SAMPLE", "300"))
EVAL_COS = [0.95, 0.9, 0.8]


def _cosine(a, b):
    dot = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    na = F.zip_with(a, a, lambda x, y: x.cast("double") * y.cast("double"))
    nb = F.zip_with(b, b, lambda x, y: x.cast("double") * y.cast("double"))
    s = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)  # noqa: E731
    return s(dot) / (F.sqrt(s(na)) * F.sqrt(s(nb)))


def _candidate_pairs(sample_keys, corpus_keys):
    """Distinct (query_id, vec_id) pairs colliding in >=1 band, self
    excluded — the LSH candidate set restricted to the sampled queries."""
    return (
        sample_keys.select(
            F.col("id").alias("query_id"), "band", "key"
        )
        .join(corpus_keys.select(F.col("id").alias("vec_id"), "band", "key"),
              ["band", "key"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def _planted_truth(spark, emb, n):
    """The planted near-duplicate ground truth for this corpus, or None
    when the corpus has no plants (driver-shipped testdata predates the
    planting generator). Presence is VERIFIED, not assumed: the exact
    cosine of a handful of would-be planted pairs must match their
    target to 1e-3 — an unplanted corpus fails immediately."""
    import gen_testdata as G

    plants = G.planted_truth(spark, n)
    probe = (
        plants.limit(8)
        .join(
            emb.select(F.col("vec_id").alias("id_a"),
                       F.col("embedding").alias("_va")), "id_a")
        .join(
            emb.select(F.col("vec_id").alias("id_b"),
                       F.col("embedding").alias("_vb")), "id_b")
        .select(
            F.abs(_cosine(F.col("_va"), F.col("_vb")) - F.col("target_cos"))
            .alias("err")
        )
        .agg(F.count("*").alias("n"), F.max("err").alias("e"))
        .first()
    )
    if not probe["n"] or probe["e"] is None or probe["e"] > 1e-3:
        return None
    return plants


def _planted_recall(keys, plants):
    """Candidate recall over ALL planted pairs (not a sample), per
    target cosine and aggregated at the ≥0.95 design point — the
    measured contract `rp_bands_for_recall` promises. Linear work: the
    plant relation keys the band join, never a corpus self-join."""
    ka = keys.select(F.col("id").alias("id_a"), "band", "key")
    kb = keys.select(F.col("id").alias("id_b"), "band", "key")
    hits = (
        plants.join(ka, "id_a")
        .join(kb, ["id_b", "band", "key"], "left_semi")
        .select("id_a", "id_b", "target_cos")
        .distinct()
    )
    tot = {r["target_cos"]: r["n"] for r in
           plants.groupBy("target_cos").agg(F.count("*").alias("n")).collect()}
    hit = {r["target_cos"]: r["n"] for r in
           hits.groupBy("target_cos").agg(F.count("*").alias("n")).collect()}
    per = {
        str(t): {
            "pairs": tot[t],
            "recall": round(hit.get(t, 0) / tot[t], 4) if tot[t] else None,
        }
        for t in sorted(tot)
    }
    t95 = sum(n for t, n in tot.items() if t >= 0.95)
    h95 = sum(n for t, n in hit.items() if t >= 0.95)
    per["ge_0.95"] = {
        "pairs": t95,
        "recall": round(h95 / t95, 4) if t95 else None,
    }
    return per


def _recalls(cand, truth):
    """recall per eval threshold: truth carries (query_id, vec_id, cos)."""
    hit = truth.join(cand, ["query_id", "vec_id"], "left_semi")
    out = {}
    for thr in EVAL_COS:
        t = truth.where(F.col("cos") >= thr).count()
        h = hit.where(F.col("cos") >= thr).count()
        out[str(thr)] = {
            "truth_pairs": t,
            "recall": round(h / t, 4) if t else None,
        }
    return out


def main() -> None:
    sf_dirs = os.environ.get(
        "SPARK_GRAFT_RECALL_SFS",
        "/root/testdata/sf0.01,/root/testdata/sf0.1,"
        "/root/repo/scaledata/sf0.5,/root/repo/scaledata/sf1",
    ).split(",")
    spark = get_spark(
        "rp-recall", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    results = {}
    for sf_dir in sf_dirs:
        sf = os.path.basename(sf_dir.rstrip("/"))
        t0 = time.time()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n = emb.count()
        # deterministic query sample: smallest xxhash64(vec_id)
        sample = (
            emb.orderBy(F.xxhash64(F.col("vec_id").cast("long")), "vec_id")
            .limit(SAMPLE)
            .localCheckpoint()
        )
        # exact ground truth: sample x corpus cosine (sample broadcast)
        truth = (
            emb.crossJoin(
                F.broadcast(
                    sample.select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("qv"),
                    )
                )
            )
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                _cosine(F.col("qv"), F.col("embedding")).alias("cos"),
            )
            .where(F.col("cos") >= min(EVAL_COS))
            .localCheckpoint()
        )
        entry = {"n_rows": n}
        with tempfile.TemporaryDirectory() as work:
            # (a) the production geometry: adaptive bits + recall bands
            path_a = os.path.join(work, "rp_adaptive")
            S.build_rp_index(emb, path_a)  # adaptive bits + recall bands
            geom = S.load_rp_geometry(path_a)
            keys_a = S.load_rp_index(spark, path_a)
            skeys_a = S.rp_band_keys(
                sample, geom["bits"], geom["bands"], geom["dim"]
            )
            entry["adaptive"] = {
                "bits": geom["bits"],
                "bands": geom["bands"],
                "recall": _recalls(
                    _candidate_pairs(skeys_a, keys_a), truth
                ),
            }
            # (b) the legacy fixed-2-band geometry at the SAME bits —
            # isolates the recall the band formula wins back
            path_b = os.path.join(work, "rp_legacy")
            S.build_rp_index(emb, path_b, bits=geom["bits"], bands=2)
            keys_b = S.load_rp_index(spark, path_b)
            skeys_b = S.rp_band_keys(sample, geom["bits"], 2, geom["dim"])
            entry["fixed_2_bands"] = {
                "bits": geom["bits"],
                "bands": 2,
                "recall": _recalls(
                    _candidate_pairs(skeys_b, keys_b), truth
                ),
            }
            # planted-pair recall: exhaustive over every planted clone
            # pair (no sampling error), per target cosine — the direct
            # measurement of the ≥0.8-at-cos≥0.95 design contract
            plants = _planted_truth(spark, emb, n)
            if plants is not None:
                plants = plants.localCheckpoint()
                entry["adaptive"]["planted"] = _planted_recall(keys_a, plants)
                entry["fixed_2_bands"]["planted"] = _planted_recall(
                    keys_b, plants
                )
        entry["sec"] = round(time.time() - t0, 1)
        results[sf] = entry
        print(f"[recall] {sf}: {json.dumps(entry)}", file=sys.stderr, flush=True)

    out = os.environ.get("SPARK_GRAFT_RECALL_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RECALL_RP.json",
    )
    with open(out, "w") as fh:
        json.dump({"sample": SAMPLE, "eval_cos": EVAL_COS, "sfs": results},
                  fh, indent=1)
    print(json.dumps({"recall_rp": out}))


if __name__ == "__main__":
    main()
