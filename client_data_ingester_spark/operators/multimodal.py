"""Multimodal column plumbing ([EXT], driver north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side plumbing — schema, partition-sized
Arrow batches through ``mapInPandas``, UDF signatures — is real and tested;
the actual media decoding is STUBBED (Pillow/librosa/av are not in this
container): ``decode_stub=True`` computes deterministic fake features from
the bytes, ``decode_stub=False`` raises NotImplementedError where the codec
call would go.

At scale: payloads live in parquet binary columns (or object-store pointers
for >~1 MB blobs); mapInPandas streams Arrow batches so an executor never
materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs
at once; feature extraction parallelism == partition count, so repartition by
a content-hash prefix for even blob-size distribution before decoding.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, "
    "content_hash string, feat_mean double, feat_dim int"
)


def attach_media_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a media table from a text corpus (deterministic fake
    payloads) — gives the plumbing something real to chew on in tests."""
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.length(F.col(text_col)) % 100).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _decode_real(kind: str, payload: bytes) -> list[float]:
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libraries "
        "(Pillow/librosa/av) not present in this environment; "
        "run with decode_stub=True for the deterministic fake path"
    )


def _decode_fake(kind: str, payload: bytes) -> list[float]:
    """Deterministic fake 'features': first 8 bytes of the md5 digest scaled
    to [0,1] — md5 keeps the whole path expressible in SQL for the oracle."""
    digest = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    Batch shape contract: each input pandas DataFrame carries bytes objects in
    'payload'; output rows align 1:1 with input (no fan-out here — frame
    sampling would fan out with an explode after this stage)."""
    decode = _decode_fake if decode_stub else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            # feat_mean computed as int-sum / (255*dim): one exact integer sum
            # then one float division → bit-identical across engines.
            digests = [hashlib.md5(p or b"").digest()[:8] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feat_mean": [
                        sum(d) / (255.0 * len(d)) for d in digests
                    ],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: fan out video rows to one row per sampled
    frame index (the decode of each frame is the stubbed step)."""
    vids = media.filter(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return vids.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, out_width int, out_height int, "
    "scale_x double, scale_y double, resized_hash string"
)


def resize_images(
    media: DataFrame,
    out_width: int = 32,
    out_height: int = 32,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing for image rows: Arrow-batched ``mapInPandas`` with a
    1:1 row contract, emitting the output geometry, the scale factors from
    the metadata dims, and a digest standing in for the resized payload.

    The pixel resample itself is the stubbed codec step (``decode_stub=False``
    raises where Pillow would be called); everything Spark-side — the image
    filter pushed to the scan, batch iteration, schema, scale math — is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                for k, p in zip(pdf["kind"], pdf["payload"]):
                    _decode_real(k, p)  # raises NotImplementedError
            widths = [m["width"] if m else None for m in pdf["meta"]]
            heights = [m["height"] if m else None for m in pdf["meta"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "scale_x": [
                        (out_width / w) if w else None for w in widths
                    ],
                    "scale_y": [
                        (out_height / h) if h else None for h in heights
                    ],
                    # stub stand-in for the resized payload: digest of the
                    # original payload + output geometry (deterministic)
                    "resized_hash": [
                        hashlib.md5(
                            (p or b"")
                            + f"|{out_width}x{out_height}".encode()
                        ).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )
