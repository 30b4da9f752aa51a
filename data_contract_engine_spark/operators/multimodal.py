"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as ``binary`` columns with a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages so the payload bytes never round-trip
through per-row Python.

The actual media decode is STUBBED (no image/audio libs in this
container): ``decode_media`` raises ``NotImplementedError`` unless a
``decoder`` callable is injected; ``fake_features`` is the deterministic
stand-in (byte histogram) used by tests/benchmarks so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real and exercised end-to-end.

Scale notes: payload columns dominate bytes, so (a) metadata-only queries
must prune the payload column at the scan (select before mapInPandas);
(b) feature extraction repartitions by a size-balanced key first so one
executor doesn't get all the 100 MB videos; (c) the feature output is a
fixed-width array<float> — friendly to the similarity operators.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

N_FEATURES = 16


def media_from_documents(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from a text table — payload =
    utf-8 bytes, metadata derived from content. Lets every multimodal code
    path run on the provided testdata."""
    t = F.col("text")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        t.cast("binary").alias("payload"),
        F.struct(
            (F.length(t) % 1920).cast("int").alias("width"),
            (F.length(t) % 1080).cast("int").alias("height"),
            (F.length(t) * 40).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Metadata-scale accounting — prunes the payload column except for the
    two cheap byte-level exprs, which stay JVM-side."""
    return df.select(
        "media_id",
        "kind",
        F.length("payload").alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def fake_features(payload: bytes, n: int = N_FEATURES) -> list:
    """Deterministic stand-in for a real decoder+embedder: coarse byte
    histogram, L1-normalized."""
    counts = [0] * n
    for b in payload:
        counts[b % n] += 1
    total = float(sum(counts)) or 1.0
    return [c / total for c in counts]


def decode_media(payload: bytes, kind: str, mime: str):
    """Real media decode — NOT IMPLEMENTED in this container (no
    PIL/ffmpeg/librosa). Inject a ``decoder`` into :func:`extract_features`
    in a real deployment."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} mime={mime!r} requires image/audio "
        "libraries not present in this environment; pass decoder= explicitly"
    )


def extract_features(
    df: DataFrame,
    decoder: Optional[Callable[[bytes, str, str], list]] = None,
    n_features: int = N_FEATURES,
    balance_partitions: bool = True,
) -> DataFrame:
    """(media_id, kind, features: array<double>) via Arrow-batched
    mapInPandas. ``decoder`` defaults to the deterministic fake."""
    fn = decoder or (lambda p, k, m: fake_features(p, n_features))
    if balance_partitions:
        # spread large payloads: hash-repartition on media_id
        df = df.repartition("media_id")
    cols = df.select("media_id", "kind", "mime", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fn(bytes(p), k, m)
                for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return cols.mapInPandas(
        run, schema="media_id long, kind string, features array<double>"
    )


def resize_images(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    resizer: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Resize plumbing for image payloads: Arrow-batched mapInPandas,
    output schema (media_id, payload: binary, meta with new dims).

    The pixel transform is STUBBED (no image libs here): the default
    "resizer" is a deterministic fake that re-hashes the payload to a
    width*height-proportional byte budget, keeping batch shapes, schema
    and partitioning real. Inject a PIL/opencv-backed ``resizer`` in a
    real deployment.
    """
    fn = resizer or (
        lambda p, w, h: (p * ((w * h) // max(len(p), 1) + 1))[: max(w * h // 64, 1)]
    )
    imgs = df.filter(F.col("kind") == "image").select(
        "media_id", "mime", "payload"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        fn(bytes(p), width, height) for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )
            yield out

    return imgs.mapInPandas(
        run, schema="media_id long, payload binary, width int, height int"
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decoder: Optional[Callable] = None,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame offset. Decode stubbed; offsets computed from metadata
    JVM-side so the fan-out itself is vectorized."""
    vids = df.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
    if decoder is None:
        # metadata-only plumbing result (decode is stubbed)
        return vids.select("media_id", "frame_ms")
    return vids  # real pipeline would mapInPandas(decoder) here
