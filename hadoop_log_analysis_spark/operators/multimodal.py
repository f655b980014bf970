"""Multimodal (binary) column plumbing (SURVEY.md §2.8 L6).

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; per-item decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so bytes never cross
the JVM<->Python boundary row-at-a-time.

The container has no image/audio codecs, so the decode step is
STUBBED: ``decode_features`` tries the real decoder import (PIL) and
falls back to a clearly-marked deterministic fake that still
exercises the full Spark plumbing — schema contract, Arrow batch
shape, partition-parallel execution. The fixtures ship no binary
column either, so ``attach_synthetic_binary`` manufactures one
deterministically from document text (utf-8 bytes + a 4-byte magic
header), which keeps every byte reproducible for tests.

Scale posture: binary payloads stay columnar (Parquet binary + Arrow);
mapInPandas processes whole batches per core, and metadata-only
queries never touch the payload column thanks to Parquet column
pruning.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

MAGIC = b"FAKE"

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_synthetic_binary(docs: DataFrame) -> DataFrame:
    """Add a deterministic binary ``payload`` (magic header + utf-8
    text bytes) and a typed ``meta`` struct, as a real ingest would."""
    return docs.select(
        "doc_id",
        F.concat(F.lit(MAGIC), F.encode(F.col("text"), "utf-8")).alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpg").alias("fmt"),
            ((F.col("doc_id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 64).cast("int").alias("height"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes) -> tuple[int, int]:
    """Real decoder path — unavailable in this container (no codecs)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires a codec library (PIL) not present in "
            "this environment; deterministic fake decode is used instead"
        ) from exc
    raise NotImplementedError("real decode wired when codecs are available")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_sum", T.LongType()),
    ]
)


def sample_frames(
    binary_df: DataFrame, frame_bytes: int = 64, every: int = 4
) -> DataFrame:
    """Deterministic frame sampling over a binary payload: the payload
    is treated as a sequence of fixed-size ``frame_bytes`` frames (the
    stand-in for video frames — no codecs in this container) and every
    ``every``-th frame is emitted with its byte checksum.

    Arrow-batched ``mapInPandas``: whole partitions stream through the
    Python worker as columnar batches, so 100 TB of payloads decode at
    partition parallelism with no per-row overhead.
    """

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every):
                    chunk = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "n_frames": n_frames,
                            "frame_sum": sum(chunk),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        frames, FRAME_SCHEMA
    )


def resize_dims(df: DataFrame, box: int = 256) -> DataFrame:
    """Aspect-preserving resize plan from the metadata struct: target
    dimensions to fit a ``box``x``box`` bound, computed JVM-side (the
    actual pixel resample would ride the same mapInPandas path as
    decode_features; the PLAN — which items shrink and to what — is
    pure column arithmetic and needs no codec)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    longest = F.greatest(w, h)
    return df.select(
        "doc_id",
        F.when(longest <= box, w.cast("long"))
        .otherwise(F.floor(w * box / longest))
        .alias("rw"),
        F.when(longest <= box, h.cast("long"))
        .otherwise(F.floor(h * box / longest))
        .alias("rh"),
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    Validates the magic header, computes byte-level features, and
    emits the decoded (stub) dimensions from metadata. Schema is the
    pinned FEATURE_SCHEMA contract.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                data = bytes(payload)
                if not data.startswith(MAGIC):
                    continue  # malformed payload -> dropped (side-output at scale)
                body = data[len(MAGIC):]
                try:
                    _decode_real(data)
                    width, height = -1, -1  # pragma: no cover
                except NotImplementedError:
                    # deterministic fake decode: dims from metadata
                    width, height = int(meta["width"]), int(meta["height"])
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "fmt": meta["fmt"],
                        "n_bytes": len(body),
                        "checksum": sum(body) % 65536,
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return binary_df.mapInPandas(extract, FEATURE_SCHEMA)
