"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Media columns (image/audio/video) are carried as ``binary`` payloads
with a typed metadata struct; decode / feature-extraction runs as
Arrow-batched Pandas functions over ``mapInPandas``. The media codec
libraries (PIL/torchaudio/ffmpeg) are NOT in this container, so the
actual decode step is stubbed: ``decode_image`` raises
NotImplementedError unless PIL is importable, and ``byte_features``
is the deterministic stand-in extractor (real arithmetic over the raw
bytes — histogram moments — so the Spark-side plumbing: schema,
batching, partitioning, UDF signature, is fully real and tested).

Scale notes (100 TB of media): payloads dominate row size — operators
must never shuffle payload columns (select metadata before groupBy /
join; feature-extract first, then drop the payload). ``mapInPandas``
processes Arrow batches, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x payload size —
size that down for video-scale blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from mock_map_reduce_spark.functions.partitioning import spread

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, std_byte double, "
    "entropy_proxy double"
)


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a media table: utf-8 payload bytes + typed metadata struct."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decode path — stubbed: the image libraries are not installed.

    On a production image the try-import succeeds and this returns a
    decoded array; here it documents the exact seam where decoding
    plugs in.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "media decode requires an image library (PIL) not present in "
            "this container; use byte_features() as the deterministic stub"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def byte_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in feature extractor over raw payload bytes.

    mapInPandas: one Arrow batch in, one out — the exact plumbing a
    real decoder uses (same schema contract, same batch shape), with
    byte-histogram moments standing in for pixel statistics.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = int(arr.size)
                if n == 0:
                    rows.append((int(doc_id), 0, 0.0, 0.0, 0.0))
                    continue
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                p = counts[counts > 0] / n
                # entropy proxy: Shannon entropy over the byte histogram
                rows.append(
                    (
                        int(doc_id),
                        n,
                        float(np.round(arr.mean(), 6)),
                        float(np.round(arr.std(), 6)),
                        float(np.round(-(p * np.log2(p)).sum(), 6)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes", "mean_byte", "std_byte", "entropy_proxy"],
            )

    return spread(media.select(id_col, "payload"), heavy=True).mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_mean double"


def frame_sample(media: DataFrame, frame_size: int = 256, stride: int = 2, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling: one payload row -> N frame rows (UDTF shape).

    The video-pipeline primitive: chunk the payload into fixed-size
    "frames", keep every ``stride``-th, emit per-frame features. Real
    codecs plug into the same mapInPandas seam (decode_image); the
    chunking stand-in keeps batch shapes and the 1-to-N contract real.

    100 TB note: output fan-out is rows x frames — select/filter frame
    features BEFORE any join or shuffle; never carry the payload past
    this operator.
    """
    import numpy as np

    def sample(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_mean": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_frames = max((len(arr) + frame_size - 1) // frame_size, 0)
                for fi in range(0, n_frames, stride):
                    chunk = arr[fi * frame_size : (fi + 1) * frame_size]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(fi)
                    out["frame_mean"].append(float(np.round(chunk.mean(), 6)) if len(chunk) else 0.0)
            yield pd.DataFrame(out)

    return spread(media.select(id_col, "payload"), heavy=True).mapInPandas(sample, FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, n_bytes long"


def resize_payload(media: DataFrame, factor: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Resize/downsample: keep every ``factor``-th payload byte.

    Deterministic stand-in for media resize (image downscale / audio
    resample) — the real transform plugs into the same batch contract.
    Output payload is 1/factor the size; metadata is recomputed, and
    the ORIGINAL payload is dropped from the plan immediately (at
    100 TB the resize exists precisely to shrink what flows onward).
    """
    import numpy as np

    def shrink(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)[::factor]
                b = arr.tobytes()
                rows.append((int(doc_id), b, len(b)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "n_bytes"])

    return spread(media.select(id_col, "payload"), heavy=True).mapInPandas(shrink, RESIZE_SCHEMA)
