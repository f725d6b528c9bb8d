"""Multimodal column convention + batch processing plumbing
(SURVEY.md §2.9; BASELINE.json north-star).

Convention: media travels as an opaque ``payload: binary`` column next to a
typed ``media_meta`` struct (modality, format, width/height/duration,
byte size, content hash). All Spark-side machinery — schema, partition
sizing, Arrow-batched ``mapInPandas`` UDF signature, batch shape — is real
and tested; the actual codec work (image decode, resampling, frame
sampling) is stubbed behind ``DECODERS`` because media libraries are not in
this container: each stub either raises ``NotImplementedError`` (strict
mode) or produces a deterministic fake feature vector (test mode). Swapping
in a real decoder is a one-function change with the same batch interface.

Scale notes: mapInPandas streams Arrow record batches, so executor memory
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x mean blob
size — size it so batch_bytes << executor heap. Repartition by a
size-balancing key (e.g. bucketed content hash) before heavy decode stages
so stragglers don't dominate; blobs never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("format", T.StringType(), True),  # png | wav | mp4 | ...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        # double: the Python kernel computes float64; declaring float32
        # would quantize values the oracle gate checks bit-for-bit
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def media_meta_expr(payload: Column, modality: str, fmt: str | None = None) -> Column:
    """Build the media_meta struct for a binary payload column (hash + size
    computed JVM-side; width/height/duration filled by a real decoder)."""
    return F.struct(
        F.lit(modality).alias("modality"),
        F.lit(fmt).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
    )


def _fake_features(blob: bytes | None) -> list[float]:
    """Deterministic stand-in feature vector: byte-histogram moments.

    Replaces the real decode→embed step (libs not in this container); keeps
    the full Arrow round-trip shape honest."""
    if blob is None or len(blob) == 0:
        return [0.0] * FEATURE_DIM
    n = len(blob)
    # raw division, no rounding: int-sum / length is bit-exact IEEE on any
    # engine, whereas Python's banker's rounding diverges from SQL ROUND at
    # exact .5 decimal boundaries (found by the oracle gate)
    return [sum(blob[i::FEATURE_DIM]) / n for i in range(FEATURE_DIM)]


def _decode_stub(blob: bytes | None) -> list[float]:
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "container; register a real decoder in DECODERS"
    )


#: modality -> bytes -> feature vector. Test mode swaps in _fake_features.
DECODERS: dict[str, Callable[[bytes | None], list[float]]] = {
    "image": _decode_stub,
    "audio": _decode_stub,
    "video": _decode_stub,
}


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    decoders: dict[str, Callable[[bytes | None], list[float]]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over (id, payload, meta) rows.

    mapInPandas: each partition arrives as an iterator of pandas batches;
    blobs stay executor-side end to end.
    """
    use = decoders if decoders is not None else DECODERS
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col).getField("modality").alias("modality"),
        F.col(meta_col).getField("n_bytes").alias("n_bytes"),
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _one(m, b):
            if m is None:
                return None  # no meta, no modality: nothing to decode
            if m not in use:
                # strict mode (module contract): an unknown modality is a
                # wiring error, not silent NULL features downstream
                raise NotImplementedError(
                    f"extract_media_features: no decoder for modality {m!r}; "
                    f"known: {sorted(use)}"
                )
            return use[m](b)

        for pdf in batches:
            feats = [_one(m, b) for m, b in zip(pdf["modality"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return src.mapInPandas(_extract, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), True),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (the fan-out
    shape every video pipeline needs before per-frame embedding).

    Real decoders would seek/decode keyframes; without codec libraries the
    stub slices the payload into ``n_frames`` evenly-spaced byte windows
    and spaces timestamps across ``duration_ms`` — the Spark-side contract
    (schema, per-row fan-out inside mapInPandas, binary passthrough, batch
    shape) is fully real. Swap ``_slice_frames`` for a decoder to go live.
    """

    def _slice_frames(blob: bytes | None, duration_ms) -> list[tuple[int, int, bytes]]:
        if not blob:
            return []
        # pandas delivers a nullable long column as float64: a NULL
        # duration arrives as NaN, and int(NaN) raises — pd.isna covers
        # both None and NaN
        dur = 0 if pd.isna(duration_ms) else int(duration_ms)
        n = min(n_frames, len(blob))
        out = []
        for i in range(n):
            # proportional boundaries: frames tile the WHOLE payload
            # (floor-step dropped the tail) and timestamps space over the
            # actual frame count, spanning the clip
            lo = (len(blob) * i) // n
            hi = (len(blob) * (i + 1)) // n
            ts = (dur * i) // n if dur else 0
            out.append((i, ts, blob[lo:hi]))
        return out

    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col).getField("duration_ms").alias("duration_ms"),
    )

    def _expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_payload": []}
            for mid, blob, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                for idx, ts, frame in _slice_frames(blob, dur):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame_payload"].append(frame)
            yield pd.DataFrame(rows)

    return src.mapInPandas(_expand, schema=FRAMES_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Image resize stage: payload -> resized payload with updated meta.

    A real implementation decodes, resamples, and re-encodes inside the same
    Arrow batch loop; the stub derives a deterministic fake payload of
    width*height bytes (cycled source bytes) so the contract — binary in /
    binary out, meta width/height/n_bytes/content_hash updated, executor-
    side only — is fully exercised without codec libraries.
    """
    import hashlib

    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for blob, meta in zip(pdf["payload"], pdf["meta_struct"]):
                if blob is None or len(blob) == 0:
                    new = b""
                else:
                    reps = (target // len(blob)) + 1
                    new = (bytes(blob) * reps)[:target]
                payloads.append(new)
                # a NULL meta struct must not abort the stage (the sibling
                # operators tolerate missing meta fields): carry a meta
                # with modality 'unknown' instead (the schema declares
                # modality non-nullable — every written meta names one)
                meta = meta if meta is not None else {}
                metas.append(
                    {
                        "modality": meta.get("modality") or "unknown",
                        "format": meta.get("format"),
                        "width": width,
                        "height": height,
                        "duration_ms": meta.get("duration_ms"),
                        "n_bytes": len(new),
                        "content_hash": hashlib.md5(new).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "media_meta": metas}
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("media_meta", MEDIA_META_SCHEMA, True),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(meta_col).alias("meta_struct"),
    )
    return src.mapInPandas(_resize, schema=out_schema)
