"""Multimodal column convention + batch processing plumbing
(SURVEY.md §2.9; BASELINE.json north-star).

Convention: media travels as an opaque ``payload: binary`` column next to a
typed ``media_meta`` struct (modality, format, width/height/duration,
byte size, content hash). All Spark-side machinery — schema, partition
sizing, Arrow-batched ``mapInPandas`` UDF signature, batch shape — is real
and tested. Decoding is format-tiered (round 8): WAV and BMP payloads
REALLY decode end to end with stdlib parsers (``wave`` / ``struct`` — see
``decode_wav_features`` / ``decode_bmp_features`` and the
``probe_media_meta`` header prober); PNG IHDR and JPEG SOF headers also
parse with plain ``struct`` (round 9), and GIF logical-screen + WebP
RIFF headers complete the four common web image formats (round 10 —
VP8/VP8L/VP8X all covered; real width/height, no codec library needed);
PIXEL decoding for
formats that need codec libraries (png/jpeg/mp3/mp4/...) raises
``NotImplementedError``
loudly (strict mode), and tests may swap in the deterministic
``_fake_features``. Swapping in a real codec-backed decoder is a
one-function change with the same batch interface.

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


# ---------------------------------------------------------------------------
# Real stdlib decoders (round 8): WAV via the `wave` module, BMP via
# `struct` header parsing — genuine byte decoding end to end for the two
# formats the standard library can read. Formats that need external codec
# libraries (png/jpeg/mp3/mp4/...) still raise NotImplementedError
# loudly; this keeps the strict-mode contract while making the default
# DECODERS table actually decode something real.
# ---------------------------------------------------------------------------


def parse_wav_meta(blob: bytes | None) -> dict | None:
    """Parse a RIFF/WAVE header: channels, sample rate, sample width,
    frame count, duration_ms. None for empty/non-WAV payloads AND for
    truncated/corrupt ones that carry the magic but don't parse — this
    is the best-effort probe contract (one bad crawl blob must not kill
    the executor task; the strict decode path raises instead)."""
    if not blob or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
            n = w.getnframes()
            rate = w.getframerate()
            return {
                "channels": w.getnchannels(),
                "framerate": rate,
                "sampwidth": w.getsampwidth(),
                "n_frames": n,
                "duration_ms": (n * 1000) // rate if rate else 0,
            }
    except (wave.Error, EOFError, ValueError, RuntimeError, OSError):
        # wave/chunk raise a zoo on truncation: wave.Error for bad
        # headers, EOFError for short reads, bare RuntimeError from
        # chunk.skip() on out-of-range seeks — all mean "not parseable".
        return None


def decode_wav_features(blob: bytes | None) -> list[float]:
    """Real audio decode: read the PCM frames as signed samples (the
    `array` module — audioop is deprecated by PEP 594), split the sample
    stream into FEATURE_DIM equal windows, and emit mean |sample| per
    window normalized to [0, 1] — a deterministic loudness envelope.
    Integer sums divided once at the end keep the floats bit-stable
    across engines and layouts (the _fake_features policy)."""
    if not blob:
        return [0.0] * FEATURE_DIM
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio decode: payload is not RIFF/WAVE; only WAV decodes "
            "with the stdlib — register a codec-backed decoder in "
            "DECODERS for other formats"
        )
    import io
    import wave
    from array import array

    # strict path: one open reads header AND frames (the best-effort
    # header probe is parse_wav_meta); a corrupt claimed-WAV raises here.
    with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
        frames = w.readframes(w.getnframes())
        width = w.getsampwidth()
    typecode = {1: "b", 2: "h", 4: "i"}.get(width)
    if typecode is None:
        raise NotImplementedError(f"WAV decode: unsupported sample width {width}")
    samples = array(typecode)
    samples.frombytes(frames[: (len(frames) // width) * width])
    if not samples:
        return [0.0] * FEATURE_DIM
    full = float(1 << (8 * width - 1))
    n = len(samples)
    step = max(1, n // FEATURE_DIM)
    out = []
    for i in range(FEATURE_DIM):
        lo = min(i * step, n)
        hi = min(lo + step, n) if i < FEATURE_DIM - 1 else n
        win = samples[lo:hi]
        out.append((sum(abs(s) for s in win) / len(win)) / full if win else 0.0)
    return out


def parse_bmp_meta(blob: bytes | None) -> dict | None:
    """Parse a BMP (BITMAPINFOHEADER) header: width, height, bits per
    pixel, pixel-array offset. None for empty/non-BMP payloads."""
    if not blob or len(blob) < 54 or blob[:2] != b"BM":
        return None
    import struct

    offset = struct.unpack_from("<I", blob, 10)[0]
    header_size = struct.unpack_from("<I", blob, 14)[0]
    if header_size < 40:  # BITMAPCOREHEADER etc. — not emitted by us
        return None
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    return {
        "width": width,
        "height": abs(height),  # negative height = top-down rows
        "top_down": height < 0,
        "bpp": bpp,
        "pixel_offset": offset,
    }


#: PNG file signature (8 bytes), followed immediately by the IHDR chunk.
_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: JPEG start-of-frame markers that carry dimensions: C0-CF minus DHT
#: (C4), JPG (C8), DAC (CC).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_png_meta(blob: bytes | None) -> dict | None:
    """Parse a PNG IHDR header: width, height, bit depth, color type —
    pure ``struct``, no codec library (the IHDR chunk is REQUIRED to be
    first by the PNG spec, so one fixed-offset read covers every valid
    file). None for empty/non-PNG/truncated payloads (best-effort probe
    contract; full pixel decode stays the loud codec boundary)."""
    if not blob or len(blob) < 26 or blob[:8] != _PNG_SIG:
        return None
    if blob[12:16] != b"IHDR":
        return None  # spec violation — don't guess
    import struct

    width, height = struct.unpack_from(">II", blob, 16)
    bit_depth, color_type = blob[24], blob[25]
    if width == 0 or height == 0:
        return None
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


def parse_jpeg_meta(blob: bytes | None) -> dict | None:
    """Parse JPEG dimensions from the first SOF marker: walk the marker
    segments from SOI (each carries its own 2-byte big-endian length, so
    the walk needs no entropy decoding) until a start-of-frame, then read
    precision/height/width. The walk is clamped to the payload and every
    step advances, so a corrupt length field terminates instead of
    spinning (the BMP loop-bounds rule). None when no SOF is found before
    scan data / end of payload."""
    if not blob or len(blob) < 4 or blob[0] != 0xFF or blob[1] != 0xD8:
        return None
    import struct

    pos, n = 2, len(blob)
    while pos + 3 < n:
        if blob[pos] != 0xFF:
            return None  # lost marker sync — not parseable
        # fill bytes: any number of 0xFF may pad before the marker id
        while pos < n and blob[pos] == 0xFF:
            pos += 1
        if pos >= n:
            return None
        marker = blob[pos]
        pos += 1
        if marker == 0xD9 or marker == 0xDA:
            return None  # EOI / start-of-scan before any SOF
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone markers carry no length
        if pos + 2 > n:
            return None
        (seg_len,) = struct.unpack_from(">H", blob, pos)
        if seg_len < 2:
            return None  # corrupt length would stall the walk
        if marker in _JPEG_SOF:
            if pos + 7 > n:
                return None
            precision = blob[pos + 2]
            height, width = struct.unpack_from(">HH", blob, pos + 3)
            if width == 0 or height == 0:
                return None
            return {
                "width": width,
                "height": height,
                "precision": precision,
                # all four progressive-DCT frame types (ITU T.81: SOF2
                # huffman 0xC2, SOF6 differential huffman 0xC6, SOF10
                # arithmetic 0xCA, SOF14 differential arithmetic 0xCE) —
                # not just SOF2
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
            }
        pos += seg_len
    return None


def parse_gif_meta(blob: bytes | None) -> dict | None:
    """Parse a GIF header: 6-byte signature (``GIF87a``/``GIF89a``)
    followed by the logical screen descriptor — width and height are
    fixed-offset little-endian u16s, so one ``struct`` read covers every
    valid file (the descriptor is mandatory and always first). None for
    empty/non-GIF/truncated/zero-dim payloads (best-effort probe
    contract; frame decode stays the loud codec boundary)."""
    if not blob or len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    import struct

    width, height = struct.unpack_from("<HH", blob, 6)
    if width == 0 or height == 0:
        return None
    return {
        "width": width,
        "height": height,
        "version": blob[3:6].decode("ascii"),
    }


def parse_webp_meta(blob: bytes | None) -> dict | None:
    """Parse WebP dimensions from the RIFF container's first chunk —
    all three bitstream layouts (the complete set WebP defines):

    - ``VP8 `` (lossy): 3-byte sync code ``9D 01 2A`` then 14-bit
      width/height u16s;
    - ``VP8L`` (lossless): ``2F`` signature byte then width-1/height-1
      packed into 14-bit fields of one little-endian u32;
    - ``VP8X`` (extended): 24-bit canvas width-1/height-1 at fixed
      offsets (animations/alpha/EXIF carry their real dims here).

    Every read is bounds-checked against the payload and the chunk
    fourCC dispatch cannot loop (single fixed-offset probe, the BMP
    loop-bounds rule trivially). None for non-WebP/truncated/bad-sync/
    zero-dim payloads."""
    if not blob or len(blob) < 16 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        return None
    import struct

    four = blob[12:16]
    if four == b"VP8 ":
        # 20-22: VP8 frame tag; 23-25: start code; 26/28: dims
        if len(blob) < 30 or blob[23:26] != b"\x9d\x01\x2a":
            return None
        w_raw, h_raw = struct.unpack_from("<HH", blob, 26)
        width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
        kind = "lossy"
    elif four == b"VP8L":
        if len(blob) < 25 or blob[20] != 0x2F:
            return None
        (bits,) = struct.unpack_from("<I", blob, 21)
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
        kind = "lossless"
    elif four == b"VP8X":
        if len(blob) < 30:
            return None
        width = int.from_bytes(blob[24:27], "little") + 1
        height = int.from_bytes(blob[27:30], "little") + 1
        kind = "extended"
    else:
        return None
    if width == 0 or height == 0:
        return None
    return {"width": width, "height": height, "kind": kind}


def decode_bmp_features(blob: bytes | None) -> list[float]:
    """Real image decode: parse the BMP header, walk the pixel array
    row by row STRIPPING the 4-byte row padding, and emit mean byte
    intensity (0..1) over FEATURE_DIM equal pixel-stream windows."""
    if not blob:
        return [0.0] * FEATURE_DIM
    meta = parse_bmp_meta(blob)
    if meta is None:
        raise NotImplementedError(
            "image decode: payload is not BMP; only BMP decodes with the "
            "stdlib — register a codec-backed decoder in DECODERS for "
            "png/jpeg/..."
        )
    if meta["bpp"] not in (8, 24, 32):
        raise NotImplementedError(f"BMP decode: unsupported bpp={meta['bpp']}")
    row_bytes = (meta["width"] * meta["bpp"]) // 8
    stride = (row_bytes + 3) & ~3
    # NEVER trust the header's dimensions for loop bounds: a corrupt or
    # malicious header claiming height=2e9 over a 100-byte payload must
    # not drive 2e9 iterations inside an executor. Clamp the row walk to
    # what the payload can actually hold.
    payload = max(0, len(blob) - meta["pixel_offset"])
    rows = 0 if row_bytes <= 0 else min(meta["height"], (payload + stride - 1) // stride)
    px = bytearray()
    for r in range(rows):
        lo = meta["pixel_offset"] + r * stride
        px += blob[lo : lo + row_bytes]
    if not px:
        return [0.0] * FEATURE_DIM
    n = len(px)
    step = max(1, n // FEATURE_DIM)
    out = []
    for i in range(FEATURE_DIM):
        lo = min(i * step, n)
        hi = min(lo + step, n) if i < FEATURE_DIM - 1 else n
        win = px[lo:hi]
        out.append((sum(win) / len(win)) / 255.0 if win else 0.0)
    return out


def _decode_image(blob: bytes | None) -> list[float]:
    return decode_bmp_features(blob)


def _decode_audio(blob: bytes | None) -> list[float]:
    return decode_wav_features(blob)


#: modality -> bytes -> feature vector. image/audio REALLY decode (BMP /
#: WAV via stdlib; anything else raises loudly); video still needs codec
#: libraries. Test mode swaps in _fake_features.
DECODERS: dict[str, Callable[[bytes | None], list[float]]] = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _decode_stub,
}


def probe_media_meta(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Fill the decoder-owned meta fields (width/height/duration_ms) by
    actually parsing the payload headers (WAV/BMP/PNG/JPEG/GIF/WebP
    stdlib parsers — all plain ``struct`` reads, so the four common web
    image formats get real dimensions with no codec library; other
    formats keep their NULLs — probing is best-effort by design, unlike
    feature extraction which must not silently skip).
    Same Arrow batch shape as extract_media_features; blobs never leave
    the executors."""
    cols = [c for c in df.columns]

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob, meta in zip(pdf[payload_col], pdf[meta_col]):
                meta = dict(meta) if meta is not None else {}
                wav = parse_wav_meta(blob)
                img = (
                    parse_bmp_meta(blob)
                    or parse_png_meta(blob)
                    or parse_jpeg_meta(blob)
                    or parse_gif_meta(blob)
                    or parse_webp_meta(blob)
                )
                if wav is not None:
                    meta["duration_ms"] = wav["duration_ms"]
                elif img is not None:
                    meta["width"] = img["width"]
                    meta["height"] = img["height"]
                metas.append(meta)
            pdf = pdf.copy()
            pdf[meta_col] = metas
            yield pdf

    return df.mapInPandas(
        _probe,
        schema=T.StructType(
            [
                df.schema[c]
                if c != meta_col
                else T.StructField(meta_col, MEDIA_META_SCHEMA, True)
                for c in cols
            ]
        ),
    )


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
