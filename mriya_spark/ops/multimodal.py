"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (SURVEY.md north star). The pattern for
image/audio/video at 100 TB: the payload is an opaque ``binary``
column (or a pointer into object storage), metadata is typed columns,
and decode/feature-extraction runs as Arrow-batched ``mapInPandas``
stages so bytes never round-trip through Python row objects.

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub (deterministic fake features keyed on the payload
hash — ``decode_stub``); everything Spark-side — schema, batch
iteration, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Feature vector length produced by the (stub) decoder.
FEATURE_DIM = 8

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, "
    "width int, height int, features array<float>"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal shape from the documents fixture:
    payload = utf-8 bytes of the text (stand-in for image bytes),
    plus typed metadata columns."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB — stands in for PIL/ffmpeg decode when no codec library is
    installed. Deterministic pseudo-features from the payload hash so
    the pipeline shape (schema, batching, partitioning) is fully
    testable. A real deployment replaces ONLY this function (or ships
    PIL, which ``decoder='auto'`` then picks up at runtime)."""
    h = hashlib.sha256(payload).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + FEATURE_DIM]]
    return width, height, feats


def _has_pil() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _pil_decode(payload: bytes) -> tuple[int, int, list[float]] | None:
    """Real image decode via PIL (used when the library is present):
    dimensions from the header, features = a 4x2 grayscale thumbnail
    normalized to [0,1] (FEATURE_DIM values — a stand-in visual
    fingerprint; swap in a model embedding for production use).
    Undecodable payloads return None -> NULL columns downstream (the
    realistic treatment: filter, don't fail the 100 TB job over one
    corrupt file)."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            width, height = im.size
            thumb = im.convert("L").resize((FEATURE_DIM // 2, 2))
            feats = [round(v / 255.0, 6) for v in thumb.getdata()]
            return width, height, feats
    except Exception:
        return None


def decode_payloads(df: DataFrame, decoder: str = "auto") -> DataFrame:
    """Arrow-batched decode stage over ``mapInPandas``.

    Real shape: iterator of pandas batches in/out, one task per
    partition, no driver involvement. ``decoder``:

    - ``'auto'`` (default): PIL when importable, else the stub —
      opportunistic real decode without a hard dependency;
    - ``'pil'``: require the real decoder (ValueError when absent);
    - ``'stub'``: deterministic fake features (hash-derived).

    The decoder is resolved to a NAME on the driver and looked up
    inside the batch function, so executors import PIL themselves and
    nothing un-picklable crosses the boundary.
    """
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError(
            f"unknown decoder {decoder!r}; expected 'auto', 'pil' or 'stub'"
        )
    if decoder == "pil" and not _has_pil():
        raise ValueError("decoder='pil' requested but PIL is not importable")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 'auto' resolves PER EXECUTOR, inside the task: on a cluster
        # with heterogeneous driver/executor images a driver-side
        # probe would either crash every task (driver has PIL,
        # executors don't) or silently downgrade the whole job
        if decoder == "pil" or (decoder == "auto" and _has_pil()):
            fn = _pil_decode
        else:
            fn = _fake_decode
        for pdf in batches:
            yield _decode_batch(pdf, fn)

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def _decode_batch(pdf: pd.DataFrame, fn) -> pd.DataFrame:
    """One Arrow batch through ``fn``; a ``None`` decode result (an
    undecodable payload under a real decoder) becomes NULL
    width/height/features via pandas nullable ints."""
    decoded = [fn(p) for p in pdf["payload"]]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": pdf["n_bytes"],
            "payload_sha": pdf["payload_sha"],
            "width": pd.array(
                [d[0] if d else None for d in decoded], dtype="Int32"
            ),
            "height": pd.array(
                [d[1] if d else None for d in decoded], dtype="Int32"
            ),
            "features": [d[2] if d else None for d in decoded],
        }
    )


def decode_stub(df: DataFrame) -> DataFrame:
    """The deterministic stub decode (back-compat name; the registered
    ``multimodal_decode`` query uses this so its output is stable in
    any environment)."""
    return decode_payloads(df, decoder="stub")


def av_segment_plan(
    df: DataFrame, *, segment_ms: int = 5_000, overlap_ms: int = 1_000
) -> DataFrame:
    """Audio/video time-segmentation plumbing: one row per
    ``segment_ms`` window (with ``overlap_ms`` lookback) across each
    payload's duration — the shape a transcription/embedding stage
    consumes (whisper-style 30s windows, clip-level video encoders).

    Duration is derived metadata here (1 byte ≙ 1 ms — the stub
    stand-in for an ffprobe header read); a real deployment swaps the
    duration source and keeps the identical explode. Segment bounds
    are clamped to the duration, the last segment may be short, empty
    payloads produce no rows. Scan-local: no shuffle, no Python.
    """
    if overlap_ms >= segment_ms:
        raise ValueError(f"overlap_ms ({overlap_ms}) must be < segment_ms ({segment_ms})")
    step = segment_ms - overlap_ms
    duration = F.col("n_bytes")  # ms; metadata stand-in
    starts = F.sequence(
        F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(step)
    )
    seg = (
        df.select(
            "doc_id",
            "payload_sha",
            duration.alias("duration_ms"),
            F.posexplode(starts).alias("segment_idx", "start_ms"),
        )
        .filter(F.col("start_ms") < F.col("duration_ms"))
    )
    return seg.select(
        "doc_id",
        "payload_sha",
        "segment_idx",
        "start_ms",
        F.least(
            F.col("start_ms") + segment_ms, F.col("duration_ms")
        ).alias("end_ms"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing: given payloads, emit one row per
    sampled "frame" index (0..n_bytes/1000 step every_n) — the posexplode
    pattern a real frame sampler uses, with byte offsets instead of
    decoded frames (decode itself is the stub above)."""
    n_frames = F.greatest((F.col("n_bytes") / 1000).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        "doc_id",
        "payload_sha",
        F.explode(idx).alias("frame_idx"),
    )
