"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas functions over ``mapInPandas``.

Design (the part that must be right at 100 TB):
- media lives in a ``binary`` column next to typed metadata columns;
  Parquet stores it page-compressed, Spark never interprets it until
  an explicit decode operator runs;
- decode / feature-extract run as ``mapInPandas`` so bytes move
  executor→Python in Arrow record batches (never row-at-a-time), and
  each batch's output row count may differ from its input (e.g. frame
  sampling explodes rows);
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  to keep peak Python memory ∝ batch, not partition.

The actual codecs (PIL/ffmpeg-style) are NOT in this container, so
``decode_image`` ships a deterministic fake decoder and raises
``NotImplementedError`` when a real codec is requested — the Spark
plumbing (schema, batching, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, format string"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-fixture media: the UTF-8 bytes of the text stand in for an
    encoded image payload (real pipelines read binary parquet/blob
    columns directly)."""
    return docs.select("doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload"))


def fake_image_meta(n: int) -> tuple[int, int, str]:
    """Deterministic stand-in for a real header parse."""
    return (n % 640, (n // 640) % 480, ("png", "jpeg", "webp")[n % 3])


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers carrying dimensions (C4=DHT, C8=JPG
# extension, CC=DAC are NOT frames)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """Real codec for the metadata pass: parse (width, height, format)
    straight from container headers — PNG IHDR, GIF logical screen
    descriptor, JPEG SOF segment scan, BMP info header. Pure Python,
    no imaging libs: at corpus scale the metadata pass must not decode
    pixels anyway (that's what makes it ~free vs a full decode), so
    header parsing IS the production shape, not a stand-in. Returns
    None for unrecognized/truncated payloads (callers surface that as
    format='unknown' rather than failing the batch)."""
    b = payload
    if b[:8] == PNG_SIG and len(b) >= 24:
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
            "png",
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            "gif",
        )
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                return None  # corrupt segment stream
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in _JPEG_SOF:
                return (
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    "jpeg",
                )
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
                continue
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return None
    if b[:2] == b"BM" and len(b) >= 26:
        return (
            int.from_bytes(b[18:22], "little"),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
            "bmp",
        )
    return None


def decode_image(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode image metadata (width, height, format) from the payload.

    Codecs:
    - ``'fake'``: metadata derived deterministically from payload
      length — the oracle-checkable fixture codec (testdata payloads
      are text bytes, not images);
    - ``'headers'``: the real container-header parser
      (``parse_image_header``) — PNG/GIF/JPEG/BMP; unrecognized
      payloads yield ``format='unknown'`` with NULL dimensions, the
      quarantine-friendly shape;
    - any callable ``(bytes) -> (w, h, fmt) | None``: bring-your-own
      decoder (e.g. a PIL-backed full decode once the lib exists);
    - anything else raises ``NotImplementedError`` (full pixel decode
      needs imaging libs this runtime doesn't ship).

    The surrounding plan — Arrow batching, schema, bounded batch
    memory — is identical for every codec.
    """
    if codec == "fake":
        parse = None
    elif codec == "headers":
        parse = parse_image_header
    elif callable(codec):
        parse = codec
    else:
        raise NotImplementedError(
            f"codec {codec!r}: full pixel decode needs imaging libraries not "
            "available in this runtime; use 'headers', or plug a callable "
            "(bytes) -> (width, height, format)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            n_bytes = batch["payload"].map(len)
            if parse is None:
                meta = n_bytes.map(fake_image_meta)
            else:
                meta = batch["payload"].map(lambda p: parse(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": meta.map(lambda m: m[0] if m else None).astype("Int32"),
                    "height": meta.map(lambda m: m[1] if m else None).astype("Int32"),
                    "format": meta.map(lambda m: m[2] if m else "unknown"),
                }
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, width int, height int, new_width int, new_height int"

FEATURE_DIM = 64
FEATURE_SCHEMA = "doc_id bigint, feat_dim int, feat_sumsq bigint"


def resize_image(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize-to-fit metadata: scale (width, height) so the longer side
    equals ``max_side``, aspect preserved (integer floor math — the
    deterministic stand-in for a real resampling kernel; the batch
    plumbing and the n:1 row contract are the real part)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            n_bytes = batch["payload"].map(len)
            meta = n_bytes.map(fake_image_meta)
            w = meta.map(lambda m: max(m[0], 1)).astype("int64")
            h = meta.map(lambda m: max(m[1], 1)).astype("int64")
            long_side = pd.concat([w, h], axis=1).max(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_width": (w * max_side // long_side).astype("int32"),
                    "new_height": (h * max_side // long_side).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction: payload → fixed-dim vector (fake:
    feat[i] = (n_bytes·(i+1)) mod 97; a real model would run here,
    batched). Emits the integer sum of squares instead of the raw
    vector so the result is exactly comparable across engines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            n_bytes = batch["payload"].map(len).astype("int64")
            sumsq = n_bytes.map(
                lambda n: sum(((n * (i + 1)) % 97) ** 2 for i in range(dim))
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "feat_dim": pd.Series([dim] * len(batch), dtype="int32"),
                    "feat_sumsq": sumsq,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling shape: one input row explodes into ≤max_frames
    output rows (here: fixed-stride byte windows standing in for video
    frames). Demonstrates the n:m row contract of mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                data = bytes(payload)
                for idx in range(min(max_frames, max(len(data) // every_n_bytes, 0))):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(data[idx * every_n_bytes : (idx + 1) * every_n_bytes])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
