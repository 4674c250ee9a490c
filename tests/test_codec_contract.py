"""Golden-bytes contract for the real-codec decode interface.

Hand-built minimal PNG/GIF/JPEG/BMP payloads with known dimensions run
through the SAME Arrow/mapInPandas path production uses — pinning that
a real decoder plugged into ``decode_image`` sees raw bytes and its
(w, h, fmt) lands in the typed schema, with unknown payloads degrading
to a quarantine-friendly row instead of failing the batch.
"""

from __future__ import annotations

import pytest

from etl_job_spark.operators import multimodal
from etl_job_spark.operators.multimodal import parse_image_header


def _png(w: int, h: int) -> bytes:
    return (
        multimodal.PNG_SIG
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + b"\x00" * 4  # crc (not validated by header parse)
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _bmp(w: int, h: int) -> bytes:
    header = b"BM" + b"\x00" * 16
    return header + w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\x00" * 4


GOLDEN = [
    (1, _png(640, 480), (640, 480, "png")),
    (2, _gif(320, 200), (320, 200, "gif")),
    (3, _jpeg(1920, 1080), (1920, 1080, "jpeg")),
    (4, _bmp(256, 64), (256, 64, "bmp")),
]


@pytest.mark.parametrize("_id,payload,expected", GOLDEN)
def test_parse_image_header_golden(_id, payload, expected):
    assert parse_image_header(payload) == expected


def test_parse_image_header_rejects_garbage_and_truncation():
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(multimodal.PNG_SIG + b"\x00\x00") is None  # truncated
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None  # JPEG with no SOF
    # BMP with negative height (top-down rows) still reports magnitude
    neg = b"BM" + b"\x00" * 16 + (8).to_bytes(4, "little") + (-8).to_bytes(4, "little", signed=True) + b"\x00" * 4
    assert parse_image_header(neg) == (8, 8, "bmp")


def test_decode_image_headers_codec_through_spark(spark):
    media = spark.createDataFrame(
        [(i, p) for i, p, _ in GOLDEN] + [(99, b"garbage-bytes")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in multimodal.decode_image(media, codec="headers").collect()}
    for i, payload, (w, h, fmt) in GOLDEN:
        assert (got[i].width, got[i].height, got[i].format) == (w, h, fmt)
        assert got[i].n_bytes == len(payload)
    # unknown payloads degrade to a quarantine-friendly row, not a crash
    assert got[99].format == "unknown"
    assert got[99].width is None and got[99].height is None


def test_decode_image_custom_callable_codec(spark):
    """Bring-your-own decoder: the contract a PIL-backed codec plugs into."""
    def codec(b: bytes):
        return (len(b), 7, "custom") if b.startswith(b"X") else None

    media = spark.createDataFrame(
        [(1, b"XYZ"), (2, b"nope")], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in multimodal.decode_image(media, codec=codec).collect()}
    assert (got[1].width, got[1].height, got[1].format) == (3, 7, "custom")
    assert got[2].format == "unknown"


def test_unavailable_codec_raises():
    with pytest.raises(NotImplementedError, match="imaging libraries"):
        multimodal.decode_image(None, codec="pil-full-decode")
