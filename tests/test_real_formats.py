"""Spec-conformance pins for the real PNG/JPEG header kernels.

The oracle gate proves the JVM-built fixtures round-trip; these pin
the parser against INDEPENDENTLY-built reference bytes (pure Python
struct/zlib — a different code path from the hex-string builders) and
the negative space the gate can't see: corrupted CRCs, truncation,
foreign segments, non-PNG bytes.
"""

from __future__ import annotations

import struct
import zlib

from cs422pp_mapreduce_spark.operators.multimodal import (
    decode_jpeg,
    decode_png,
    synth_jpeg,
    synth_png,
)


def _ref_png(w: int, h: int, ctype: int = 2) -> bytes:
    """Reference PNG built the plain-Python way (struct + zlib.crc32)."""
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = b"IDAT" + b"\x78\x9c\x01"
    out = b"\x89PNG\r\n\x1a\n"
    for chunk in (ihdr, idat, b"IEND"):
        out += struct.pack(">I", len(chunk) - 4) + chunk
        out += struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    return out


def _ref_jpeg(w: int, h: int, ncomp: int = 3, extra_segments=()) -> bytes:
    """Reference JPEG: SOI + optional foreign segments + SOF0 + EOI."""
    out = b"\xff\xd8"
    for marker, payload in extra_segments:
        out += bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(1, ncomp + 1):
        sof += bytes([i, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    return out + b"\xff\xd9"


def test_decode_png_reference_bytes():
    m = decode_png(_ref_png(640, 480, ctype=6))
    assert m == {
        "width": 640,
        "height": 480,
        "bit_depth": 8,
        "color_type": 6,
        "channels": 4,
        "crc_ok": True,
    }


def test_decode_png_detects_corrupt_crc():
    blob = bytearray(_ref_png(100, 50))
    blob[30] ^= 0xFF  # flip a byte inside the IHDR CRC field
    m = decode_png(bytes(blob))
    assert m is not None and m["crc_ok"] is False


def test_decode_png_rejects_garbage_and_truncation():
    assert decode_png(None) is None
    assert decode_png(b"\x89PNG\r\n\x1a\n") is None  # sig only
    assert decode_png(b"GIF89a" + b"\x00" * 40) is None
    ok = _ref_png(10, 10)
    assert decode_png(ok[:20]) is None


def test_decode_jpeg_walks_foreign_segments():
    """The marker walk must skip segments it doesn't know (DQT, COM,
    APPn) and still find SOF0 — the general T.81 grammar, not just the
    fixture layout."""
    blob = _ref_jpeg(
        1920,
        1080,
        ncomp=3,
        extra_segments=[
            (0xE0, b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00"),
            (0xFE, b"a comment"),          # COM
            (0xDB, bytes(65)),             # DQT
        ],
    )
    m = decode_jpeg(blob)
    assert m == {
        "width": 1920,
        "height": 1080,
        "precision": 8,
        "n_components": 3,
    }


def test_decode_jpeg_rejects_no_sof_and_garbage():
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no SOF
    assert decode_jpeg(b"PK\x03\x04" + bytes(20)) is None


def test_jvm_built_fixtures_parse_with_python_reference(spark, sf_dir):
    """Ten JVM-built blobs of each format parse with the SAME pure-
    Python decoders and agree with the doc_id arithmetic — pins the
    hex-string builders against an independent implementation."""
    from cs422pp_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    for r in synth_png(docs).collect():
        m = decode_png(bytes(r["blob"]))
        did = r["media_id"]
        assert m is not None and m["crc_ok"] is True
        assert m["width"] == 16 + did % 1009
        assert m["height"] == 16 + (did * 13) % 1009
    for r in synth_jpeg(docs).collect():
        m = decode_jpeg(bytes(r["blob"]))
        did = r["media_id"]
        assert m is not None
        assert m["width"] == 32 + (did * 5) % 2000
        assert m["height"] == 32 + (did * 3) % 1500
        assert m["n_components"] == 1 + (did % 2) * 2
