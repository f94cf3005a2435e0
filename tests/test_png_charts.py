"""The stdlib PNG bar-chart encoder: output must be a structurally valid PNG
whose pixels actually encode the data (decoded with zlib/struct only)."""

from __future__ import annotations

import struct
import zlib

from healthcare_data_pipeline_spark.operators.png import (
    BACKGROUND,
    BAR,
    bar_chart_data_uri,
    bar_chart_png,
    png_bytes,
)


def _decode(png: bytes):
    """(width, height, rows of (r,g,b)) via stdlib-only parsing."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        payload = png[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + payload), tag
        chunks.setdefault(tag, b"")
        chunks[tag] += payload
        pos += 12 + length
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert (depth, ctype) == (8, 2)  # 8-bit RGB
    raw = zlib.decompress(chunks[b"IDAT"])
    stride = 1 + 3 * w
    rows = []
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        assert line[0] == 0  # filter: None
        rows.append([tuple(line[1 + 3 * x : 4 + 3 * x]) for x in range(w)])
    return w, h, rows


def test_png_roundtrip_raster():
    raster = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (1, 2, 3)]]
    w, h, rows = _decode(png_bytes(raster))
    assert (w, h) == (2, 2) and rows == raster


def test_bar_chart_pixels_scale_with_values():
    values = [100.0, 50.0, 0.0]
    w, h, rows = _decode(bar_chart_png(values, width=100, bar_h=10, gap=2))
    assert (w, h) == (100, 36)

    def bar_width(row_idx):
        return sum(1 for px in rows[row_idx] if px == BAR)

    full, half, zero = bar_width(0), bar_width(12), bar_width(24)
    assert full > 90 and abs(half - full / 2) <= 2 and zero <= 1
    # gap rows are background (modulo gridline pixels)
    assert all(px != BAR for px in rows[10])
    assert rows[10].count(BACKGROUND) > 90


def test_data_uri_shape():
    uri = bar_chart_data_uri([1.0, 2.0])
    assert uri.startswith("data:image/png;base64,")
    import base64

    w, h, _ = _decode(base64.b64decode(uri.split(",", 1)[1]))
    assert w > 0 and h > 0
