"""Dependency-free PNG bar-chart rendering for EDA artifacts.

The reference's EDA emits matplotlib charts embedded as base64 PNG in its
HTML report (``eda.py:46-117``).  This image bundles no plotting libraries,
but PNG itself needs only ``zlib`` + ``struct``: an RGB raster, one filter
byte per scanline, three chunks with CRCs.  The charts here are simple
horizontal bar rasters — axis labels and values render as adjacent HTML (so
the text stays selectable and the encoder stays font-free).

Driver-side only, bounded input (top-k / histogram aggregates), never on the
executor hot path.
"""

from __future__ import annotations

import base64
import struct
import zlib

RGB = tuple[int, int, int]

BAR = (72, 120, 168)  # matches the SVG renderer's #4878a8
BACKGROUND = (255, 255, 255)
GRID = (225, 228, 232)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    raw = tag + payload
    return struct.pack(">I", len(payload)) + raw + struct.pack(">I", zlib.crc32(raw))


def png_bytes(raster: list[list[RGB]]) -> bytes:
    """Encode an RGB raster (rows of (r,g,b)) as a PNG byte string."""
    height = len(raster)
    width = len(raster[0]) if height else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    scanlines = b"".join(
        b"\x00" + bytes(c for px in row for c in px) for row in raster
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, 6))
        + _chunk(b"IEND", b"")
    )


def bar_chart_png(
    values: list[float],
    width: int = 300,
    bar_h: int = 14,
    gap: int = 4,
    color: RGB = BAR,
) -> bytes:
    """Horizontal bar chart raster: one bar per value, scaled to the max;
    light quarter-grid lines for readability."""
    if not values:
        values = [0.0]
    peak = max(values) or 1.0
    height = len(values) * (bar_h + gap)
    raster = [[BACKGROUND] * width for _ in range(height)]
    for gx in (width // 4, width // 2, (3 * width) // 4, width - 1):
        for y in range(height):
            raster[y][gx] = GRID
    for i, v in enumerate(values):
        w = max(1, int((width - 2) * max(0.0, v) / peak))
        top = i * (bar_h + gap)
        for y in range(top, top + bar_h):
            row = raster[y]
            for x in range(w):
                row[x] = color
    return png_bytes(raster)


def bar_chart_data_uri(values: list[float], **kw) -> str:
    """``data:image/png;base64,...`` URI for direct ``<img src=...>`` embedding."""
    return "data:image/png;base64," + base64.b64encode(
        bar_chart_png(values, **kw)
    ).decode("ascii")


REFLINE = (200, 60, 60)  # the reference's red dashed guide lines


def scatter_png(
    xs: list[float],
    ys: list[float],
    width: int = 360,
    height: int = 240,
    diagonal: bool = False,
    zero_line: bool = False,
    color: RGB = BAR,
) -> bytes:
    """Scatter raster for the model-diagnostic plots (reference
    ``model_evaluate.py:125-144`` draws these with matplotlib): points
    quantized to the pixel grid against the data min/max, each as a 2x2
    block; ``diagonal`` adds the y=x guide over the shared axis range
    (pred-vs-actual), ``zero_line`` a horizontal y=0 guide (residuals).
    Driver-side only, callers pass BOUNDED samples."""
    pts = [(float(x), float(y)) for x, y in zip(xs, ys)]
    if not pts:
        pts = [(0.0, 0.0)]
    x_lo, x_hi = min(p[0] for p in pts), max(p[0] for p in pts)
    y_lo, y_hi = min(p[1] for p in pts), max(p[1] for p in pts)
    if diagonal:  # shared range so y=x is the true identity line
        x_lo = y_lo = min(x_lo, y_lo)
        x_hi = y_hi = max(x_hi, y_hi)
    if zero_line:
        y_lo, y_hi = min(y_lo, 0.0), max(y_hi, 0.0)
    x_span = (x_hi - x_lo) or 1.0
    y_span = (y_hi - y_lo) or 1.0
    raster = [[BACKGROUND] * width for _ in range(height)]
    for gx in (width // 4, width // 2, (3 * width) // 4):
        for y in range(height):
            raster[y][gx] = GRID

    def _px(x: float, y: float) -> tuple[int, int]:
        cx = int((x - x_lo) / x_span * (width - 2))
        cy = (height - 2) - int((y - y_lo) / y_span * (height - 2))  # row 0 = top
        return cx, cy

    if diagonal:
        for x in range(0, width - 1, 3):  # dashed y=x
            v = x_lo + x / (width - 2) * x_span
            cx, cy = _px(v, v)
            raster[min(cy, height - 1)][min(cx, width - 1)] = REFLINE
    if zero_line:
        _, cy = _px(x_lo, 0.0)
        for x in range(0, width, 3):  # dashed y=0
            raster[min(cy, height - 1)][x] = REFLINE
    for x, y in pts:
        cx, cy = _px(x, y)
        for dy in (0, 1):
            for dx in (0, 1):
                raster[min(cy + dy, height - 1)][min(cx + dx, width - 1)] = color
    return png_bytes(raster)
