"""C11 — image format + dimension sniffing, stdlib-only (no PIL here).

The reference sizes favicons with PIL and detects SVG with zimscraperlib's
``format_for`` (converter.py:785-802). PIL is unavailable, but the DIMENSION
step doesn't need a decoder: every container this pipeline meets carries its
pixel size in a fixed header (PNG IHDR, GIF logical screen descriptor, JPEG
SOF segment, ICO directory entries, SVG width/height/viewBox attributes).
This kernel parses those directly, so icon ranking runs on REAL dimensions —
only pixel RE-ENCODING (convert/resize/optimize) stays stubbed
(operators/favicon.py documents that seam).
"""

from __future__ import annotations

import re
import struct

_SVG_TAG_RE = re.compile(rb"<svg\b[^>]*>", re.IGNORECASE | re.DOTALL)
_SVG_ATTR_RE = re.compile(
    r"""\b(width|height)\s*=\s*["']?\s*(\d+(?:\.\d+)?)\s*(?:px)?\s*["']?""",
    re.IGNORECASE,
)
_SVG_VIEWBOX_RE = re.compile(
    r"""\bviewBox\s*=\s*["']\s*[\d.+-]+[\s,]+[\d.+-]+[\s,]+([\d.]+)[\s,]+([\d.]+)""",
    re.IGNORECASE,
)


def make_png(size: int = 48) -> bytes:
    """A valid fully-transparent RGBA PNG of ``size``² — stdlib zlib/struct
    only. Doubles as the illustration fallback and as fixture bytes whose
    dimensions this module must sniff back."""
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", size, size, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * (size * 4) for _ in range(size))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def sniff_format(data: bytes | None) -> str | None:
    """PNG / GIF / JPEG / ICO / SVG / None (magic bytes, like
    zimscraperlib's format_for(from_suffix=False))."""
    if not data:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "PNG"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "GIF"
    if data[:2] == b"\xff\xd8":
        return "JPEG"
    if data[:4] == b"\x00\x00\x01\x00":
        return "ICO"
    head = data[:1024].lstrip()
    if head.startswith(b"<?xml") or head.startswith(b"<svg") or _SVG_TAG_RE.search(
        data[:2048]
    ):
        return "SVG"
    return None


def _png_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) < 24 or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return (w, h)


def _gif_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) < 10:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return (w, h)


def _jpeg_dims(data: bytes) -> tuple[int, int] | None:
    # walk segments until a SOF marker (C0-CF minus C4/C8/CC)
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return (w, h)
        i += 2 + seg_len
    return None


def _ico_dims(data: bytes) -> tuple[int, int] | None:
    """Largest image in the directory (0 byte means 256)."""
    if len(data) < 6:
        return None
    count = struct.unpack("<H", data[4:6])[0]
    best = None
    for k in range(count):
        off = 6 + 16 * k
        if off + 2 > len(data):
            break
        w = data[off] or 256
        h = data[off + 1] or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h)
    return best


def _svg_dims(data: bytes) -> tuple[int, int] | None:
    m = _SVG_TAG_RE.search(data[:4096])
    if not m:
        return None
    tag = m.group(0).decode("utf-8", errors="replace")
    dims = {k.lower(): float(v) for k, v in _SVG_ATTR_RE.findall(tag)}
    if "width" in dims and "height" in dims:
        return (int(dims["width"]), int(dims["height"]))
    vb = _SVG_VIEWBOX_RE.search(tag)
    if vb:
        return (int(float(vb.group(1))), int(float(vb.group(2))))
    return None


def image_dims(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """→ (format, width, height); Nones when unparseable — callers treat
    that as 'not a usable icon', the reference's failed-PIL-open path."""
    fmt = sniff_format(data)
    if fmt is None or data is None:
        return (None, None, None)
    dims = {
        "PNG": _png_dims,
        "GIF": _gif_dims,
        "JPEG": _jpeg_dims,
        "ICO": _ico_dims,
        "SVG": _svg_dims,
    }[fmt](data)
    if dims is None:
        return (fmt, None, None)
    return (fmt, dims[0], dims[1])
