"""C11 image sniffing — stdlib header parsing for PNG/GIF/JPEG/ICO/SVG."""

import struct

from warc2zim_spark.kernels.imagemeta import image_dims, make_png, sniff_format


class TestDims:
    def test_png_roundtrip(self):
        for sz in (1, 16, 48, 96, 256):
            assert image_dims(make_png(sz)) == ("PNG", sz, sz)

    def test_gif(self):
        gif = b"GIF89a" + struct.pack("<HH", 32, 20) + b"\x00" * 10
        assert image_dims(gif) == ("GIF", 32, 20)

    def test_jpeg_sof0(self):
        jpg = (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 20, 30) + b"\x03" + b"\x00" * 10
        )
        assert image_dims(jpg) == ("JPEG", 30, 20)

    def test_ico_picks_largest_entry(self):
        ico = (
            struct.pack("<HHH", 0, 1, 2)
            + bytes([16, 16, 0, 0]) + b"\x00" * 12
            + bytes([48, 48, 0, 0]) + b"\x00" * 12
        )
        assert image_dims(ico) == ("ICO", 48, 48)

    def test_ico_zero_means_256(self):
        ico = struct.pack("<HHH", 0, 1, 1) + bytes([0, 0, 0, 0]) + b"\x00" * 12
        assert image_dims(ico) == ("ICO", 256, 256)

    def test_svg_attrs(self):
        svg = b'<svg xmlns="http://www.w3.org/2000/svg" width="64" height="64"/>'
        assert image_dims(svg) == ("SVG", 64, 64)

    def test_svg_viewbox(self):
        svg = b'<?xml version="1.0"?><svg viewBox="0 0 100 50"></svg>'
        assert image_dims(svg) == ("SVG", 100, 50)

    def test_garbage(self):
        assert image_dims(b"notanimage") == (None, None, None)
        assert image_dims(None) == (None, None, None)
        assert image_dims(b"") == (None, None, None)

    def test_truncated_png(self):
        assert image_dims(make_png(48)[:12]) == ("PNG", None, None)

    def test_sniff_only(self):
        assert sniff_format(make_png(4)) == "PNG"
        assert sniff_format(b"\xff\xd8rest") == "JPEG"
        assert sniff_format(b"random") is None
