"""Codec roundtrips + elision predicates (SURVEY §5.2, FIXTURES §4)."""

import numpy as np

from freemap_tiler_spark.functions import codecs

rng = np.random.RandomState(42)


def test_png_roundtrip_rgba():
    img = rng.randint(0, 256, (16, 16, 4)).astype(np.uint8)
    assert (codecs.png_decode(codecs.png_encode(img)) == img).all()


def test_png_roundtrip_ga():
    img = rng.randint(0, 256, (8, 8, 2)).astype(np.uint8)
    assert (codecs.png_decode(codecs.png_encode(img)) == img).all()


def test_png_signature():
    data = codecs.png_encode(np.zeros((4, 4, 2), np.uint8))
    assert data[:8] == codecs.PNG_SIG and data[12:16] == b"IHDR"


def test_alpha_opaque_elision():
    """Fully-opaque alpha encodes to None (src/processor.rs:505-517)."""
    assert codecs.alpha_encode(np.full((8, 8), 255, np.uint8)) is None


def test_alpha_roundtrip_and_absent():
    a = rng.randint(0, 255, (8, 8)).astype(np.uint8)
    enc = codecs.alpha_encode(a)
    assert (codecs.alpha_decode(enc, 64) == a.ravel()).all()
    # absent sidecar => constant 255 (src/processor.rs:205-209)
    assert (codecs.alpha_decode(None, 10) == 255).all()


def test_qdct_pixel_close():
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    dec = codecs.qdct_decode(codecs.qdct_encode(img, 85))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_tile_encode_qdct_path():
    """RGB/alpha split + re-interleave (src/processor.rs:498-513,211-216)
    through the deterministic QDCT stand-in (tight per-pixel bound)."""
    img = rng.randint(0, 256, (16, 16, 4)).astype(np.uint8)
    data, alpha = codecs.encode_tile(img, "qdct", 85)
    dec = codecs.decode_tile(data, alpha, "qdct")
    assert (dec[:, :, 3] == img[:, :, 3]).all()
    assert np.abs(dec[:, :, :3].astype(int) - img[:, :, :3].astype(int)).max() <= 3


def test_tile_encode_png_path():
    img = rng.randint(0, 256, (16, 16, 2)).astype(np.uint8)
    data, alpha = codecs.encode_tile(img, "png")
    assert alpha is None
    assert (codecs.decode_tile(data, None, "png") == img).all()


def test_real_jpeg_structure_and_quality():
    """fmt='jpeg' now emits REAL baseline JFIF bytes (SOI/APP0-JFIF/SOF0)
    that any standard decoder reads, and decodes pixel-close."""
    import numpy as np

    from freemap_tiler_spark.functions import jpeg

    x = np.linspace(0, 255, 32)
    grad = np.clip(np.rint(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    rgba = np.stack([grad, grad[::-1], grad.T, np.full_like(grad, 255)], axis=2)
    data, alpha = codecs.encode_tile(rgba, "jpeg", 85)
    assert data[:2] == b"\xff\xd8" and data[6:10] == b"JFIF"
    assert alpha is None  # fully opaque -> sidecar elided
    dec = codecs.decode_tile(data, alpha, "jpeg")
    err = np.abs(dec[:, :, :3].astype(int) - rgba[:, :, :3].astype(int))
    assert err.mean() < 2.0 and err.max() <= 12
    assert (dec[:, :, 3] == 255).all()
    # gray+alpha (the pyramid's native bands)
    ga = np.stack([grad, (grad > 64).astype(np.uint8) * 255], axis=2)
    data, alpha = codecs.encode_tile(ga, "jpeg", 85)
    assert data[:2] == b"\xff\xd8" and alpha is not None
    dec = codecs.decode_tile(data, alpha, "jpeg")
    assert (dec[:, :, 1] == ga[:, :, 1]).all()  # alpha sidecar lossless
    assert np.abs(dec[:, :, 0].astype(int) - grad.astype(int)).mean() < 2.0


def test_zstd_frame_layout_golden():
    """Pin the RFC 8878 frame layout: magic, single-segment descriptor with
    4-byte FCS, then Raw/RLE blocks with 3-byte LE headers."""
    data = b"\x07" * 40 + bytes(range(10)) + b"\x00" * 100
    frame = codecs.zstd_frame_encode(data, min_rle=16)
    assert frame[:4] == codecs.ZSTD_MAGIC
    assert frame[4] == 0xA0  # FCS_flag=2 | Single_Segment
    import struct as _s
    assert _s.unpack("<I", frame[5:9])[0] == len(data)
    # block 1: RLE of 40 x 0x07
    bh = int.from_bytes(frame[9:12], "little")
    assert (bh & 1, (bh >> 1) & 3, bh >> 3) == (0, 1, 40)
    assert frame[12] == 0x07
    # block 2: raw 10 bytes
    bh = int.from_bytes(frame[13:16], "little")
    assert (bh & 1, (bh >> 1) & 3, bh >> 3) == (0, 0, 10)
    assert frame[16:26] == bytes(range(10))
    # block 3: RLE of 100 x 0x00, last
    bh = int.from_bytes(frame[26:29], "little")
    assert (bh & 1, (bh >> 1) & 3, bh >> 3) == (1, 1, 100)
    assert frame[29] == 0 and len(frame) == 30
    assert codecs.zstd_frame_decode(frame) == data


def test_zstd_frame_roundtrip_shapes():
    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"\x00" * (300 * 1024),                    # multi-block RLE chunking
        rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes(),  # raw-heavy
        (b"\xff" * 50 + b"\x00" * 50) * 1000,      # alternating runs
        b"ab" * 7,                                  # short, below min_rle
    ]
    for data in cases:
        frame = codecs.zstd_frame_encode(data)
        assert codecs.zstd_frame_decode(frame) == data
    # real-world check if a zstd binding happens to exist
    try:
        import zstandard  # noqa
        d = zstandard.ZstdDecompressor()
        for data in cases:
            assert d.decompress(codecs.zstd_frame_encode(data)) == data
    except ImportError:
        pass


def test_alpha_sidecar_zstd_and_legacy_zlib():
    """Current sidecars are zstd frames; round-1/2 zlib sidecars decode."""
    import zlib as _z

    a = (np.arange(256) % 3 * 100).astype(np.uint8)
    enc = codecs.alpha_encode(a.reshape(16, 16))
    assert enc[:4] == codecs.ZSTD_MAGIC
    assert (codecs.alpha_decode(enc, 256) == a).all()
    legacy = codecs.ALPHA_MAGIC + _z.compress(a.tobytes(), 6)
    assert (codecs.alpha_decode(legacy, 256) == a).all()


def test_alpha_rle_compresses_hole_planes():
    """Checkerboard-hole alpha planes (the real tile shape) shrink: RLE
    blocks must engage on the 0/255 runs."""
    a = np.full((256, 256), 255, np.uint8)
    a[0:64, :] = 0
    enc = codecs.alpha_encode(a)
    assert len(enc) < len(a.tobytes()) // 50
