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
