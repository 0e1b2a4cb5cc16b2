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


def test_tile_encode_jpeg_path():
    """RGB/alpha split + re-interleave (src/processor.rs:498-513,211-216)."""
    img = rng.randint(0, 256, (16, 16, 4)).astype(np.uint8)
    data, alpha = codecs.encode_tile(img, "jpeg", 85)
    dec = codecs.decode_tile(data, alpha, "jpeg")
    assert (dec[:, :, 3] == img[:, :, 3]).all()
    assert np.abs(dec[:, :, :3].astype(int) - img[:, :, :3].astype(int)).max() <= 3


def test_tile_encode_png_path():
    img = rng.randint(0, 256, (16, 16, 2)).astype(np.uint8)
    data, alpha = codecs.encode_tile(img, "png")
    assert alpha is None
    assert (codecs.decode_tile(data, None, "png") == img).all()
