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


def test_zstd_compressed_block_golden_fixtures():
    """Read-side interchange (VERDICT r3 'Next round' #4): frames written
    by the real zstd CLI (levels 3/12/19, checksummed + multi-block)
    contain FSE/Huffman-compressed blocks; they must decode byte-exact.
    Fixtures were generated once with the system CLI and checked in."""
    import glob
    import hashlib
    import os

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    frames = sorted(glob.glob(os.path.join(fixdir, "zstd_*.zst")))
    assert len(frames) >= 3
    for path in frames:
        want_sha, want_len = open(path[:-4] + ".sha").read().split()
        dec = codecs.zstd_frame_decode(open(path, "rb").read())
        assert len(dec) == int(want_len)
        assert hashlib.sha256(dec).hexdigest() == want_sha


def test_zstd_compressed_block_cli_fuzz():
    """Decoder vs the system zstd CLI across levels and payload shapes
    (skipped when no CLI is installed; the golden test always runs)."""
    import random
    import shutil
    import subprocess

    if shutil.which("zstd") is None:
        import pytest

        pytest.skip("no system zstd CLI")
    for seed in range(6):
        r = random.Random(seed)
        kind = seed % 3
        if kind == 0:
            data = bytes(r.choice(b"abcd") for _ in range(r.randrange(1, 20000)))
        elif kind == 1:
            data = b"".join(bytes([r.randrange(256)]) * r.randrange(1, 2000)
                            for _ in range(r.randrange(1, 40)))
        else:
            base = bytes(r.randrange(256) for _ in range(r.randrange(64, 256)))
            data = base * r.randrange(2, 300)
        for lvl in ("-1", "-9", "-19"):
            enc = subprocess.run(["zstd", lvl, "-c"], input=data,
                                 capture_output=True).stdout
            assert codecs.zstd_frame_decode(enc) == data


def test_alpha_decode_reads_cli_compressed_sidecar():
    """A sidecar produced by an external zstd encoder (compressed blocks)
    feeds the same resume path as our Raw/RLE frames."""
    import shutil
    import subprocess

    import numpy as np

    if shutil.which("zstd") is None:
        import pytest

        pytest.skip("no system zstd CLI")
    rng = np.random.default_rng(3)
    alpha = np.repeat(rng.choice([0, 255], 64).astype(np.uint8), 64)
    enc = subprocess.run(["zstd", "-19", "-c"], input=alpha.tobytes(),
                         capture_output=True).stdout
    out = codecs.alpha_decode(enc, alpha.size)
    assert np.array_equal(out, alpha)


def _load_rgb_fixture(name):
    import os
    import struct

    import numpy as np

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    jpg = open(os.path.join(fixdir, name + ".jpg"), "rb").read()
    raw = open(os.path.join(fixdir, name + ".rgb"), "rb").read()
    h, w = struct.unpack(">HH", raw[:4])
    ref = np.frombuffer(raw[4:], np.uint8).reshape(h, w, 3)
    return jpg, ref


def test_jpeg_subsampled_decode_golden():
    """Read-side interchange (VERDICT r3 'Next round' #5): baseline 4:2:0
    and 4:2:2 JPEGs written by an external libjpeg-based toolchain (Java
    ImageIO; fixtures checked in with that toolchain's own decode as the
    reference pixels) must decode within a few counts — the triangle
    chroma upsampler mirrors libjpeg/image-crate 'fancy' upsampling."""
    import numpy as np

    from freemap_tiler_spark.functions import jpeg

    for name in ("jpeg_sub420", "jpeg_sub422"):
        jpg, ref = _load_rgb_fixture(name)
        got = jpeg.decode(jpg)
        assert got.shape == ref.shape
        d = np.abs(got.astype(int) - ref.astype(int))
        assert d.max() <= 4, f"{name}: max diff {d.max()}"
        assert d.mean() < 1.0, f"{name}: mean diff {d.mean():.3f}"


def test_jpeg_restart_markers():
    """DRI/RSTn handling: a grayscale JPEG with restart_interval=1 (built
    block-wise from this module's own tables, predictors reset + RST
    markers between MCUs) decodes identically to the marker-free bytes."""
    import struct

    import numpy as np

    from freemap_tiler_spark.functions import jpeg

    rng = np.random.default_rng(11)
    img = (np.linspace(0, 255, 16 * 32).reshape(16, 32)
           + rng.integers(0, 10, (16, 32))).astype(np.uint8)
    plain = jpeg.encode(img, quality=90)
    ref = jpeg.decode(plain)

    # rebuild the same scan with DRI=1 and RSTn between every MCU
    ql, _ = jpeg._quality_tables(90)
    q = jpeg._fdct_quant(jpeg._blockify(img), ql)
    head, _, _ = plain.partition(b"\xff\xda")
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    out = bytearray(head + dri + sos)
    for m in range(q.shape[0]):
        bw = jpeg._BitWriter()
        jpeg._encode_component(bw, q[m:m + 1], jpeg._ENC_DC_L, jpeg._ENC_AC_L, 0)
        bw.flush()
        out += bw.buf
        if m < q.shape[0] - 1:
            out += bytes([0xFF, 0xD0 + (m % 8)])
    out += b"\xff\xd9"
    got = jpeg.decode(bytes(out))
    assert np.array_equal(got, ref)


def test_decode_tile_external_store_resume():
    """Resume from a store an EXTERNAL toolchain wrote: subsampled JPEG
    color + CLI-compressed zstd alpha sidecar through decode_tile —
    the exact shape the reference's processor reads back
    (src/processor.rs:194-216)."""
    import os
    import shutil
    import subprocess

    import numpy as np

    jpg, ref = _load_rgb_fixture("jpeg_sub420")
    h, w, _ = ref.shape
    rng = np.random.default_rng(5)
    alpha = np.repeat(rng.choice([0, 255], h * w // 25 + 1).astype(np.uint8), 25)[: h * w]
    if shutil.which("zstd"):
        sidecar = subprocess.run(["zstd", "-19", "-c"], input=alpha.tobytes(),
                                 capture_output=True).stdout
    else:  # golden path still covers compressed blocks; this is belt+braces
        sidecar = codecs.zstd_frame_encode(alpha.tobytes())
    tile = codecs.decode_tile(jpg, sidecar, fmt="jpeg")
    assert tile.shape == (h, w, 4)
    assert np.abs(tile[:, :, :3].astype(int) - ref.astype(int)).max() <= 4
    assert np.array_equal(tile[:, :, 3].ravel(), alpha)


def test_png_adaptive_filters_smaller_and_lossless():
    """FilterType::Adaptive parity (src/processor.rs:543-547): per-scanline
    MSAD filter choice must roundtrip losslessly, use non-zero filters on
    smooth content, and never beat filter-0 on size by being wrong."""
    import numpy as np

    grad = np.dstack([
        np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8),
        np.full((64, 64), 255, np.uint8),
    ])
    e0 = codecs.png_encode(grad, adaptive=False)
    e1 = codecs.png_encode(grad)
    assert np.array_equal(codecs.png_decode(e1), grad)
    assert len(e1) < len(e0), "adaptive filters must shrink smooth tiles"
    # mixed content exercises several filter types in one image
    rng = np.random.default_rng(1)
    mixed = np.vstack([
        grad[:32], rng.integers(0, 255, (32, 64, 2), dtype=np.uint8)
    ])
    enc = codecs.png_encode(mixed)
    assert np.array_equal(codecs.png_decode(enc), mixed)
    raw_filters = set()
    import struct as _s
    import zlib as _z
    pos, idat = 8, b""
    while pos < len(enc):
        (ln,) = _s.unpack(">I", enc[pos:pos + 4])
        if enc[pos + 4:pos + 8] == b"IDAT":
            idat += enc[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    rows = np.frombuffer(_z.decompress(idat), np.uint8).reshape(64, 1 + 128)
    raw_filters = set(rows[:, 0].tolist())
    assert len(raw_filters) >= 2, f"expected mixed filters, got {raw_filters}"


def test_jpeg_420_encode_roundtrip_and_interchange():
    """Write-side 4:2:0 (the reference's jpeg-encoder crate default,
    src/processor.rs:528-539): our subsampled bytes decode pixel-close in
    our own decoder, come out smaller than 4:4:4, and — when a JDK is
    present — decode in Java ImageIO (libjpeg) within the same tolerance."""
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    from freemap_tiler_spark.functions import jpeg

    x = np.linspace(0, 255, 96)
    img = np.stack(np.meshgrid(x, x)[:2] + [np.add.outer(x, x) / 2], axis=2
                   ).astype(np.uint8)
    e444 = jpeg.encode(img, 85, subsampling="444")
    e420 = jpeg.encode(img, 85, subsampling="420")
    assert len(e420) < len(e444)
    for enc in (e420, jpeg.encode(img[:83, :91], 85, subsampling="420")):
        dec = jpeg.decode(enc)
        ref = img[: dec.shape[0], : dec.shape[1]]
        assert np.abs(dec.astype(int) - ref.astype(int)).max() <= 8

    if shutil.which("javac") and shutil.which("java"):
        import os
        import struct

        d = tempfile.mkdtemp()
        open(os.path.join(d, "our.jpg"), "wb").write(e420)
        open(os.path.join(d, "Dec.java"), "w").write(
            'import javax.imageio.ImageIO; import java.awt.image.BufferedImage;'
            'import java.io.*;\n'
            'public class Dec { public static void main(String[] a) throws Exception {\n'
            'BufferedImage b = ImageIO.read(new File(a[0]));\n'
            'DataOutputStream o = new DataOutputStream(new BufferedOutputStream('
            'new FileOutputStream(a[1])));\n'
            'o.writeShort(b.getHeight()); o.writeShort(b.getWidth());\n'
            'for (int y=0;y<b.getHeight();y++) for (int x=0;x<b.getWidth();x++){'
            'int v=b.getRGB(x,y);o.writeByte((v>>16)&255);o.writeByte((v>>8)&255);'
            'o.writeByte(v&255);} o.close(); }}\n')
        subprocess.run(["javac", "Dec.java"], cwd=d, check=True)
        subprocess.run(["java", "Dec", "our.jpg", "out.rgb"], cwd=d, check=True)
        raw = open(os.path.join(d, "out.rgb"), "rb").read()
        h, w = struct.unpack(">HH", raw[:4])
        ref = np.frombuffer(raw[4:], np.uint8).reshape(h, w, 3)
        assert (h, w) == img.shape[:2]
        assert np.abs(ref.astype(int) - img.astype(int)).max() <= 8


def test_encode_tile_png_filter_knob():
    """VERDICT r4 #10: the per-write png_filter knob — 'none' (filter-0
    scanlines, throughput path) and 'adaptive' (MSAD, size path) both
    roundtrip losslessly through the same decoder."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    fast, _ = codecs.encode_tile(img, "png", png_filter="none")
    small, _ = codecs.encode_tile(img, "png", png_filter="adaptive")
    assert (codecs.png_decode(fast) == img).all()
    assert (codecs.png_decode(small) == img).all()
    grad = np.tile(np.arange(64, dtype=np.uint8)[None, :, None], (64, 1, 2))
    g_fast, _ = codecs.encode_tile(grad, "png", png_filter="none")
    g_small, _ = codecs.encode_tile(grad, "png", png_filter="adaptive")
    assert (codecs.png_decode(g_fast) == grad).all()
    assert (codecs.png_decode(g_small) == grad).all()
    assert len(g_small) < len(g_fast)


def test_jpeg_progressive_decode_golden():
    """VERDICT r4 #8: progressive (SOF2) decode — spectral-selection +
    successive-approximation scans.  Fixtures written by Java ImageIO
    (MODE_DEFAULT = the standard libjpeg 10-scan script: interleaved DC
    first/refine + per-component AC first/refine, 4:2:0) with ImageIO's
    own decode as the reference pixels; same tolerance as the baseline
    subsampled fixtures.  84x100 exercises partial-MCU dims."""
    import numpy as np

    from freemap_tiler_spark.functions import jpeg

    jpg, ref = _load_rgb_fixture("jpeg_progressive")
    got = jpeg.decode(jpg)
    assert got.shape == ref.shape
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= 4, f"max diff {d.max()}"
    assert d.mean() < 1.0

    # grayscale: single-component scans all the way down
    import os
    import struct

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    jpg = open(os.path.join(fixdir, "jpeg_progressive_gray.jpg"), "rb").read()
    raw = open(os.path.join(fixdir, "jpeg_progressive_gray.rgb"), "rb").read()
    h, w = struct.unpack(">HH", raw[:4])
    ref = np.frombuffer(raw[4:], np.uint8).reshape(h, w)
    got = jpeg.decode(jpg)
    assert got.shape == (h, w)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2


def test_decode_tile_progressive_store_resume():
    """Resume from a store holding PROGRESSIVE JPEGs (an external writer
    may store SOF2 tiles): decode_tile must reassemble color + alpha the
    same way it does for baseline tiles."""
    import shutil
    import subprocess

    import numpy as np

    jpg, ref = _load_rgb_fixture("jpeg_progressive")
    h, w, _ = ref.shape
    rng = np.random.default_rng(9)
    alpha = np.repeat(rng.choice([0, 255], h * w // 25 + 1).astype(np.uint8), 25)[: h * w]
    if shutil.which("zstd"):
        sidecar = subprocess.run(["zstd", "-12", "-c"], input=alpha.tobytes(),
                                 capture_output=True).stdout
    else:
        sidecar = codecs.zstd_frame_encode(alpha.tobytes())
    tile = codecs.decode_tile(jpg, sidecar, fmt="jpeg")
    assert tile.shape == (h, w, 4)
    assert np.abs(tile[:, :, :3].astype(int) - ref.astype(int)).max() <= 4
    assert np.array_equal(tile[:, :, 3].ravel(), alpha)
