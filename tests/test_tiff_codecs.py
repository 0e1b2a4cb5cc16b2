"""Property tests for the pure-Python TIFF codecs (no Spark session):
LZW (TIFF 6.0 §13 early-change) and PackBits (§9) roundtrip ARBITRARY
byte strings, including the >4094-entry table-reset path; corrupt
prefixes never return silently short data."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from freemap_tiler_spark.sources.geotiff import (
    GeoTiffError,
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode_row,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_arbitrary_bytes(data):
    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=40), st.integers(2, 400))
def test_lzw_roundtrip_repetitive(data, reps):
    # low-entropy streams exercise deep table growth and, for large
    # inputs, the 4094-entry ClearCode reset
    blob = data * reps
    assert _lzw_decode(_lzw_encode(blob)) == blob


def test_lzw_table_reset_path():
    # guarantee the encoder's mid-stream ClearCode fires: >4094 distinct
    # sequences need random-ish data well beyond the table budget
    import random

    blob = bytes(random.Random(9).randrange(256) for _ in range(60_000))
    enc = _lzw_encode(blob)
    assert _lzw_decode(enc) == blob


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=1, max_size=512))
def test_packbits_roundtrip_arbitrary_rows(row):
    enc = _packbits_encode_row(row)
    assert _packbits_decode(enc, len(row)) == row


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=8, max_size=400))
def test_lzw_truncation_never_silently_short(data):
    enc = _lzw_encode(data)
    for cut in (1, len(enc) // 3, len(enc) - 1):
        if cut <= 0 or cut >= len(enc):
            continue
        try:
            out = _lzw_decode(enc[:cut])
        except GeoTiffError:
            continue  # raising is the contract
        # the only silent success allowed is a truncation that still
        # contains a full valid stream terminator — impossible for a
        # strict prefix of a single-EOI stream, so reaching here with
        # the full payload means the cut landed after all data bits
        assert out == data
