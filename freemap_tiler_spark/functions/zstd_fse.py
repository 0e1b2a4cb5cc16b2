"""RFC 8878 compressed-block decoding: FSE + Huffman, pure Python.

Read-side interchange (VERDICT r3 "Next round" #4): the reference resumes
from its own store by `decode_all`-ing ANY zstd frame
(/root/reference/src/processor.rs:205-209), and real zstd level-0 emits
FSE/Huffman-compressed blocks — so a reference-written store could not be
resumed from by the r3 engine (codecs.py rejected block type 2).  This
module implements the PUBLIC RFC 8878 grammar for compressed blocks:

- §4.1   FSE: normalized-count table description + decoding tables
- §4.2   Huffman: weights (direct or FSE-compressed), canonical codes,
         1- and 4-stream literal bitstreams
- §3.1.1.3.1  Literals section (Raw / RLE / Compressed / Treeless)
- §3.1.1.3.2  Sequences section (predefined / RLE / FSE / Repeat modes,
         the three-slot repeat-offset history, overlap-safe match copy)

Only the DECODE side lives here — the engine's writer emits Raw/RLE-block
frames (codecs.zstd_frame_encode), which every conformant decoder reads.
Hot-path note: tile alpha sidecars are a few KB; this runs inside Arrow
batch kernels on resume only.  Correctness is gated against the system
`zstd` CLI in pytest (fixtures at several levels + random payloads).
"""

from __future__ import annotations

# --- §3.1.1.3.2.1.1 predefined FSE distributions -------------------------
LL_DEFAULTS = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
               2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
               -1, -1, -1, -1]                                   # AL 6
ML_DEFAULTS = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               -1, -1, -1, -1, -1, -1, -1]                       # AL 6
OF_DEFAULTS = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1,
               -1, -1, -1, -1]                                   # AL 5

# --- §3.1.1.3.2.1.2 code -> (baseline, extra-bits) -----------------------
LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15, 16]
LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
                             128, 256, 512, 1024, 2048, 4096, 8192,
                             16384, 32768, 65536]
ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                      11, 12, 13, 14, 15, 16]
ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                99, 131, 259, 515, 1027, 2051, 4099,
                                8195, 16387, 32771, 65539]


class CorruptError(ValueError):
    pass


class _FwdBits:
    """Forward bitstream: LSB-first within each byte (§4.1.1 table
    descriptions are read this way), with 1-bit rewind + byte alignment."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise CorruptError("forward bitstream overrun")
            v |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return v

    def rewind(self, n: int) -> None:
        self.bitpos -= n

    def align(self) -> int:
        """Byte-align and return the byte offset."""
        self.bitpos = (self.bitpos + 7) & ~7
        return self.bitpos >> 3


class _BackBits:
    """Backward bitstream (§3.1.1.3.2.1.2): starts at the HIGHEST set bit
    of the last byte (the padding sentinel); reads take the top remaining
    bits.  Reads past the start return zero bits and drive ``left``
    negative — the documented overflow signal for the final FSE states."""

    def __init__(self, data: bytes):
        if not data:
            raise CorruptError("empty backward bitstream")
        self.value = int.from_bytes(data, "little")
        if self.value == 0:
            raise CorruptError("backward bitstream has no sentinel bit")
        self.left = self.value.bit_length() - 1  # strip sentinel

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.left -= n
        if self.left >= 0:
            return (self.value >> self.left) & ((1 << n) - 1)
        # zero-padded overread (allowed only for final state reads)
        shift = -self.left
        return ((self.value & ((1 << max(self.left + n, 0)) - 1)) << shift
                if self.left + n > 0 else 0)

    def peek(self, n: int) -> int:
        if self.left >= n:
            return (self.value >> (self.left - n)) & ((1 << n) - 1)
        if self.left <= 0:
            return 0
        return (self.value & ((1 << self.left) - 1)) << (n - self.left)

    def skip(self, n: int) -> None:
        self.left -= n


# --- FSE (§4.1) -----------------------------------------------------------

def fse_read_counts(fwd: _FwdBits, max_al: int):
    """Parse a normalized-count table description; returns (freqs, AL) and
    leaves ``fwd`` byte-aligned just past the description."""
    al = 5 + fwd.read(4)
    if al > max_al:
        raise CorruptError(f"FSE accuracy log {al} > max {max_al}")
    remaining = 1 << al
    freqs: list[int] = []
    while remaining > 0 and len(freqs) < 256:
        bits = (remaining + 1).bit_length()
        val = fwd.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - (remaining + 1)
        if (val & lower_mask) < threshold:
            fwd.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        remaining -= -prob if prob < 0 else prob
        freqs.append(prob)
        if prob == 0:
            repeat = fwd.read(2)
            while True:
                freqs.extend([0] * repeat)
                if repeat == 3:
                    repeat = fwd.read(2)
                else:
                    break
    if remaining != 0:
        raise CorruptError("FSE counts do not sum to table size")
    fwd.align()
    return freqs, al


def fse_build(freqs: list[int], al: int):
    """Decoding table from normalized counts: (symbols, nbits, base) each
    of length 2^al.  Low-probability (-1) symbols take the table's tail
    cells; positive-probability symbols spread with the standard step."""
    size = 1 << al
    symbols = [0] * size
    high = size - 1
    for s, p in enumerate(freqs):
        if p == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(freqs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise CorruptError("FSE spread did not wrap to zero")
    counter = [max(p, 1) if p != 0 else 0 for p in freqs]
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = symbols[i]
        x = counter[s]
        counter[s] += 1
        nb = al - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return symbols, nbits, base


def _fse_predefined(defaults: list[int], al: int):
    return fse_build(defaults, al)


_PREDEF = {
    "ll": _fse_predefined(LL_DEFAULTS, 6),
    "of": _fse_predefined(OF_DEFAULTS, 5),
    "ml": _fse_predefined(ML_DEFAULTS, 6),
}
_PREDEF_AL = {"ll": 6, "of": 5, "ml": 6}
_MODE_MAX_AL = {"ll": 9, "of": 8, "ml": 9}


def _fse_rle_table(symbol: int):
    """A 1-state table that always emits ``symbol`` and reads 0 bits."""
    return [symbol], [0], [0]


# --- Huffman (§4.2) -------------------------------------------------------

def huf_read_weights(data: bytes, pos: int):
    """Huffman-tree description at ``data[pos:]``: returns (weights, next
    position).  Header byte < 128 -> FSE-compressed weights (two
    alternating states, one backward bitstream); >= 128 -> direct 4-bit
    weights."""
    hdr = data[pos]
    pos += 1
    if hdr >= 128:
        n = hdr - 127
        weights = []
        for i in range(n):
            b = data[pos + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, pos + (n + 1) // 2
    csize = hdr
    blob = data[pos:pos + csize]
    fwd = _FwdBits(blob)
    freqs, al = fse_read_counts(fwd, 6)
    syms, nbits, base = fse_build(freqs, al)
    start = fwd.align()
    bs = _BackBits(blob[start:])
    s1 = bs.read(al)
    s2 = bs.read(al)
    weights = []
    while True:
        weights.append(syms[s1])
        s1 = base[s1] + bs.read(nbits[s1])
        if bs.left < 0:
            weights.append(syms[s2])
            break
        weights.append(syms[s2])
        s2 = base[s2] + bs.read(nbits[s2])
        if bs.left < 0:
            weights.append(syms[s1])
            break
        if len(weights) > 255:
            raise CorruptError("too many Huffman weights")
    return weights, pos + csize


def huf_build(weights: list[int]):
    """Canonical Huffman decode table from explicit weights (the last
    symbol's weight is implicit, §4.2.1.1): (symbols, nbits, max_bits);
    table indexed by the top ``max_bits`` bits of the stream."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise CorruptError("empty Huffman weights")
    max_bits = total.bit_length()  # smallest p2 > total, as exponent
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise CorruptError("Huffman weights: invalid implicit last weight")
    last_w = left.bit_length()  # 2^(w-1) == left
    ws = weights + [last_w]
    bits = [(max_bits + 1 - w) if w > 0 else 0 for w in ws]
    size = 1 << max_bits
    symbols = [0] * size
    nb = [0] * size
    rank_count = [0] * (max_bits + 1)
    for b in bits:
        if b:
            rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    rank_idx[max_bits] = 0
    for b in range(max_bits, 0, -1):
        rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (1 << (max_bits - b))
    for s, b in enumerate(bits):
        if b == 0:
            continue
        code = rank_idx[b]
        span = 1 << (max_bits - b)
        for i in range(code, code + span):
            symbols[i] = s
            nb[i] = b
        rank_idx[b] += span
    return symbols, nb, max_bits


def _huf_decode_stream(stream: bytes, count: int, table) -> bytearray:
    symbols, nb, max_bits = table
    bs = _BackBits(stream)
    out = bytearray()
    for _ in range(count):
        idx = bs.peek(max_bits)
        out.append(symbols[idx])
        bs.skip(nb[idx])
        if bs.left < -max_bits:
            raise CorruptError("Huffman stream underrun")
    return out


# --- literals section (§3.1.1.3.1) ---------------------------------------

def decode_literals(block: bytes, pos: int, ctx: dict):
    """Returns (literals: bytes, next position)."""
    b0 = block[pos]
    btype = b0 & 3
    sf = (b0 >> 2) & 3
    if btype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            rsize = b0 >> 3
            pos += 1
        elif sf == 1:
            rsize = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            rsize = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        # ADVICE r4 #5: Python slicing past-the-end is silent — a truncated
        # frame would return short literals instead of failing like the
        # compressed paths do
        if btype == 0:
            if pos + rsize > len(block):
                raise CorruptError("raw literals truncated")
            return bytes(block[pos:pos + rsize]), pos + rsize
        if pos >= len(block):
            raise CorruptError("RLE literal byte missing")
        return bytes(block[pos:pos + 1]) * rsize, pos + 1
    # Compressed (2) / Treeless (3)
    if sf == 0:
        streams = 1
        rsize = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        csize = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif sf == 1:
        streams = 4
        rsize = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        csize = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif sf == 2:
        streams = 4
        rsize = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 3) << 12)
        csize = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
        pos += 4
    else:
        streams = 4
        rsize = (b0 >> 4) | (block[pos + 1] << 4) | ((block[pos + 2] & 0x3F) << 12)
        csize = (block[pos + 2] >> 6) | (block[pos + 3] << 2) | (block[pos + 4] << 10)
        pos += 5
    end = pos + csize
    if btype == 2:
        weights, wpos = huf_read_weights(block, pos)
        ctx["huf"] = huf_build(weights)
        pos = wpos
    elif "huf" not in ctx:
        raise CorruptError("treeless literals with no previous Huffman table")
    table = ctx["huf"]
    if streams == 1:
        lit = _huf_decode_stream(block[pos:end], rsize, table)
        return bytes(lit), end
    # 4 streams: 6-byte jump table, streams 1-3 sized there, 4th = rest
    s1 = int.from_bytes(block[pos:pos + 2], "little")
    s2 = int.from_bytes(block[pos + 2:pos + 4], "little")
    s3 = int.from_bytes(block[pos + 4:pos + 6], "little")
    pos += 6
    r13 = (rsize + 3) // 4
    r4 = rsize - 3 * r13
    if r4 < 0:
        raise CorruptError("4-stream literals: negative last stream size")
    out = bytearray()
    for ssize, rcount in ((s1, r13), (s2, r13), (s3, r13), (end - pos - s1 - s2 - s3 if False else None, r4)):
        if ssize is None:
            ssize = end - pos
        out += _huf_decode_stream(block[pos:pos + ssize], rcount, table)
        pos += ssize
    return bytes(out), end


# --- sequences section (§3.1.1.3.2) --------------------------------------

def _seq_table(block: bytes, pos: int, mode: int, kind: str, ctx: dict):
    """Returns (table, next position) for one of ll/of/ml."""
    if mode == 0:
        ctx[kind] = _PREDEF[kind]
        return ctx[kind], pos
    if mode == 1:
        ctx[kind] = _fse_rle_table(block[pos])
        return ctx[kind], pos + 1
    if mode == 2:
        fwd = _FwdBits(block, pos)
        freqs, al = fse_read_counts(fwd, _MODE_MAX_AL[kind])
        ctx[kind] = fse_build(freqs, al)
        return ctx[kind], fwd.align()
    if kind not in ctx:
        raise CorruptError(f"repeat FSE mode with no previous {kind} table")
    return ctx[kind], pos


def decode_sequences(block: bytes, pos: int, ctx: dict):
    """Returns (list of (ll, ml, offset_value) sequences, bitstream)."""
    b0 = block[pos]
    if b0 == 0:
        return [], pos + 1
    if b0 < 128:
        nseq = b0
        pos += 1
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + block[pos + 1]
        pos += 2
    else:
        nseq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
        pos += 3
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise CorruptError("reserved sequence-mode bits set")
    ll_t, pos = _seq_table(block, pos, (modes >> 6) & 3, "ll", ctx)
    of_t, pos = _seq_table(block, pos, (modes >> 4) & 3, "of", ctx)
    ml_t, pos = _seq_table(block, pos, (modes >> 2) & 3, "ml", ctx)
    bs = _BackBits(block[pos:])
    ll_syms, ll_nb, ll_base = ll_t
    of_syms, of_nb, of_base = of_t
    ml_syms, ml_nb, ml_base = ml_t
    # init states: LL, then OF, then ML (§3.1.1.3.2.1.2)
    ll_al = (len(ll_syms)).bit_length() - 1
    of_al = (len(of_syms)).bit_length() - 1
    ml_al = (len(ml_syms)).bit_length() - 1
    ll_s = bs.read(ll_al)
    of_s = bs.read(of_al)
    ml_s = bs.read(ml_al)
    seqs = []
    for i in range(nseq):
        of_code = of_syms[of_s]
        ll_code = ll_syms[ll_s]
        ml_code = ml_syms[ml_s]
        if of_code > 31 or ll_code > 35 or ml_code > 52:
            raise CorruptError("sequence code out of range")
        # extra bits read order: OF, ML, LL
        offset_value = (1 << of_code) + bs.read(of_code)
        ml = ML_BASE[ml_code] + bs.read(ML_BITS[ml_code])
        ll = LL_BASE[ll_code] + bs.read(LL_BITS[ll_code])
        seqs.append((ll, ml, offset_value))
        if i < nseq - 1:
            # state update order: LL, ML, OF
            ll_s = ll_base[ll_s] + bs.read(ll_nb[ll_s])
            ml_s = ml_base[ml_s] + bs.read(ml_nb[ml_s])
            of_s = of_base[of_s] + bs.read(of_nb[of_s])
    if bs.left > 0:
        raise CorruptError(f"sequence bitstream has {bs.left} unread bits")
    return seqs, len(block)


def execute_sequences(seqs, literals: bytes, out: bytearray, ctx: dict) -> None:
    """Append the block's regenerated content to ``out`` (the whole-frame
    window: matches may reach into earlier blocks)."""
    rep = ctx.setdefault("rep", [1, 4, 8])
    lpos = 0
    for ll, ml, oval in seqs:
        out += literals[lpos:lpos + ll]
        lpos += ll
        if oval > 3:
            offset = oval - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = oval - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            else:
                offset = rep[idx] if idx < 3 else rep[0] - 1
                if idx > 1:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if offset <= 0 or offset > len(out):
            raise CorruptError("match offset outside window")
        if ml > 0:
            start = len(out) - offset
            if offset >= ml:
                out += out[start:start + ml]
            else:
                for i in range(ml):  # overlapping copy
                    out.append(out[start + i])
    out += literals[lpos:]


def decode_block(block: bytes, out: bytearray, ctx: dict) -> None:
    """Decode one Compressed_Block's content into ``out``.  ``ctx`` holds
    the frame-scoped repeat state (Huffman table, FSE tables, repeat
    offsets) and must be shared across the frame's blocks."""
    literals, pos = decode_literals(block, 0, ctx)
    seqs, _ = decode_sequences(block, pos, ctx)
    execute_sequences(seqs, literals, out, ctx)
