"""Reference-binary CPC serde — the compressed wire format.

Implements the reference's CPC serialization (cpc/PreambleUtil.java
layout, cpc/CompressedState.java import/export, cpc/CpcCompression.java
codecs) so CPC sketch columns interoperate with datasketches-java/-cpp
producers and consumers, validated against the reference's own
C++-generated golden images (src/test/resources/cpc-{empty,sparse,
hybrid,pinned,sliding,10m}.sk, the files cpc/CpcCBinariesTest.java:42-93
reads) in tests/test_cpc_serde.py.

Wire structure (little-endian; all streams are 32-bit words):

  LoFields (8B): preInts, serVer=1, famID=16, lgK, fiCol, flags,
  seedHash:short.  flags: bit1=compressed, bits2-4 = format ordinal
  {EMPTY_MERGED, EMPTY_HIP, SPARSE_HYBRID_MERGED, SPARSE_HYBRID_HIP,
   PINNED_SLIDING_MERGED_NOSV, PINNED_SLIDING_HIP_NOSV,
   PINNED_SLIDING_MERGED, PINNED_SLIDING_HIP} — i.e. the ordinal's own
  bits are HIP / hasSV / hasWindow.  HiField byte offsets per format
  follow cpc/PreambleUtil.hiFieldOffset; the window stream starts at
  preInts*4 and the SV stream after it.

  Window codec: per-byte canonical prefix codes, 12-bit-peek table
  decode (lowLevelUncompressBytes) with 22 pseudo-phase code tables
  (CompressionData.encodingTablesForHighEntropyByte; decode tables
  derived at import exactly as makeDecodingTable does).

  Surprising-value codec: sorted rowCol pairs, delta-coded; column
  delta as 12-bit length-limited unary, row delta Golomb (unary high
  part + numBaseBits low bits) with numBaseBits =
  floor(log2((k+n-n)/n)) (golombChooseNumberOfBaseBits).

  Flavor handling on read mirrors CpcCompression.uncompress: sparse /
  hybrid images carry every coupon as a pair; pinned images store
  pairs with columns shifted down by 8; sliding images additionally
  rotate and permute columns (columnPermutationsForEncoding).  The
  decoded window/pairs reconstruct the engine's canonical bit matrix
  via the bitMatrixOfSketch rule (default early-zone ones, window at
  the offset, pairs XOR).

  The write path emits MERGED formats only (the engine is merge-based
  and never carries HIP state) — a reference consumer reads these as
  merged sketches and correctly selects its ICON estimator.
"""

from __future__ import annotations

import struct

import numpy as np

from ..config import DEFAULT_UPDATE_SEED
from ._cpc_tables import (
    COLUMN_PERMUTATIONS_FOR_ENCODING, ENCODING_TABLES_HIGH_ENTROPY_BYTE,
    LENGTH_LIMITED_UNARY_ENCODING_65)
from .cpc import CpcSketch
from .theta import compute_seed_hash

_FAMILY_CPC = 16
_SER_VER = 1
_FLAG_COMPRESSED = 2
_PRE_INT_DEFS = [2, 2, 4, 8, 4, 8, 6, 10]
# format ordinals
_F_EMPTY_MERGED = 0
_F_SPARSE_HYBRID_MERGED = 2
_F_PINNED_SLIDING_MERGED_NOSV = 4
_F_PINNED_SLIDING_MERGED = 6
# hiFieldOffset[format][field]; fields: NUM_COUPONS, NUM_SV, KXP,
# HIP_ACCUM, SV_LENGTH_INTS, W_LENGTH_INTS (PreambleUtil.java:262-271)
_HI = [
    [0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0],
    [8, 0, 0, 0, 12, 0],
    [8, 0, 16, 24, 12, 0],
    [8, 0, 0, 0, 0, 12],
    [8, 0, 16, 24, 0, 12],
    [8, 12, 0, 0, 16, 20],
    [8, 12, 16, 24, 32, 36],
]


def _make_decoding_table(encoding: list[int]) -> np.ndarray:
    """CompressionData.makeDecodingTable port: 12-bit peek -> entry
    (length << 8 | symbol)."""
    table = np.zeros(4096, dtype=np.uint16)
    for sym, entry in enumerate(encoding):
        code_val = entry & 0xFFF
        code_len = (entry >> 12) & 0xF
        dec = (code_len << 8) | sym
        for garbage in range(1 << (12 - code_len)):
            table[(code_val | (garbage << code_len)) & 0xFFF] = dec
    return table


_DECODING_HIGH_ENTROPY = [
    _make_decoding_table(t) for t in ENCODING_TABLES_HIGH_ENTROPY_BYTE]
_DECODING_UNARY65 = _make_decoding_table(LENGTH_LIMITED_UNARY_ENCODING_65)
_PERM_DECODE = []
for _p in COLUMN_PERMUTATIONS_FOR_ENCODING:
    _inv = [0] * 56
    for _i, _v in enumerate(_p):
        _inv[_v] = _i
    _PERM_DECODE.append(_inv)


def _determine_flavor(lg_k: int, c: int) -> str:
    """cpc/CpcUtil.determineFlavor."""
    k = 1 << lg_k
    if c == 0:
        return "EMPTY"
    if (c << 5) < 3 * k:
        return "SPARSE"
    if (c << 1) < k:
        return "HYBRID"
    if (c << 3) < 27 * k:
        return "PINNED"
    return "SLIDING"


def _determine_correct_offset(lg_k: int, c: int) -> int:
    tmp = (c << 3) - 19 * (1 << lg_k)  # 8C - 19K
    return 0 if tmp < 0 else tmp >> (lg_k + 3)


def _determine_pseudo_phase(lg_k: int, c: int) -> int:
    """CpcCompression.determinePseudoPhase."""
    k = 1 << lg_k
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16 + 0
        if 10 * c < 11 * k:
            return 16 + 1
        if 100 * c < 132 * k:
            return 16 + 2
        if 3 * c < 5 * k:
            return 16 + 3
        if 1000 * c < 1965 * k:
            return 16 + 4
        if 1000 * c < 2275 * k:
            return 16 + 5
        return 6
    return (c >> (lg_k - 4)) & 15


def _golomb_base_bits(k: int, count: int) -> int:
    """CpcCompression.golombChooseNumberOfBaseBits."""
    assert count >= 1
    quotient = (k - count) // count
    return 0 if quotient == 0 else quotient.bit_length() - 1


class _BitReader:
    """LSB-first bit stream over little-endian 32-bit words."""

    def __init__(self, words: np.ndarray):
        self.words = words
        self.idx = 0
        self.buf = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        if self.bits < need:
            self.buf |= int(self.words[self.idx]) << self.bits
            self.idx += 1
            self.bits += 32

    def decode_sym(self, table: np.ndarray) -> int:
        self._fill(12)
        lookup = int(table[self.buf & 0xFFF])
        length = lookup >> 8
        self.buf >>= length
        self.bits -= length
        return lookup & 0xFF

    def read_unary(self) -> int:
        total = 0
        while True:
            self._fill(8)
            peek8 = self.buf & 0xFF
            if peek8 == 0:
                total += 8
                self.buf >>= 8
                self.bits -= 8
                continue
            tz = (peek8 & -peek8).bit_length() - 1
            self.buf >>= tz + 1
            self.bits -= tz + 1
            return total + tz

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.bits -= n
        return v


class _BitWriter:
    def __init__(self):
        self.words: list[int] = []
        self.buf = 0
        self.bits = 0

    def _flush32(self) -> None:
        while self.bits >= 32:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf >>= 32
            self.bits -= 32

    def write_code(self, val: int, length: int) -> None:
        self.buf |= val << self.bits
        self.bits += length
        self._flush32()

    def write_unary(self, value: int) -> None:
        while value >= 16:
            value -= 16
            self.bits += 16
            self._flush32()
        self.write_code(1 << value, value + 1)

    def finish(self, padding: int) -> np.ndarray:
        self.bits += max(padding, 0)
        self._flush32()
        if self.bits > 0:
            self.words.append(self.buf & 0xFFFFFFFF)
            self.buf = 0
            self.bits = 0
        return np.asarray(self.words, dtype="<u4")


def _uncompress_bytes(words: np.ndarray, n: int,
                      table: np.ndarray) -> np.ndarray:
    r = _BitReader(words)
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        out[i] = r.decode_sym(table)
    return out


def _compress_bytes(data: np.ndarray, encoding: list[int]) -> np.ndarray:
    w = _BitWriter()
    for b in data:
        entry = encoding[int(b)]
        w.write_code(entry & 0xFFF, (entry >> 12) & 0xF)
    return w.finish(11)


def _uncompress_pairs(words: np.ndarray, num_pairs: int,
                      base_bits: int) -> np.ndarray:
    r = _BitReader(words)
    pairs = np.empty(num_pairs, dtype=np.int64)
    pred_row, pred_col = 0, 0
    for i in range(num_pairs):
        x_delta = r.decode_sym(_DECODING_UNARY65)
        hi = r.read_unary()
        lo = r.read_bits(base_bits)
        y_delta = (hi << base_bits) | lo
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        pairs[i] = (row << 6) | col
        pred_row = row
        pred_col = col + 1
    return pairs


def _compress_pairs(pairs: np.ndarray, base_bits: int) -> np.ndarray:
    w = _BitWriter()
    lo_mask = (1 << base_bits) - 1
    pred_row, pred_col = 0, 0
    for rc in pairs:
        rc = int(rc)
        row, col = rc >> 6, rc & 63
        if row != pred_row:
            pred_col = 0
        y_delta = row - pred_row
        x_delta = col - pred_col
        pred_row, pred_col = row, col + 1
        entry = LENGTH_LIMITED_UNARY_ENCODING_65[x_delta]
        w.write_code(entry & 0xFFF, (entry >> 12) & 0xF)
        w.write_unary(y_delta >> base_bits)
        w.write_code(y_delta & lo_mask, base_bits)
    return w.finish(max(10 - base_bits, 0))


def _matrix_from_parts(lg_k: int, window: np.ndarray | None,
                       pairs: np.ndarray, offset: int) -> np.ndarray:
    """cpc/CpcUtil.bitMatrixOfSketch: default early-zone ones, window
    at the offset, pairs XOR (flip: early-zone 0s, late-zone 1s)."""
    k = 1 << lg_k
    matrix = np.full(k, (np.uint64(1) << np.uint64(offset)) - np.uint64(1),
                     dtype=np.uint64)
    if window is not None:
        matrix |= window.astype(np.uint64) << np.uint64(offset)
    if pairs.size:
        rows = (pairs >> 6).astype(np.int64)
        cols = (pairs & 63).astype(np.uint64)
        np.bitwise_xor.at(matrix, rows, np.uint64(1) << cols)
    return matrix


def from_java_bytes(buf: bytes,
                    seed: int | None = DEFAULT_UPDATE_SEED) -> CpcSketch:
    """Heapify a reference CPC image (CpcSketch.heapify counterpart:
    CompressedState.importFromMemory + CpcCompression.uncompress)."""
    if len(buf) < 8:
        raise ValueError("CPC image too short")
    pre_ints, ser_ver, fam, lg_k, _fi_col, flags, seed_hash = \
        struct.unpack_from("<BBBBBBH", buf, 0)
    if fam != _FAMILY_CPC:
        raise ValueError(f"family {fam} is not a CPC image (need 16)")
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported CPC serVer {ser_ver}")
    if not flags & _FLAG_COMPRESSED:
        raise ValueError("CPC image must have the compressed flag")
    if not (4 <= lg_k <= 26):
        raise ValueError(f"CPC lgK must be in [4,26], got {lg_k}")
    fmt = (flags >> 2) & 0x7
    if pre_ints != _PRE_INT_DEFS[fmt]:
        raise ValueError(
            f"preInts {pre_ints} wrong for format {fmt} "
            f"(expect {_PRE_INT_DEFS[fmt]})")
    if seed is not None and seed_hash != compute_seed_hash(seed):
        raise ValueError("seed hash mismatch")
    sh = seed_hash if seed is None else compute_seed_hash(seed)

    if fmt in (0, 1):  # EMPTY
        return CpcSketch(lg_k, sh, np.zeros(1 << lg_k, dtype=np.uint64))

    def _int_at(off: int) -> int:
        return struct.unpack_from("<i", buf, off)[0]

    c = _int_at(_HI[fmt][0])
    has_window = bool(fmt & 4)
    has_sv = bool(fmt & 2)
    num_sv = _int_at(_HI[fmt][1]) if fmt in (6, 7) else (
        c if fmt in (2, 3) else 0)
    sv_len = _int_at(_HI[fmt][4]) if has_sv else 0
    w_len = _int_at(_HI[fmt][5]) if has_window else 0
    k = 1 << lg_k
    if (c < 0 or num_sv < 0 or sv_len < 0 or w_len < 0
            or c > (k << 6) or num_sv > (k << 6)):
        raise ValueError(
            f"Possible Corruption: negative or absurd CPC counts "
            f"(c={c}, numSv={num_sv}, svLen={sv_len}, wLen={w_len})")
    if has_sv and num_sv > 0 and sv_len == 0:
        raise ValueError("Possible Corruption: svLengthInts cannot be zero")
    w_off = pre_ints << 2
    required = w_off + 4 * (w_len + sv_len)
    if len(buf) < required:
        # same condition the reference enforces (CompressedState
        # checkCapacity against getRequiredSerializedBytes) — the
        # in-tree cpc-10m.sk artifact fails it there too
        raise ValueError(
            f"Possible Corruption: CPC image capacity {len(buf)} < "
            f"required {required}")
    words = np.frombuffer(buf, dtype="<u4",
                          count=w_len + sv_len, offset=w_off)
    w_stream = words[:w_len]
    sv_stream = words[w_len:]

    if not has_window:  # SPARSE / HYBRID: every coupon is a pair
        pairs = _uncompress_pairs(sv_stream, num_sv,
                                  _golomb_base_bits(k + num_sv, num_sv))
        matrix = _matrix_from_parts(lg_k, None, pairs, 0)
    else:
        pseudo_phase = _determine_pseudo_phase(lg_k, c)
        window = _uncompress_bytes(w_stream, k,
                                   _DECODING_HIGH_ENTROPY[pseudo_phase])
        offset = _determine_correct_offset(lg_k, c)
        if num_sv == 0:
            pairs = np.empty(0, dtype=np.int64)
        else:
            pairs = _uncompress_pairs(sv_stream, num_sv,
                                      _golomb_base_bits(k + num_sv, num_sv))
            if offset == 0:  # PINNED: undo the 8-column shift
                pairs = pairs + 8
            else:            # SLIDING: undo permutation + rotation
                perm = _PERM_DECODE[pseudo_phase]
                rows = pairs >> 6
                cols = pairs & 63
                cols = np.asarray([perm[int(cc)] for cc in cols],
                                  dtype=np.int64)
                cols = (cols + (offset + 8)) & 63
                pairs = (rows << 6) | cols
        matrix = _matrix_from_parts(lg_k, window, pairs, offset)
    sk = CpcSketch(lg_k, sh, matrix)
    if sk.num_coupons != c:
        raise ValueError(
            f"corrupt CPC image: decoded {sk.num_coupons} coupons, "
            f"preamble says {c}")
    return sk


def to_java_bytes(sk: CpcSketch, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Serialize to the reference's compressed wire format (MERGED
    formats; CpcSketch.toByteArray + CpcCompression.compress
    counterpart, flavor-dispatched from the bit matrix)."""
    lg_k = sk.lg_k
    k = 1 << lg_k
    c = sk.num_coupons
    seed_hash = compute_seed_hash(seed)
    flavor = _determine_flavor(lg_k, c)

    def _lo(fmt: int) -> bytes:
        return struct.pack("<BBBBBBH", _PRE_INT_DEFS[fmt], _SER_VER,
                           _FAMILY_CPC, lg_k, 0,
                           _FLAG_COMPRESSED | (fmt << 2), seed_hash)

    if flavor == "EMPTY":
        return _lo(_F_EMPTY_MERGED)

    if flavor in ("SPARSE", "HYBRID"):
        pairs = sk.row_cols().astype(np.int64)
        sv = _compress_pairs(pairs, _golomb_base_bits(k + c, c))
        return (_lo(_F_SPARSE_HYBRID_MERGED)
                + struct.pack("<ii", c, len(sv)) + sv.tobytes())

    # PINNED / SLIDING: split the matrix into window + surprises
    offset = _determine_correct_offset(lg_k, c)
    window = ((sk.matrix >> np.uint64(offset))
              & np.uint64(0xFF)).astype(np.uint8)
    # surprises: clear the window zone, flip the early zone
    pattern = sk.matrix & ~(np.uint64(0xFF) << np.uint64(offset))
    pattern ^= (np.uint64(1) << np.uint64(offset)) - np.uint64(1)
    rows, cols = np.nonzero(
        np.unpackbits(pattern.view(np.uint8), bitorder="little")
        .reshape(k, 64))
    pseudo_phase = _determine_pseudo_phase(lg_k, c)
    cw = _compress_bytes(window,
                         ENCODING_TABLES_HIGH_ENTROPY_BYTE[pseudo_phase])
    num_sv = rows.size
    if num_sv == 0:
        return (_lo(_F_PINNED_SLIDING_MERGED_NOSV)
                + struct.pack("<ii", c, len(cw)) + cw.tobytes())
    if offset == 0:  # PINNED: columns shift down by 8
        assert (cols >= 8).all()
        pairs = (rows.astype(np.int64) << 6) | (cols.astype(np.int64) - 8)
    else:            # SLIDING: rotate then permute columns
        perm = COLUMN_PERMUTATIONS_FOR_ENCODING[pseudo_phase]
        cc = (cols.astype(np.int64) + 56 - offset) & 63
        cc = np.asarray([perm[int(x)] for x in cc], dtype=np.int64)
        pairs = (rows.astype(np.int64) << 6) | cc
    pairs = np.sort(pairs)
    sv = _compress_pairs(pairs, _golomb_base_bits(k + num_sv, num_sv))
    return (_lo(_F_PINNED_SLIDING_MERGED)
            + struct.pack("<iiii", c, num_sv, len(sv), len(cw))
            + cw.tobytes() + sv.tobytes())
