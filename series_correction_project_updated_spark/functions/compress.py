"""Gorilla-style time-series compression (pure Python/NumPy, no deps).

Implements the two codecs from Facebook's Gorilla paper (Pelkonen et al.,
VLDB 2015, public):

* timestamps — delta-of-delta with the paper's variable-length buckets
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '11110'+32b | '11111'+64b escape),
* float64 values — XOR with leading/trailing-zero window reuse
  ('0' same | '10' reuse window | '11' + 5b leading + 6b length + bits).

New code (the reference repo has no compression layer); used by the rollup
retention tiers to store points as `binary`. Encode/decode are exact
(bit-roundtrip) for any float64 incl. NaN; timestamps are int64 seconds.

Encoding is NumPy-vectorized: per-element variable-length codes are computed
columnar (bit_length/clz/ctz via shift cascades, delta-of-delta buckets via
masks), then scattered into one bit plane with ≤64 vectorized passes and
``np.packbits``. The only sequential part is the Gorilla window-reuse state
scan (a cheap comparison loop). Decoding stays sequential by nature (every
field depends on the previous) but reads whole fields, not single bits —
it is the verification path, not the hot path.
"""

from __future__ import annotations

import struct

import numpy as np

# Format v2: the r2 overflow fix split the old '1111'+32b dod class into
# '11110'+32b / '11111'+64b — an incompatible bitstream change, so the magic
# was bumped (GOR1 payloads would otherwise silently mis-decode: the old
# 32-bit class's MSB would be consumed as the new class bit). GOR1 payloads
# remain decodable via a legacy branch in ``decode_timestamps``.
MAGIC = b"GOR2"
MAGIC_V1 = b"GOR1"

_U64 = np.uint64
_ONE = np.uint64(1)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 → 0).

    EXACT via ``np.frexp`` on the 32-bit halves: every uint32 converts to
    float64 losslessly and frexp's exponent IS the bit length (frexp(0)
    returns exponent 0, matching bit_length(0) = 0). Replaces a 6-pass
    masked binary search whose ~30 numpy calls were pure fixed overhead on
    small chunks (~70µs/call → ~4 calls). Property-tested exhaustively
    around all 64 powers of two.
    """
    hi = (x >> _U64(32)).astype(np.float64)
    lo = (x & _U64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(lo)
    return np.where(hi > 0, e_hi.astype(np.int64) + 32, e_lo.astype(np.int64))


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _pack_codes(codes_list, lens_list) -> bytes:
    """Scatter variable-length MSB-first codes into one bit plane.

    codes_list/lens_list: parallel lists of uint64 arrays (each code ≤64
    bits); streams are concatenated element-interleaved in list order per
    index? No — they are concatenated ARRAY BY ARRAY (each (codes, lens)
    pair is one contiguous segment of the stream).
    """
    codes = np.concatenate([np.asarray(c, dtype=np.uint64) for c in codes_list])
    lens = np.concatenate([np.asarray(l, dtype=np.int64) for l in lens_list])
    keep = lens > 0
    codes, lens = codes[keep], lens[keep]
    if len(codes) == 0:
        return b""
    offsets = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    total = int(offsets[-1] + lens[-1])
    # (n_codes, 64) MSB-first bit matrix in one C call, then ONE gather of
    # each code's low ``lens`` bits into the plane (code k's bits live in
    # columns [64-lens[k], 64)). Replaces a python loop over the 64 bit
    # positions with per-pass boolean fancy-indexing — ~3× on the encode
    # path; bit-identical output by construction (same plane layout).
    bits = np.unpackbits(
        codes.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )
    pos = np.arange(total, dtype=np.int64)
    code_id = np.repeat(np.arange(len(codes), dtype=np.int64), lens)
    j_in_code = pos - offsets[code_id]
    src_col = 64 - lens[code_id] + j_in_code
    plane = np.zeros(((total + 7) // 8) * 8, dtype=np.uint8)
    plane[:total] = bits[code_id, src_col]
    return np.packbits(plane).tobytes()


class _BitReader:
    """MSB-first bit reader; reads whole fields via int.from_bytes."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        pos = self.pos
        start = pos >> 3
        end = (pos + bits + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        total = (end - start) * 8
        self.pos = pos + bits
        return (chunk >> (total - (pos & 7) - bits)) & ((1 << bits) - 1)


# ---------------------------------------------------------------------------
# Timestamps: delta-of-delta (fully vectorized — no sequential state)
# ---------------------------------------------------------------------------


def _encode_timestamps_codes(ts: np.ndarray) -> tuple[list, list]:
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    head_codes = np.array([np.uint64(ts[0])], dtype=np.uint64)
    head_lens = np.array([64], dtype=np.int64)
    if n == 1:
        return [head_codes], [head_lens]
    deltas = np.diff(ts)
    first = np.array([_zigzag(deltas[:1])[0]], dtype=np.uint64)
    if n == 2:
        return [head_codes, first], [head_lens, np.array([64])]
    dod = (deltas[1:] - deltas[:-1]).astype(np.int64)
    m = len(dod)
    codes = np.zeros(m, dtype=np.uint64)
    lens = np.ones(m, dtype=np.int64)  # default: '0' (dod == 0)
    # Class ranges are the SIGNED range of the raw two's-complement payload
    # field: a k-bit field holds [-2^(k-1), 2^(k-1)-1]. (The Gorilla paper's
    # asymmetric [(-63,64], ... ranges assume an offset encoding; this codec
    # stores raw two's complement, and the old paper-copied masks put the
    # boundary values 64/256/2048 into a field too small for them — dod=64
    # encoded as the 7-bit sign-bit pattern and decoded as -64. Found by
    # hypothesis; boundary values now take the next class up, which the
    # unchanged decoder already handles.)
    b7 = (dod != 0) & (dod >= -64) & (dod <= 63)
    b9 = (dod != 0) & ~b7 & (dod >= -256) & (dod <= 255)
    b12 = (dod != 0) & ~b7 & ~b9 & (dod >= -2048) & (dod <= 2047)
    in32 = (dod >= -(2**31)) & (dod < 2**31)
    b32 = (dod != 0) & ~b7 & ~b9 & ~b12 & in32
    b64 = (dod != 0) & ~b7 & ~b9 & ~b12 & ~in32  # escape: full 64-bit dod
    udod = dod.view(np.uint64)
    codes[b7] = (np.uint64(0b10) << _U64(7)) | (udod[b7] & _U64(0x7F))
    lens[b7] = 9
    codes[b9] = (np.uint64(0b110) << _U64(9)) | (udod[b9] & _U64(0x1FF))
    lens[b9] = 12
    codes[b12] = (np.uint64(0b1110) << _U64(12)) | (udod[b12] & _U64(0xFFF))
    lens[b12] = 16
    codes[b32] = (np.uint64(0b11110) << _U64(32)) | (udod[b32] & _U64(0xFFFFFFFF))
    lens[b32] = 37
    # '11111' header + a separate 64-bit payload element (one element cannot
    # exceed 64 bits) — interleaved like the value stream; zero-length
    # payload entries for every other class pack to nothing
    codes[b64] = np.uint64(0b11111)
    lens[b64] = 5
    pay = np.zeros(m, dtype=np.uint64)
    pay_lens = np.zeros(m, dtype=np.int64)
    pay[b64] = udod[b64]
    pay_lens[b64] = 64
    inter_codes = np.empty(2 * m, dtype=np.uint64)
    inter_lens = np.empty(2 * m, dtype=np.int64)
    inter_codes[0::2] = codes
    inter_lens[0::2] = lens
    inter_codes[1::2] = pay
    inter_lens[1::2] = pay_lens
    return [head_codes, first, inter_codes], [head_lens, np.array([64]), inter_lens]


def decode_timestamps(r: _BitReader, n: int, legacy_v1: bool = False) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    delta = _unzigzag(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                bits, dod = 7, r.read(7)
            elif r.read(1) == 0:
                bits, dod = 9, r.read(9)
            elif r.read(1) == 0:
                bits, dod = 12, r.read(12)
            elif legacy_v1:
                bits, dod = 32, r.read(32)  # GOR1: '1111'+32b, no class bit
            elif r.read(1) == 0:
                bits, dod = 32, r.read(32)
            else:
                bits, dod = 64, r.read(64)  # escape class: raw 64-bit dod
            if dod >= 1 << (bits - 1):
                dod -= 1 << bits
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------------------
# Values: XOR with leading/trailing window reuse
# ---------------------------------------------------------------------------


def _encode_values_codes(values: np.ndarray) -> tuple[list, list]:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(bits)
    head = np.array([bits[0]], dtype=np.uint64)
    head_len = np.array([64], dtype=np.int64)
    if n == 1:
        return [head], [head_len]
    xors = bits[1:] ^ bits[:-1]
    m = len(xors)
    bl = _bit_length_u64(xors)
    lead = np.minimum(64 - bl, 31)  # clamp to 5-bit field
    low = xors & (~xors + _ONE)  # lowest set bit
    trail = _bit_length_u64(low) - 1  # -1 for xor==0 (unused)

    # Window-reuse state scan, vectorized per window SEGMENT (the state
    # (prev_lead, prev_len) only changes at a violation — ``lead < L or
    # trail < T`` — so each window is a find-first-violation scan over the
    # non-zero-xor subsequence, then one vectorized fill for the reused
    # run; same grow-block pattern as the kernel's CUSUM scan). Decisions
    # and emitted bits are IDENTICAL to the original per-element loop
    # (property-tested against it): first non-zero opens a window; reuse
    # while le ≥ prev_lead and tr ≥ prev_trail.
    hdr = np.zeros(m, dtype=np.uint64)
    hdr_len = np.ones(m, dtype=np.int64)  # '0' for xor == 0
    pay = np.zeros(m, dtype=np.uint64)
    pay_len = np.zeros(m, dtype=np.int64)
    nz = np.flatnonzero(xors)
    k = len(nz)
    lead_nz = lead[nz]
    trail_nz = trail[nz]
    x_nz = xors[nz]
    pos = 0
    while pos < k:
        le = int(lead_nz[pos])
        tr = int(trail_nz[pos])
        length = 64 - le - tr
        i0 = nz[pos]
        hdr[i0] = (0b11 << 11) | (le << 6) | (length - 1)
        hdr_len[i0] = 13
        pay[i0] = x_nz[pos] >> np.uint64(tr)
        pay_len[i0] = length
        # scan forward for the first violation in exponentially growing
        # blocks (bounds the wasted scan when windows change often)
        end = k
        s = pos + 1
        block = 64
        while s < end:
            e = min(s + block, k)
            viol = (lead_nz[s:e] < le) | (trail_nz[s:e] < tr)
            j = int(viol.argmax()) if e > s else 0
            if e > s and viol[j]:
                end = s + j
                break
            s = e
            block <<= 1
        seg = slice(pos + 1, end)
        idx = nz[seg]
        hdr[idx] = 0b10
        hdr_len[idx] = 2
        pay[idx] = x_nz[seg] >> np.uint64(tr)
        pay_len[idx] = length
        pos = end

    # interleave header/payload per element into one code stream:
    # hdr_len ≤ 13, pay_len ≤ 64 → may exceed 64 bits combined, so emit as
    # two consecutive segments per element via element-interleaved layout.
    codes = np.empty(2 * m, dtype=np.uint64)
    lens = np.empty(2 * m, dtype=np.int64)
    codes[0::2] = hdr
    lens[0::2] = hdr_len
    codes[1::2] = pay
    lens[1::2] = pay_len
    return [head, codes], [head_len, lens]


def decode_values(r: _BitReader, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    prev = r.read(64)
    out[0] = prev
    lead, length = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # reuse window
            x = r.read(length) << (64 - lead - length)
        else:
            lead = r.read(5)
            length = r.read(6) + 1
            x = r.read(length) << (64 - lead - length)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Chunk container
# ---------------------------------------------------------------------------


def encode_chunk(ts: np.ndarray, values: np.ndarray) -> bytes:
    """(int64 seconds, float64 values) → self-describing binary payload."""
    assert len(ts) == len(values)
    t_codes, t_lens = _encode_timestamps_codes(np.asarray(ts))
    tbytes = _pack_codes(t_codes, t_lens)
    v_codes, v_lens = _encode_values_codes(np.asarray(values))
    vbytes = _pack_codes(v_codes, v_lens)
    header = MAGIC + struct.pack("<IQ", len(ts), len(tbytes))
    return header + tbytes + vbytes


def decode_chunk(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    magic = payload[:4]
    assert magic in (MAGIC, MAGIC_V1), "bad magic"
    n, tlen = struct.unpack("<IQ", payload[4:16])
    ts = decode_timestamps(
        _BitReader(payload[16 : 16 + tlen]), n, legacy_v1=magic == MAGIC_V1
    )
    vals = decode_values(_BitReader(payload[16 + tlen :]), n)
    return ts, vals
