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
``np.packbits``. Decoding is BLOCK-vectorized (r3 verdict #2): the whole
payload unpacks to a bit plane once, per-position class/length tables are
computed columnar, a minimal scalar chain walk recovers only the field START
positions (each field's position depends on every previous field's length —
the one irreducibly sequential part of a prefix-coded stream), and then all
payload bits are gathered, sign-extended, and prefix-summed (cumsum for
timestamps, ``bitwise_xor.accumulate`` for values) in vectorized passes.
Legacy GOR1 payloads and the property-test reference use the original
field-at-a-time scalar decoder (``_decode_*_scalar``).
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
    # (n_codes, 64) MSB-first bit matrix in one C call; code k's emitted
    # bits are the contiguous TAIL of its row (columns [64-lens[k], 64)),
    # so a broadcast boolean mask extracts the whole plane in row-major =
    # stream order with zero index arithmetic — measured 2.2× over the
    # previous per-bit integer gather (r4; bit-identical by construction,
    # equivalence-tested). np.packbits zero-pads the final byte itself.
    bits = np.unpackbits(
        codes.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )
    mask = np.arange(64, dtype=np.int64)[None, :] >= (64 - lens)[:, None]
    return np.packbits(bits[mask]).tobytes()


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


def _dod_codes(dod: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """dod array → element-interleaved (codes, lens) of length 2·m.

    Shared by the per-chunk and batch encoders so the class decisions have
    exactly one implementation (bit-identity between the two paths is by
    construction here, then equivalence-tested end to end)."""
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
    return inter_codes, inter_lens


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
    inter_codes, inter_lens = _dod_codes((deltas[1:] - deltas[:-1]).astype(np.int64))
    return [head_codes, first, inter_codes], [head_lens, np.array([64]), inter_lens]


def _decode_timestamps_scalar(r: _BitReader, n: int, legacy_v1: bool = False) -> np.ndarray:
    # int64 wraparound on the running delta is part of the format (the
    # 64-bit escape class round-trips extreme dods through two's
    # complement; vec==scalar property tests pin it) — silence the
    # scalar-add overflow warning rather than mask real errors elsewhere
    with np.errstate(over="ignore"):
        return _decode_timestamps_scalar_inner(r, n, legacy_v1)


def _decode_timestamps_scalar_inner(r: _BitReader, n: int, legacy_v1: bool) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    # delta accumulates in int64 WITH WRAPAROUND, mirroring the vectorized
    # decoder — as a raw python int it can exceed the int64 range and blow
    # the C-long conversion on assignment (hypothesis-found: consecutive
    # escape-class dods of magnitude ~2^63)
    delta = np.int64(_unzigzag(r.read(64)))
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
        delta = delta + np.int64(dod)
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------------------
# Values: XOR with leading/trailing window reuse
# ---------------------------------------------------------------------------


def _fill_value_windows(
    hdr: np.ndarray,
    hdr_len: np.ndarray,
    pay: np.ndarray,
    pay_len: np.ndarray,
    nz: np.ndarray,
    lead_nz: np.ndarray,
    trail_nz: np.ndarray,
    x_nz: np.ndarray,
    lo: int,
    hi: int,
) -> None:
    """Window-reuse state scan over nz positions [lo, hi), vectorized per
    window SEGMENT (the state (prev_lead, prev_len) only changes at a
    violation — ``lead < L or trail < T`` — so each window is a
    find-first-violation scan over the non-zero-xor subsequence, then one
    vectorized fill for the reused run; same grow-block pattern as the
    kernel's CUSUM scan). Decisions and emitted bits are IDENTICAL to the
    original per-element loop (property-tested against it): first non-zero
    opens a window; reuse while le ≥ prev_lead and tr ≥ prev_trail.

    Shared by the per-chunk encoder (lo=0, hi=len(nz)) and the batch
    encoder (one [lo, hi) nz-range per chunk — window state never crosses
    a chunk boundary). Writes into hdr/pay at the global element indices
    held in ``nz``."""
    pos = lo
    while pos < hi:
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
        end = hi
        s = pos + 1
        block = 64
        while s < end:
            e = min(s + block, hi)
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

    hdr = np.zeros(m, dtype=np.uint64)
    hdr_len = np.ones(m, dtype=np.int64)  # '0' for xor == 0
    pay = np.zeros(m, dtype=np.uint64)
    pay_len = np.zeros(m, dtype=np.int64)
    nz = np.flatnonzero(xors)
    _fill_value_windows(
        hdr, hdr_len, pay, pay_len, nz, lead[nz], trail[nz], xors[nz], 0, len(nz)
    )

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


def _decode_values_scalar(r: _BitReader, n: int) -> np.ndarray:
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
# Vectorized block decode (GOR2 hot path)
# ---------------------------------------------------------------------------


def _gather_fields(buf: np.ndarray, pos: np.ndarray, length: np.ndarray) -> np.ndarray:
    """Vectorized unaligned bit-field read: for each (pos, 1 ≤ length ≤ 64)
    return the MSB-first ``length``-bit value starting at bit ``pos``.

    One fancy-indexed gather of 8 bytes per field viewed as big-endian
    uint64, plus the following byte to cover the worst-case 7-bit skew —
    the vector inverse of ``_pack_codes``'s scatter.  ``buf`` must carry
    ≥9 padding bytes past the last addressed field (``_padded_buf``).
    """
    b = (pos >> 3).astype(np.int64)
    o = (pos & 7).astype(np.uint64)
    v1 = buf[b[:, None] + np.arange(8)].view(">u8").ravel().astype(np.uint64)
    v2 = buf[b + 8].astype(np.uint64)
    full = (v1 << o) | (v2 >> (np.uint64(8) - o))  # o=0 → v2>>8 == 0
    return full >> (np.uint64(64) - length.astype(np.uint64))


def _padded_buf(data: bytes) -> np.ndarray:
    return np.concatenate([np.frombuffer(data, dtype=np.uint8), np.zeros(16, np.uint8)])


def _bits_val(bits: np.ndarray, pos: int, width: int) -> int:
    """Scalar ≤64-bit read from the unpacked bit plane (cold path: only
    window/class headers, a handful per run)."""
    v = 0
    for j in range(width):
        v = (v << 1) | int(bits[pos + j])
    return v


def _zero_run(bits: np.ndarray, pos: int, cap: int) -> int:
    """Length of the run of 0-bits starting at ``pos``, capped — counts
    consecutive 1-bit '0' fields in one vectorized scan (growing blocks).
    The first few bits are peeked scalar: gap-y tiers produce many short
    zero runs where one argmax-slice scan costs more than the run."""
    count = 0
    while count < min(cap, 8):
        if bits[pos + count]:
            return count
        count += 1
    block = 256
    while count < cap:
        e = min(count + block, cap)
        seg = bits[pos + count : pos + e]
        j = int(seg.argmax())  # first 1, or 0 if all-zero
        if seg[j]:
            return count + j
        count = e
        block <<= 1
    return cap


def _stride_run(bits: np.ndarray, pos: int, stride: int, cap: int, ones: int, term: bool) -> int:
    """Count consecutive fixed-``stride`` fields starting at ``pos`` whose
    header is ``ones`` 1-bits (followed by a 0-bit iff ``term``) — e.g.
    '10'+payload reuse fields (ones=1, term=True) or a dod class. The
    first field is known-valid; candidates are checked in vectorized
    growing blocks (start positions are arithmetic while the run holds).
    Candidates past the padded bit plane can't exist (padding bits are 0,
    so they'd fail the ones-check anyway) — clamp to stay indexable."""
    probe = ones + (1 if term else 0)
    cap = min(cap, (len(bits) - probe - pos) // stride + 1)
    # scalar peek at candidates 2..5: short runs exit numpy-free. Gap-y
    # rollup tiers emit many length-1..3 class runs (each missing bucket
    # is a ±gap dod pair), where one vectorized block check (~26µs:
    # arange+ones+flatnonzero) costs more than the whole run decodes for —
    # four ~1µs scalar probes before vectorizing is the break-even.
    count = 1
    while count < min(cap, 5):
        q = pos + stride * count
        good = all(bits[q + j] for j in range(ones))
        if good and term and bits[q + ones]:
            good = False
        if not good:
            return count
        count += 1
    block = 64
    while count < cap:
        e = min(count + block, cap)
        qs = pos + stride * np.arange(count, e, dtype=np.int64)
        ok = np.ones(len(qs), dtype=bool)
        for j in range(ones):
            ok &= bits[qs + j] == 1
        if term:
            ok &= bits[qs + ones] == 0
        bad = np.flatnonzero(~ok)
        if len(bad):
            return count + int(bad[0])
        count = e
        block <<= 1
    return cap


def _sign_extend(raw: np.ndarray, bits: int) -> np.ndarray:
    if bits == 64:
        return raw.view(np.int64)
    out = raw.astype(np.int64)
    return np.where(out >= 1 << (bits - 1), out - (1 << bits), out)


def _expand_runs(runs: list, with_shift: bool):
    """Expand recorded (idx, count, pos0, stride, pay[, shift]) runs into
    flat per-field (dst, pos, len[, shift]) arrays — the repeat/cumsum
    trick, so payloads for ALL runs gather in one pass regardless of how
    short individual runs were."""
    cols = list(zip(*runs))
    cnts = np.array(cols[1], dtype=np.int64)
    total = int(cnts.sum())

    def rep(vals):
        return np.repeat(np.array(vals, dtype=np.int64), cnts)

    intra = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnts) - cnts, cnts)
    dst = rep(cols[0]) + intra
    ps = rep(cols[2]) + rep(cols[3]) * intra
    lens = rep(cols[4])
    if with_shift:
        return dst, ps, lens, rep(cols[5])
    return dst, ps, lens


#: leading-ones class c → (header bits, payload bits); c=0 is the '0' field
_DOD_HDR_PAY = {1: (2, 7), 2: (3, 9), 3: (4, 12), 4: (5, 32), 5: (5, 64)}

#: the same table as parallel lookup arrays indexed by class (0..5), for
#: the batch table decoder: header bits, payload bits, total field bits
_CLS_HDR = np.array([0, 2, 3, 4, 5, 5], dtype=np.int64)
_CLS_PAY = np.array([0, 7, 9, 12, 32, 64], dtype=np.int64)
_CLS_LEN = np.array([1, 9, 12, 16, 37, 69], dtype=np.int64)


#: after this many walk iterations, re-evaluate run-collapse efficiency
_RUN_PROBE = 64
#: below this average fields-per-iteration, switch to the chain fallback
_RUN_MIN_AVG = 4.0


def _ts_chain_tail(bits: np.ndarray, pos: int, count: int) -> tuple[np.ndarray, np.ndarray]:
    """Chain-walk fallback for run-hostile dod streams (classes alternate
    every field or two, so per-run vector overhead loses): per-position
    class/length tables are built columnar over the remaining plane, the
    walk is a plain list-indexed position chase, and (starts, classes)
    come back as arrays for the same columnar payload extraction."""
    nb = len(bits)
    pad = np.concatenate([bits, np.zeros(5, np.uint8)]).astype(np.int64)
    ones = [pad[j : j + nb] for j in range(5)]  # ones[j][p] == bits[p+j]
    cls_at = (
        ones[0]
        + ones[0] * ones[1]
        + ones[0] * ones[1] * ones[2]
        + ones[0] * ones[1] * ones[2] * ones[3]
        + ones[0] * ones[1] * ones[2] * ones[3] * ones[4]
    )
    len_at = np.array([1, 9, 12, 16, 37, 69], dtype=np.int64)[cls_at]
    lens = len_at.tolist()
    starts = []
    append = starts.append
    for _ in range(count):
        append(pos)
        pos += lens[pos]
    starts = np.array(starts, dtype=np.int64)
    return starts, cls_at[starts]


def _decode_timestamps_vec(data: bytes, n: int) -> np.ndarray:
    """Run-collapsing block decode: the stream is walked RUN by run, not
    field by field — a run of dod=0 fields is one vectorized zero-scan, a
    run of same-class fields has arithmetic start positions checked in one
    vectorized pass. Rollup-tier timestamps are near-regular (dod≈0), so
    the walk does O(#irregularities) Python iterations for n fields, then
    payloads gather + sign-extend + double-cumsum columnar. Streams where
    classes flip every field or two (runs don't pay) are detected after
    ``_RUN_PROBE`` iterations and finish on the chain-walk fallback."""
    out = np.empty(n, dtype=np.int64)
    head = int.from_bytes(data[0:8], "big")
    out[0] = head - (1 << 64) if head >= 1 << 63 else head
    if n == 1:
        return out
    first_delta = _unzigzag(int.from_bytes(data[8:16], "big"))
    if n == 2:
        out[1] = out[0] + first_delta
        return out
    m = n - 2
    buf = _padded_buf(data)
    bits = np.unpackbits(buf)
    dod = np.zeros(m, dtype=np.int64)
    pos = 128
    i = 0
    iters = 0
    runs = []  # (field_idx, count, payload_pos0, stride, pay_bits)
    chain: tuple[np.ndarray, np.ndarray] | None = None
    while i < m:
        iters += 1
        if iters > _RUN_PROBE and i / iters < _RUN_MIN_AVG:
            chain = (_ts_chain_tail(bits, pos, m - i), i)
            break
        if bits[pos] == 0:
            k = _zero_run(bits, pos, m - i)
            pos += k
            i += k
            continue
        c = 1
        while c < 5 and bits[pos + c]:
            c += 1
        hdr, pay = _DOD_HDR_PAY[c]
        stride = hdr + pay
        cnt = _stride_run(bits, pos, stride, m - i, ones=c, term=c < 5)
        runs.append((i, cnt, pos + hdr, stride, pay))
        pos += stride * cnt
        i += cnt
    if runs:
        dst, ps, lens = _expand_runs(runs, with_shift=False)
        raw = _gather_fields(buf, ps, lens)
        for _c, (_hdr, pay) in _DOD_HDR_PAY.items():
            sel = lens == pay
            if sel.any():
                dod[dst[sel]] = _sign_extend(raw[sel], pay)
    if chain is not None:
        (starts, cls), i0 = chain
        for c, (hdr, pay) in _DOD_HDR_PAY.items():
            sel = np.flatnonzero(cls == c)
            if len(sel) == 0:
                continue
            raw = _gather_fields(buf, starts[sel] + hdr, np.full(len(sel), pay, np.int64))
            dod[i0 + sel] = _sign_extend(raw, pay)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = first_delta
    np.cumsum(dod, out=deltas[1:])
    deltas[1:] += first_delta
    np.cumsum(deltas, out=out[1:])
    out[1:] += out[0]
    return out


def _decode_values_vec(data: bytes, n: int) -> np.ndarray:
    """Run-collapsing block decode of the XOR stream. Gorilla windows are
    long-lived (the reuse condition only tightens at a violation), so the
    stream is dominated by fixed-stride '10'+payload runs and '0' repeats —
    both collapse to one vectorized scan each; '11' window headers are the
    only per-field scalar work. Payloads then gather in one pass and the
    values materialize via ``bitwise_xor.accumulate``."""
    head = int.from_bytes(data[0:8], "big")
    if n == 1:
        return np.array([head], dtype=np.uint64).view(np.float64)
    m = n - 1
    buf = _padded_buf(data)
    bits = np.unpackbits(buf)
    pos = 64
    i = 0
    lead = length = 0
    runs = []  # (field_idx, count, payload_pos0, stride, pay_bits, lshift)
    while i < m:
        if bits[pos] == 0:
            k = _zero_run(bits, pos, m - i)
            pos += k
            i += k
            continue
        if bits[pos + 1]:  # '11' — new window header (scalar, rare)
            lead = _bits_val(bits, pos + 2, 5)
            length = _bits_val(bits, pos + 7, 6) + 1
            runs.append((i, 1, pos + 13, 0, length, 64 - lead - length))
            pos += 13 + length
            i += 1
            continue
        stride = 2 + length  # '10' reuse run — arithmetic starts
        cnt = _stride_run(bits, pos, stride, m - i, ones=1, term=True)
        runs.append((i, cnt, pos + 2, stride, length, 64 - lead - length))
        pos += stride * cnt
        i += cnt
    xors = np.zeros(m, dtype=np.uint64)
    if runs:
        dst, ps, lens, shf = _expand_runs(runs, with_shift=True)
        raw = _gather_fields(buf, ps, lens)
        xors[dst] = raw << shf.astype(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = head
    out[1:] = xors
    return np.bitwise_xor.accumulate(out).view(np.float64)


# ---------------------------------------------------------------------------
# Chunk container
# ---------------------------------------------------------------------------


def encode_chunk(ts: np.ndarray, values: np.ndarray) -> bytes:
    """(int64 seconds, float64 values) → self-describing binary payload.

    Validation raises (never ``assert`` — stripped under ``python -O``,
    and executors may run optimized). n=0 encodes to a bare header that
    ``decode_chunk`` round-trips to empty arrays."""
    if len(ts) != len(values):
        raise ValueError(f"length mismatch: {len(ts)} timestamps vs {len(values)} values")
    if len(ts) == 0:
        return MAGIC + struct.pack("<IQ", 0, 0)
    t_codes, t_lens = _encode_timestamps_codes(np.asarray(ts))
    tbytes = _pack_codes(t_codes, t_lens)
    v_codes, v_lens = _encode_values_codes(np.asarray(values))
    vbytes = _pack_codes(v_codes, v_lens)
    header = MAGIC + struct.pack("<IQ", len(ts), len(tbytes))
    return header + tbytes + vbytes


def encode_chunks(ts: np.ndarray, values: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Batch ``encode_chunk`` over k chunks stored FLAT with boundary
    offsets (chunk c is ``[offsets[c], offsets[c+1])``) — byte-identical
    payload per chunk (equivalence- and hypothesis-tested).

    Why this exists: ``encode_chunk``'s cost at tier-sized chunks is fixed
    per-chunk numpy-call overhead, not arithmetic — measured 393k pts/s
    per thread at 240-point chunks vs 1.14M at 2400-point. Here every
    elementwise pass (delta/dod classes, XOR lead/trail) runs ONCE over
    the flat arrays with inter-chunk positions masked out, and ALL chunks'
    variable-length codes are packed in a single bit-plane pass: each
    chunk's timestamp and value sections are padded to a byte boundary
    in-stream — exactly the zero padding ``np.packbits`` adds per section
    when a chunk is packed alone — so slicing the one global byte buffer
    reproduces each per-chunk buffer byte-for-byte. The only per-chunk
    work left is the value window-reuse scan (sequential by construction;
    the helper is SHARED with ``encode_chunk``, so decisions cannot
    diverge) and slice assembly. Same flat-array+offsets pattern as the
    quantile digest compression (operators/quantile)."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_total = len(ts)
    if len(values) != n_total:
        raise ValueError(f"length mismatch: {n_total} timestamps vs {len(values)} values")
    k = len(offsets) - 1
    if k < 0 or offsets[0] != 0 or offsets[-1] != n_total or (np.diff(offsets) < 0).any():
        raise ValueError("offsets must be monotone with offsets[0]=0, offsets[-1]=len(ts)")
    ns = np.diff(offsets)
    starts = offsets[:-1]
    nonempty = ns > 0
    cid = np.repeat(np.arange(k, dtype=np.int64), ns)

    # --- timestamp sections: head (64b) + zigzag first delta (64b, n≥2)
    # + interleaved dod class codes (n≥3). dod positions are valid only
    # where three consecutive flat elements share a chunk.
    heads_t = np.zeros(k, dtype=np.uint64)
    heads_t[nonempty] = ts[starts[nonempty]].view(np.uint64)
    firsts = np.zeros(k, dtype=np.uint64)
    has2 = ns >= 2
    if has2.any():
        s2 = starts[has2]
        firsts[has2] = _zigzag(ts[s2 + 1] - ts[s2])
    m_per = np.maximum(ns - 2, 0)
    im = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(m_per, out=im[1:])
    m_dod = int(im[-1])
    if m_dod:
        d = ts[1:] - ts[:-1]  # cross-chunk positions masked out below
        dodv = cid[2:] == cid[:-2]
        it_codes, it_lens = _dod_codes((d[1:] - d[:-1])[dodv].astype(np.int64))
    else:
        it_codes = np.empty(0, dtype=np.uint64)
        it_lens = np.empty(0, dtype=np.int64)
    it_cs = np.zeros(2 * m_dod + 1, dtype=np.int64)
    np.cumsum(it_lens, out=it_cs[1:])
    t_bits = 64 * nonempty + 64 * has2 + (it_cs[2 * im[1:]] - it_cs[2 * im[:-1]])
    t_pad = (-t_bits) % 8
    tbytes_len = (t_bits + t_pad) // 8

    # --- value sections: head (64b) + interleaved XOR hdr/payload codes.
    # Window state resets per chunk: one _fill_value_windows range each.
    x_per = np.maximum(ns - 1, 0)
    xm = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(x_per, out=xm[1:])
    m_x = int(xm[-1])
    vb = values.view(np.uint64)
    heads_v = np.zeros(k, dtype=np.uint64)
    heads_v[nonempty] = vb[starts[nonempty]]
    if m_x:
        xors = (vb[1:] ^ vb[:-1])[cid[1:] == cid[:-1]]
        bl = _bit_length_u64(xors)
        lead = np.minimum(64 - bl, 31)
        trail = _bit_length_u64(xors & (~xors + _ONE)) - 1
        vhdr = np.zeros(m_x, dtype=np.uint64)
        vhdr_len = np.ones(m_x, dtype=np.int64)
        vpay = np.zeros(m_x, dtype=np.uint64)
        vpay_len = np.zeros(m_x, dtype=np.int64)
        nz = np.flatnonzero(xors)
        lead_nz, trail_nz, x_nz = lead[nz], trail[nz], xors[nz]
        nzoff = np.searchsorted(nz, xm)
        for c in range(k):
            lo, hi = int(nzoff[c]), int(nzoff[c + 1])
            if lo < hi:
                _fill_value_windows(
                    vhdr, vhdr_len, vpay, vpay_len, nz, lead_nz, trail_nz, x_nz, lo, hi
                )
        iv_codes = np.empty(2 * m_x, dtype=np.uint64)
        iv_lens = np.empty(2 * m_x, dtype=np.int64)
        iv_codes[0::2] = vhdr
        iv_lens[0::2] = vhdr_len
        iv_codes[1::2] = vpay
        iv_lens[1::2] = vpay_len
    else:
        iv_codes = np.empty(0, dtype=np.uint64)
        iv_lens = np.empty(0, dtype=np.int64)
    iv_cs = np.zeros(2 * m_x + 1, dtype=np.int64)
    np.cumsum(iv_lens, out=iv_cs[1:])
    v_bits = 64 * nonempty + (iv_cs[2 * xm[1:]] - iv_cs[2 * xm[:-1]])
    v_pad = (-v_bits) % 8
    vbytes_len = (v_bits + v_pad) // 8

    # --- pack chunk-ordered segments with in-stream pads, in groups of
    # ~PACK_BLOCK codes: one giant pack call builds >8-byte-per-code
    # intermediates (bit matrix + mask) that fall out of cache and run
    # ~3× slower per point than the per-chunk calls it replaced; group
    # boundaries sit between chunks, which end byte-aligned, so the
    # grouped packs concatenate to the identical stream.
    PACK_BLOCK = 32768
    zpad = np.zeros(1, dtype=np.uint64)
    one64 = np.array([64], dtype=np.int64)
    parts: list[bytes] = []
    segs_c: list = []
    segs_l: list = []
    pending = 0
    ns_l = ns.tolist()
    tpad_l = t_pad.tolist()
    vpad_l = v_pad.tolist()
    for c in range(k):
        n = ns_l[c]
        if n == 0:
            continue
        segs_c.append(heads_t[c : c + 1])
        segs_l.append(one64)
        if n >= 2:
            segs_c.append(firsts[c : c + 1])
            segs_l.append(one64)
            if n >= 3:
                segs_c.append(it_codes[2 * im[c] : 2 * im[c + 1]])
                segs_l.append(it_lens[2 * im[c] : 2 * im[c + 1]])
        segs_c.append(zpad)
        segs_l.append(np.array([tpad_l[c]], dtype=np.int64))
        segs_c.append(heads_v[c : c + 1])
        segs_l.append(one64)
        if n >= 2:
            segs_c.append(iv_codes[2 * xm[c] : 2 * xm[c + 1]])
            segs_l.append(iv_lens[2 * xm[c] : 2 * xm[c + 1]])
        segs_c.append(zpad)
        segs_l.append(np.array([vpad_l[c]], dtype=np.int64))
        pending += 4 + 3 * n  # upper bound on codes added for this chunk
        if pending >= PACK_BLOCK:
            parts.append(_pack_codes(segs_c, segs_l))
            segs_c, segs_l, pending = [], [], 0
    if segs_c:
        parts.append(_pack_codes(segs_c, segs_l))
    buf = b"".join(parts)

    out: list[bytes] = []
    bo = 0
    tb_l = tbytes_len.tolist()
    vbl_l = vbytes_len.tolist()
    empty_hdr = MAGIC + struct.pack("<IQ", 0, 0)
    for c in range(k):
        n = ns_l[c]
        if n == 0:
            out.append(empty_hdr)
            continue
        size = tb_l[c] + vbl_l[c]
        out.append(MAGIC + struct.pack("<IQ", n, tb_l[c]) + buf[bo : bo + size])
        bo += size
    return out


def decode_chunk(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    magic = payload[:4]
    if magic not in (MAGIC, MAGIC_V1):
        raise ValueError(f"not a Gorilla chunk (magic {magic!r})")
    n, tlen = struct.unpack("<IQ", payload[4:16])
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    tseg, vseg = payload[16 : 16 + tlen], payload[16 + tlen :]
    if magic == MAGIC_V1:  # legacy stream: scalar decoder understands it
        return (
            _decode_timestamps_scalar(_BitReader(tseg), n, legacy_v1=True),
            _decode_values_scalar(_BitReader(vseg), n),
        )
    return _decode_timestamps_vec(tseg, n), _decode_values_vec(vseg, n)


def _intra(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated — the arange-minus-repeat trick."""
    total = int(counts.sum())
    return np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(counts) - counts, counts)


def decode_chunks(payloads) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch ``decode_chunk`` over a sequence of payloads → flat
    ``(timestamps, values, offsets)`` with chunk c occupying
    ``[offsets[c], offsets[c+1])`` — value-identical to per-chunk decode
    (adversarial + hypothesis equivalence suites).

    Why this exists, and why the timestamp side changes ALGORITHM: at
    tier-sized chunks the per-chunk decoder is walk-bound — gap-y rollup
    tiers emit a ±dod class pair per missing bucket, so the run-collapsing
    walk does O(#gaps) numpy-backed iterations per chunk (measured 170k
    pts/s/thread at 234-point 15%-gap chunks vs 1.8M on one huge chunk).
    Here the dod stream is decoded with NO sequential walk at all:

    1. every chunk's timestamp section concatenates into ONE bit plane
       (sections are byte-aligned, so positions are exact);
    2. a class table is built columnar over the whole plane — ``cls_at[p]``
       / ``len_at[p]`` = the field class/length IF a field started at bit
       p (the ``_ts_chain_tail`` construction, globalized);
    3. all field start positions materialize by POINTER DOUBLING on the
       jump array ``J[p] = p + len_at[p]``: level k emits fields
       [2^k, 2^{k+1}) of every chunk from the already-known first 2^k via
       one gather through the 2^k-step jump table (``J = J[J]`` per
       level) — ceil(log2(max fields/chunk)) vectorized passes, hostile
       streams cost the same as regular ones;
    4. payloads for ALL chunks gather in one ``_gather_fields`` pass and
       timestamps rebuild with segmented (boundary-subtracted) cumsums.

    The value sections keep the per-chunk run walk (field length depends
    on live window state, so no position-indexed table exists), but all
    chunks' runs accumulate into ONE list → one ``_expand_runs`` + one
    gather + one segmented ``bitwise_xor.accumulate`` (the per-chunk
    correction term is the accumulated value at each chunk's last
    predecessor position). Legacy GOR1 payloads fall back to the scalar
    per-chunk decoder and splice into the output by offset."""
    k = len(payloads)
    ns = np.zeros(k, dtype=np.int64)
    tlens = np.zeros(k, dtype=np.int64)
    legacy: list[int] = []
    for c, p in enumerate(payloads):
        magic = p[:4]
        if magic not in (MAGIC, MAGIC_V1):
            raise ValueError(f"not a Gorilla chunk (magic {magic!r})")
        n, tlen = struct.unpack("<IQ", p[4:16])
        ns[c] = n
        tlens[c] = tlen
        if magic == MAGIC_V1 and n > 0:
            legacy.append(c)
    out_off = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(ns, out=out_off[1:])
    n_total = int(out_off[-1])
    ts_out = np.empty(n_total, dtype=np.int64)
    val_out = np.empty(n_total, dtype=np.float64)
    offsets = out_off

    is_legacy = np.zeros(k, dtype=bool)
    is_legacy[legacy] = True
    bi = np.flatnonzero((ns > 0) & ~is_legacy)  # batch (GOR2, non-empty)
    for c in legacy:
        t, v = decode_chunk(payloads[c])
        ts_out[out_off[c] : out_off[c + 1]] = t
        val_out[out_off[c] : out_off[c + 1]] = v
    if len(bi) == 0:
        return ts_out, val_out, offsets

    ns_b = ns[bi]
    tlens_b = tlens[bi]
    vlens_b = np.array([len(payloads[c]) for c in bi], dtype=np.int64) - 16 - tlens_b
    kb = len(bi)
    ob = out_off[bi]  # output start per batch chunk

    # --- timestamp plane -------------------------------------------------
    ts_buf = _padded_buf(b"".join(bytes(payloads[c][16 : 16 + tlens[c]]) for c in bi))
    tb_off = np.zeros(kb, dtype=np.int64)
    np.cumsum(tlens_b[:-1] * 8, out=tb_off[1:])
    full64 = np.full(kb, 64, dtype=np.int64)
    heads = _sign_extend(_gather_fields(ts_buf, tb_off, full64), 64)
    firstd = np.zeros(kb, dtype=np.int64)
    n2 = ns_b >= 2
    if n2.any():
        zz = _gather_fields(ts_buf, tb_off[n2] + 64, full64[n2])
        firstd[n2] = (zz >> _ONE).astype(np.int64) ^ -(zz & _ONE).astype(np.int64)

    m_per = np.maximum(ns_b - 2, 0)
    M = int(m_per.sum())
    im = np.zeros(kb + 1, dtype=np.int64)
    np.cumsum(m_per, out=im[1:])
    dod = np.zeros(M, dtype=np.int64)
    if M:
        bits = np.unpackbits(ts_buf)
        nb = len(bits)
        idt = np.int32 if nb + 70 < np.iinfo(np.int32).max else np.int64
        pad = np.concatenate([bits, np.zeros(5, np.uint8)])
        o0, o1, o2, o3, o4 = (pad[j : j + nb] for j in range(5))
        p01 = o0 * o1
        p012 = p01 * o2
        cls_at = o0 + p01 + p012 + p012 * o3 + p012 * o3 * o4  # uint8, 0..5
        jump = np.arange(nb, dtype=idt)
        jump += _CLS_LEN.astype(idt)[cls_at]
        np.minimum(jump, nb - 1, out=jump)  # clamp garbage chains in-bounds
        starts = np.empty(M, dtype=idt)
        has = m_per > 0
        starts[im[:-1][has]] = (tb_off[has] + 128).astype(idt)
        filled = np.minimum(m_per, 1)
        while True:
            todo = m_per - filled
            if not todo.any():
                break
            t = np.minimum(filled, todo)
            src = np.repeat(im[:-1], t) + _intra(t)
            starts[src + np.repeat(filled, t)] = jump[starts[src]]
            filled = filled + t
            if (m_per - filled).any():
                jump = jump[jump]  # double the stride for the next level
        cls = cls_at[starts]
        nzf = np.flatnonzero(cls)
        if len(nzf):
            cl = cls[nzf].astype(np.int64)
            raw = _gather_fields(
                ts_buf, starts[nzf].astype(np.int64) + _CLS_HDR[cl], _CLS_PAY[cl]
            )
            for c in range(1, 6):
                sel = cl == c
                if sel.any():
                    dod[nzf[sel]] = _sign_extend(raw[sel], int(_CLS_PAY[c]))

    # segmented double cumsum: dod → deltas → timestamps, per chunk, via
    # boundary subtraction (int64 wrap-around is modular, so global
    # cumsums minus the chunk-start prefix equal per-chunk cumsums bit
    # for bit — the same wrap semantics as the per-chunk decoder)
    dcnt = ns_b - 1  # ≥0; deltas per chunk
    D = int(dcnt.sum())
    doff = np.zeros(kb + 1, dtype=np.int64)
    np.cumsum(dcnt, out=doff[1:])
    S = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(dod, out=S[1:])
    cum_within = S[1:] - np.repeat(S[im[:-1]], m_per)
    deltas = np.repeat(firstd, dcnt)
    intra_d = _intra(dcnt)
    deltas[intra_d > 0] += cum_within
    T = np.zeros(D + 1, dtype=np.int64)
    np.cumsum(deltas, out=T[1:])
    ts_within = (T[1:] - np.repeat(T[doff[:-1]], dcnt)) + np.repeat(heads, dcnt)
    ts_out[ob] = heads
    ts_out[np.repeat(ob + 1, dcnt) + intra_d] = ts_within

    # --- value plane ------------------------------------------------------
    v_buf = _padded_buf(b"".join(bytes(payloads[c][16 + tlens[c] :]) for c in bi))
    vb_off = np.zeros(kb, dtype=np.int64)
    np.cumsum(vlens_b[:-1] * 8, out=vb_off[1:])
    v_heads = _gather_fields(v_buf, vb_off, full64)
    xcnt = ns_b - 1
    X = int(xcnt.sum())
    xm = np.zeros(kb + 1, dtype=np.int64)
    np.cumsum(xcnt, out=xm[1:])
    xors = np.zeros(X, dtype=np.uint64)
    if X:
        bits_v = np.unpackbits(v_buf)
        runs = []  # (global_field_idx, count, payload_pos0, stride, pay_bits, lshift)
        xm_l = xm.tolist()
        vb_l = vb_off.tolist()
        xc_l = xcnt.tolist()
        for c in range(kb):
            m = xc_l[c]
            pos = vb_l[c] + 64
            base = xm_l[c]
            i = 0
            lead = length = 0
            while i < m:
                if bits_v[pos] == 0:
                    z = _zero_run(bits_v, pos, m - i)
                    pos += z
                    i += z
                    continue
                if bits_v[pos + 1]:  # '11' — new window header
                    lead = _bits_val(bits_v, pos + 2, 5)
                    length = _bits_val(bits_v, pos + 7, 6) + 1
                    runs.append((base + i, 1, pos + 13, 0, length, 64 - lead - length))
                    pos += 13 + length
                    i += 1
                    continue
                stride = 2 + length
                cnt = _stride_run(bits_v, pos, stride, m - i, ones=1, term=True)
                runs.append((base + i, cnt, pos + 2, stride, length, 64 - lead - length))
                pos += stride * cnt
                i += cnt
        if runs:
            dst, ps, lens, shf = _expand_runs(runs, with_shift=True)
            raw = _gather_fields(v_buf, ps, lens)
            xors[dst] = raw << shf.astype(np.uint64)
    # segmented XOR accumulate: place each chunk head at its first slot,
    # run ONE global accumulate, then cancel the cross-chunk prefix by
    # XORing every chunk with the accumulated value just before its start
    nbt = int(ns_b.sum())
    boff = np.zeros(kb + 1, dtype=np.int64)
    np.cumsum(ns_b, out=boff[1:])
    A = np.zeros(nbt, dtype=np.uint64)
    A[boff[:-1]] = v_heads
    if X:
        A[np.repeat(boff[:-1] + 1, xcnt) + _intra(xcnt)] = xors
    G = np.bitwise_xor.accumulate(A)
    corr = np.zeros(kb, dtype=np.uint64)
    nz0 = boff[:-1] > 0
    corr[nz0] = G[boff[:-1][nz0] - 1]
    vals_b = (G ^ np.repeat(corr, ns_b)).view(np.float64)
    val_out[np.repeat(ob, ns_b) + _intra(ns_b)] = vals_b
    return ts_out, val_out, offsets


def decode_chunk_scalar(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Field-at-a-time reference decoder (any magic) — the property-test
    cross-check for the vectorized hot path."""
    magic = payload[:4]
    if magic not in (MAGIC, MAGIC_V1):
        raise ValueError(f"not a Gorilla chunk (magic {magic!r})")
    n, tlen = struct.unpack("<IQ", payload[4:16])
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ts = _decode_timestamps_scalar(
        _BitReader(payload[16 : 16 + tlen]), n, legacy_v1=magic == MAGIC_V1
    )
    vals = _decode_values_scalar(_BitReader(payload[16 + tlen :]), n)
    return ts, vals
