"""Gorilla-style time-series compression (pure Python/NumPy, no deps).

Implements the two codecs from Facebook's Gorilla paper (Pelkonen et al.,
VLDB 2015, public):

* timestamps — delta-of-delta with the paper's variable-length buckets
  ('0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+32b),
* float64 values — XOR with leading/trailing-zero window reuse
  ('0' same | '10' reuse window | '11' + 5b leading + 6b length + bits).

New code (the reference repo has no compression layer); used by the rollup
retention tiers to store points as `binary`. Encode/decode are exact
(bit-roundtrip) for any float64 incl. NaN; timestamps are int64 seconds.

This runs inside Arrow-grouped pandas UDFs (see ``compress_rollup``), i.e.
executor-side Python over whole chunks — the right trade: the bit-packing is
O(n) per chunk, amortized over Arrow batches, and the payload it produces is
what actually ships to long-term storage.
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_timestamps(ts: np.ndarray, w: _BitWriter) -> None:
    ts = np.asarray(ts, dtype=np.int64)
    w.write(int(ts[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    if len(ts) == 1:
        return
    first_delta = int(ts[1]) - int(ts[0])
    w.write(_zigzag(first_delta) & 0xFFFFFFFFFFFFFFFF, 64)
    prev_delta = first_delta
    deltas = np.diff(ts)
    for d in deltas[1:]:
        dod = int(d) - prev_delta
        prev_delta = int(d)
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod & 0x7F, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod & 0x1FF, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod & 0xFFF, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & 0xFFFFFFFF, 32)


def decode_timestamps(r: _BitReader, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out[0] = first
    if n == 1:
        return out
    fd = r.read(64)
    if fd >= 1 << 63:
        fd -= 1 << 64
    delta = _unzigzag(fd)
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
            else:
                bits, dod = 32, r.read(32)
            if dod >= 1 << (bits - 1):
                dod -= 1 << bits
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_values(values: np.ndarray, w: _BitWriter) -> None:
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    prev = int(bits[0])
    w.write(prev, 64)
    prev_lead, prev_len = -1, 0
    for v in bits[1:]:
        v = int(v)
        x = prev ^ v
        prev = v
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        if lead > 31:
            lead = 31
        if prev_lead != -1 and lead >= prev_lead and trail >= 64 - prev_lead - prev_len:
            w.write(0b10, 2)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            length = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(length - 1, 6)  # length in 1..64 stored as 0..63
            w.write(x >> trail, length)
            prev_lead, prev_len = lead, length


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
            bits = r.read(length)
            x = bits << (64 - lead - length)
        else:
            lead = r.read(5)
            length = r.read(6) + 1
            bits = r.read(length)
            x = bits << (64 - lead - length)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


MAGIC = b"GOR1"


def encode_chunk(ts: np.ndarray, values: np.ndarray) -> bytes:
    """(int64 seconds, float64 values) → self-describing binary payload."""
    assert len(ts) == len(values)
    w = _BitWriter()
    encode_timestamps(ts, w)
    tbytes = w.getvalue()
    w2 = _BitWriter()
    encode_values(values, w2)
    vbytes = w2.getvalue()
    header = MAGIC + struct.pack("<IQ", len(ts), len(tbytes))
    return header + tbytes + vbytes


def decode_chunk(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    assert payload[:4] == MAGIC, "bad magic"
    n, tlen = struct.unpack("<IQ", payload[4:16])
    ts = decode_timestamps(_BitReader(payload[16 : 16 + tlen]), n)
    vals = decode_values(_BitReader(payload[16 + tlen :]), n)
    return ts, vals
