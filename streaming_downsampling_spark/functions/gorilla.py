"""Gorilla time-series compression: delta-of-delta timestamps + XOR floats.

Public algorithm from Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database" (VLDB 2015), §4.1.  The reference repo has no
compression at all (its Kafka payloads are gzip JSON,
/root/reference/core/streaming_pipeline.py:172-180); the north rule requires
Gorilla/delta-of-delta chunk compression for the retention tiers, so this is
new machinery, bit-compatible round-trip tested (float64 bit-pattern
equality).

Encoding runs once per (conv_id, window) chunk inside ``applyInPandas`` —
chunks are bounded (one retention window), so the per-value Python loop here
is over at most a few thousand points per Arrow batch group, outside the
per-row Spark path.  Deviations from the paper, chosen for µs-resolution
int64 timestamps: first delta is 64-bit, and the final delta-of-delta bucket
is 64-bit (paper: 14-bit first delta / 32-bit bucket).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
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
        self.pos = 0

    def read(self, nbits: int) -> int:
        # word-based extraction: grab the covering byte span in one
        # int.from_bytes, then shift/mask — ~10× faster than per-bit loops
        pos = self.pos
        end = pos + nbits
        first, last = pos >> 3, (end + 7) >> 3
        word = int.from_bytes(self.data[first:last], "big")
        shift = (last << 3) - end
        self.pos = end
        return (word >> shift) & ((1 << nbits) - 1)


_DOD_BUCKETS = (
    # (control value, control bits, payload bits, lo, hi) — Gorilla §4.1.1
    (0b10, 2, 7, -63, 64),
    (0b110, 3, 9, -255, 256),
    (0b1110, 4, 12, -2047, 2048),
)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (µs)."""
    ts = np.asarray(ts, dtype=np.int64)
    w = _BitWriter()
    w.write(len(ts), 32)
    if len(ts) == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if len(ts) == 1:
        return w.getvalue()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
            continue
        for ctrl, cbits, pbits, lo, hi in _DOD_BUCKETS:
            if lo <= dod <= hi:
                w.write(ctrl, cbits)
                w.write(dod - lo, pbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.getvalue()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    out[0] = np.int64(np.uint64(first))
    if n == 1:
        return out
    delta = r.read(64)
    delta = delta - (1 << 64) if delta >= (1 << 63) else delta
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:  # '10'
                dod = r.read(7) - 63
            elif r.read(1) == 0:  # '110'
                dod = r.read(9) - 255
            elif r.read(1) == 0:  # '1110'
                dod = r.read(12) - 2047
            else:  # '1111'
                dod = r.read(64)
                dod = dod - (1 << 64) if dod >= (1 << 63) else dod
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode float64 values (§4.1.2).

    Leading/trailing-zero counts are precomputed vectorized; the control-bit
    stream is sequential by construction.
    """
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    w.write(len(bits), 32)
    if len(bits) == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    if len(bits) == 1:
        return w.getvalue()
    xors = bits[1:] ^ bits[:-1]
    xl = xors.tolist()
    prev_lead, prev_trail = -1, -1
    for x in xl:
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        if lead > 31:  # 5-bit leading-zeros field caps at 31 (paper)
            lead = 31
        trail = (x & -x).bit_length() - 1
        sig = 64 - lead - trail
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= prev_trail
        ):
            w.write(0b10, 2)
            w.write(x >> prev_trail, 64 - prev_lead - prev_trail)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(sig - 1, 6)  # store sig-1 so 64 fits in 6 bits
            w.write(x >> trail, sig)
            prev_lead, prev_trail = lead, trail
    return w.getvalue()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, trail, sig = 0, 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 1:  # '11' new window
            lead = r.read(5)
            sig = r.read(6) + 1
            trail = 64 - lead - sig
        x = r.read(sig) << trail
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def encode_chunk(ts: np.ndarray, values: np.ndarray) -> tuple[bytes, bytes]:
    return encode_timestamps(ts), encode_values(values)


def decode_chunk(ts_blob: bytes, val_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    return decode_timestamps(ts_blob), decode_values(val_blob)
