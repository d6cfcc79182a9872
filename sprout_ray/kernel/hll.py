"""HyperLogLog cardinality sketch (Flajolet, Fusy, Gandouet, Meunier 2007).

Not present in the reference (required by BASELINE.json north_rule). Uses a
64-bit murmur3 hash (same kernel as the Bloom filters, seed 0), so the
large-range correction of the original 32-bit paper is unnecessary (the
HyperLogLog++ observation, Heule et al. 2013); the small-range linear-counting
correction is kept.

State: ``2^p`` uint8 registers; update = elementwise max (vectorized
``np.maximum.at``); merge = elementwise max — associative, commutative,
idempotent. Published bound: relative standard error ``~= 1.04 / sqrt(2^p)``.
"""

from __future__ import annotations

import json
import math

import numpy as np

from .bloom import _as_matrix
from .murmur3 import murmur3_64_padded


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 14):
        if not (4 <= p <= 18):
            raise ValueError("precision p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_batch(self, keys) -> None:
        mat, lengths = _as_matrix(keys)
        if mat.shape[0] == 0:
            return
        h = murmur3_64_padded(mat, lengths, 0)
        idx = h >> np.uint64(64 - self.p)  # uint64 indexing; int64 cast is slow
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of `rest` + 1, capped at 64-p+1 (rest == 0)
        # Compute leading zeros via float64 exponent trick is lossy; use a
        # bit-length approach on the right-aligned value instead.
        w = h & ((np.uint64(1) << np.uint64(64 - self.p)) - np.uint64(1))
        rank = np.empty(len(h), dtype=np.uint8)
        nz = w != 0
        # bit_length via log2 is unsafe near 2^53; use successive shifts
        bl = _bit_length_u64(w[nz])
        rank[nz] = (64 - self.p + 1) - bl
        rank[~nz] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, rank)
        del rest

    def merge(self, other: "HyperLogLog") -> None:
        if self.p != other.p:
            raise ValueError("HLL precision mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = self.m
        est = _alpha(m) * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)
        return float(est)

    def result(self) -> float:
        return self.estimate()

    def rel_std_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        meta = json.dumps({"kind": "hll", "p": self.p}).encode()
        return len(meta).to_bytes(4, "little") + meta + self.registers.tobytes()

    def merge_bytes(self, buf: bytes) -> None:
        """Merge a serialized partial via a read-only view (no materialize)."""
        mlen = int.from_bytes(buf[:4], "little")
        meta = json.loads(buf[4 : 4 + mlen].decode())
        if meta["kind"] != "hll" or meta["p"] != self.p:
            raise ValueError(f"partial spec mismatch: {meta}")
        view = np.frombuffer(buf, dtype=np.uint8, offset=4 + mlen)
        np.maximum(self.registers, view, out=self.registers)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        mlen = int.from_bytes(buf[:4], "little")
        meta = json.loads(buf[4 : 4 + mlen].decode())
        h = cls(p=meta["p"])
        h.registers = np.frombuffer(buf[4 + mlen :], dtype=np.uint8).copy()
        return h


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for nonzero uint64 values."""
    out = np.zeros(x.shape, dtype=np.uint8)
    x = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = x >= (np.uint64(1) << s)
        out[big] += np.uint8(shift)
        x[big] >>= s
    out += (x != 0).astype(np.uint8)
    return out
