"""MurmurHash3 x64-128 (h1 half), matching the reference's hash exactly.

The reference (``/root/reference/pkg/murmur/murmur3.go:10-139``) reimplements
Austin Appleby's public-domain MurmurHash3 x64-128 and returns only ``h1``.
Probe layout parity with the reference requires bit-exact agreement, including
its little-endian 16-byte block reads (murmur3.go:24, an unsafe cast on a
little-endian platform).

Two implementations are provided:

- :func:`murmur3_64` — scalar, pure-Python-int port. The readable reference;
  used in tests and for one-off hashing.
- :func:`murmur3_64_batch` — numpy-vectorized over a whole column of keys
  (zero-copy from an Arrow string/binary array's data+offsets buffers). This
  is the hot path used by every sketch's ``update_batch``.

Both are cross-checked against each other and against frozen fixture vectors
in ``tests/test_murmur3.py``.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

_NC1 = np.uint64(_C1)
_NC2 = np.uint64(_C2)
_N5 = np.uint64(5)
_NA1 = np.uint64(0x52DCE729)
_NA2 = np.uint64(0x38495AB5)
_N64 = np.uint64(64)
_FM1 = np.uint64(0xFF51AFD7ED558CCD)
_FM2 = np.uint64(0xC4CEB9FE1A85EC53)
_N33 = np.uint64(33)


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_64(key: bytes, seed: int) -> int:
    """Scalar MurmurHash3 x64-128, h1 half, as an unsigned 64-bit int."""
    length = len(key)
    nblocks = length // 16

    h1 = seed & _M64
    h2 = seed & _M64

    for i in range(nblocks):
        k1 = int.from_bytes(key[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(key[i * 16 + 8 : i * 16 + 16], "little")

        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64

        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2

        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = key[nblocks * 16 :]
    tlen = len(tail)

    k1 = 0
    k2 = 0
    # bytes 8..14 feed k2 (only applied when tlen >= 9); bytes 0..7 feed k1.
    for j in range(min(tlen, 15) - 1, 7, -1):
        k2 |= tail[j] << (8 * (j - 8))
    if tlen >= 9:
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    for j in range(min(tlen, 8) - 1, -1, -1):
        k1 |= tail[j] << (8 * j)
    if tlen >= 1:
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    return h1


def _nrotl(x: np.ndarray, r: int) -> np.ndarray:
    rr = np.uint64(r)
    return (x << rr) | (x >> (_N64 - rr))


def _nfmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _N33)
    k = k * _FM1
    k = k ^ (k >> _N33)
    k = k * _FM2
    k = k ^ (k >> _N33)
    return k


def pad_keys(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Pack concatenated key bytes into a zero-padded (n, width) uint8 matrix.

    ``width`` is always a multiple of 16 with at least one full zero block
    past the longest key, so 16-byte block reads and 15-byte tail gathers
    never go out of bounds.
    """
    n = len(lengths)
    maxlen = int(lengths.max()) if n else 0
    width = (maxlen // 16 + 1) * 16
    mat = np.zeros((n, width), dtype=np.uint8)
    if n:
        mask = np.arange(width)[None, :] < lengths[:, None]
        mat[mask] = data
    return mat


def murmur3_64_padded(
    mat: np.ndarray, lengths: np.ndarray, seed: int
) -> np.ndarray:
    """Vectorized murmur3 h1 over a pre-padded key matrix (see pad_keys)."""
    n = mat.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        blocks = np.ascontiguousarray(mat).view("<u8")
        h1 = np.full(n, seed, dtype=np.uint64)
        h2 = h1.copy()
        nblocks = lengths // 16
        maxb = int(nblocks.max())
        for i in range(maxb):
            active = nblocks > i
            k1 = blocks[:, 2 * i].copy()
            k2 = blocks[:, 2 * i + 1].copy()
            k1 *= _NC1
            k1 = _nrotl(k1, 31)
            k1 *= _NC2
            nh1 = h1 ^ k1
            nh1 = _nrotl(nh1, 27) + h2
            nh1 = nh1 * _N5 + _NA1
            k2 *= _NC2
            k2 = _nrotl(k2, 33)
            k2 *= _NC1
            nh2 = h2 ^ k2
            nh2 = _nrotl(nh2, 31) + nh1
            nh2 = nh2 * _N5 + _NA2
            h1 = np.where(active, nh1, h1)
            h2 = np.where(active, nh2, h2)

        tail_start = nblocks * 16
        rows = np.arange(n)
        # NOTE: int64<->uint64 astype is pathologically slow in numpy 1.26
        # (~1us/element, checked-cast path); these values are non-negative so
        # a zero-copy view is equivalent. Applies to every .view() below.
        tlen = np.ascontiguousarray(lengths & 15).view(np.uint64)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        # zero padding past each key's end makes unmasked gathers contribute 0
        for j in range(8):
            k1 |= mat[rows, tail_start + j].astype(np.uint64) << np.uint64(8 * j)
        for j in range(7):
            k2 |= mat[rows, tail_start + 8 + j].astype(np.uint64) << np.uint64(
                8 * j
            )
        k2 = _nrotl(k2 * _NC2, 33) * _NC1
        h2 = np.where(tlen >= 9, h2 ^ k2, h2)
        k1 = _nrotl(k1 * _NC1, 31) * _NC2
        h1 = np.where(tlen >= 1, h1 ^ k1, h1)

        ln = np.ascontiguousarray(lengths).view(np.uint64)
        h1 = h1 ^ ln
        h2 = h2 ^ ln
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _nfmix(h1)
        h2 = _nfmix(h2)
        h1 = h1 + h2
    return h1


def murmur3_64_padded_multi(
    mat: np.ndarray, lengths: np.ndarray, seeds
) -> np.ndarray:
    """Vectorized murmur3 h1 for MANY seeds in one traversal -> (n_seeds, n).

    The per-block k1/k2 mixing (multiply/rotate/multiply) does not depend on
    the seed — only the h1/h2 chains do — so hashing a key under k seeds
    shares one pass over the key bytes. This is the hot path for the k-probe
    Bloom filter and the d-row count-min sketch (reference seed schedule
    64 << (i+1), bloom.go:111-114).
    """
    n = mat.shape[0]
    s = len(seeds)
    if n == 0:
        return np.empty((s, 0), dtype=np.uint64)
    with np.errstate(over="ignore"):
        blocks = np.ascontiguousarray(mat).view("<u8")
        h1 = np.empty((s, n), dtype=np.uint64)
        for i, seed in enumerate(seeds):
            h1[i, :] = seed
        h2 = h1.copy()
        nblocks = lengths // 16
        maxb = int(nblocks.max())
        for i in range(maxb):
            active = nblocks > i
            # seed-independent key mixing, once per block
            k1 = blocks[:, 2 * i] * _NC1
            k1 = _nrotl(k1, 31)
            k1 *= _NC2
            k2 = blocks[:, 2 * i + 1] * _NC2
            k2 = _nrotl(k2, 33)
            k2 *= _NC1
            # seed-dependent chains, broadcast over seeds
            nh1 = h1 ^ k1[None, :]
            nh1 = _nrotl(nh1, 27) + h2
            nh1 = nh1 * _N5 + _NA1
            nh2 = h2 ^ k2[None, :]
            nh2 = _nrotl(nh2, 31) + nh1
            nh2 = nh2 * _N5 + _NA2
            h1[:, active] = nh1[:, active]
            h2[:, active] = nh2[:, active]

        tail_start = nblocks * 16
        rows = np.arange(n)
        tlen = np.ascontiguousarray(lengths & 15).view(np.uint64)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for j in range(8):
            k1 |= mat[rows, tail_start + j].astype(np.uint64) << np.uint64(8 * j)
        for j in range(7):
            k2 |= mat[rows, tail_start + 8 + j].astype(np.uint64) << np.uint64(
                8 * j
            )
        k2 = _nrotl(k2 * _NC2, 33) * _NC1
        use_k2 = tlen >= 9
        use_k1 = tlen >= 1
        h2[:, use_k2] ^= k2[None, use_k2]
        k1 = _nrotl(k1 * _NC1, 31) * _NC2
        h1[:, use_k1] ^= k1[None, use_k1]

        ln = np.ascontiguousarray(lengths).view(np.uint64)
        h1 ^= ln[None, :]
        h2 ^= ln[None, :]
        h1 += h2
        h2 += h1
        h1 = _nfmix(h1)
        h2 = _nfmix(h2)
        h1 += h2
    return h1


def arrow_to_key_matrix(arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy extract (padded matrix, lengths) from an Arrow string/binary array.

    Accepts ``pyarrow.Array`` / ``ChunkedArray`` of (large_)string/(large_)binary.
    Null entries are treated as empty keys; callers should drop nulls first if
    other semantics are wanted.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(t):
        arr = arr.cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.empty(0, dtype=np.uint8)
    )
    lengths = np.diff(offsets)
    flat = data[offsets[0] : offsets[-1]]
    return pad_keys(flat, lengths), lengths


def keys_to_matrix(keys) -> tuple[np.ndarray, np.ndarray]:
    """Build (padded matrix, lengths) from a python sequence of bytes/str."""
    bs = [k.encode() if isinstance(k, str) else bytes(k) for k in keys]
    lengths = np.array([len(b) for b in bs], dtype=np.int64)
    flat = (
        np.frombuffer(b"".join(bs), dtype=np.uint8)
        if bs
        else np.empty(0, dtype=np.uint8)
    )
    return pad_keys(flat, lengths), lengths


def murmur3_64_batch(keys, seed: int) -> np.ndarray:
    """Vectorized murmur3 h1 over a sequence of bytes/str keys."""
    mat, lengths = keys_to_matrix(keys)
    return murmur3_64_padded(mat, lengths, seed)


# Cap on any one padded key matrix (rows x padded max key length). pad_keys
# densifies to the LONGEST key in the span, so one multi-MB document inside a
# 32k-row chunk would otherwise allocate tens of GB. 64 MiB keeps temporaries
# well under worker heaps while leaving full-width chunks for uniform keys.
MAX_MATRIX_BYTES = 64 * 1024 * 1024


def byte_lengths(arr) -> np.ndarray:
    """Per-row byte lengths of an Arrow string/binary array (offset diffs)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    if arr.null_count:
        arr = arr.fill_null(b"")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    return np.diff(offsets)


def length_bucketed_spans(
    lengths: np.ndarray,
    budget: int | None = None,
    max_rows: int | None = None,
) -> list:
    """Order-preserving [start, end) spans whose padded matrices each stay
    under ``budget`` bytes (rows x running padded max width). A single key
    longer than the budget gets a span of its own — the matrix is then just
    that key's padded width. ``budget`` defaults to the module's
    MAX_MATRIX_BYTES (read at call time so tests can shrink it)."""
    if budget is None:
        budget = MAX_MATRIX_BYTES
    n = len(lengths)
    if n == 0:
        return []
    widths = (np.asarray(lengths, dtype=np.int64) // 16 + 1) * 16
    # fast path (the overwhelmingly common case: uniform short keys): if the
    # whole chunk padded to the GLOBAL max width fits the budget, it is one
    # span — no per-row Python walk in the hash hot path
    if n * int(widths.max()) <= budget and (max_rows is None or n <= max_rows):
        return [(0, n)]
    spans = []
    i = 0
    while i < n:
        cur_w = int(widths[i])
        j = i + 1
        while j < n:
            w = max(cur_w, int(widths[j]))
            if (j - i + 1) * w > budget:
                break
            if max_rows is not None and (j - i) >= max_rows:
                break
            cur_w = w
            j += 1
        spans.append((i, j))
        i = j
    return spans


def murmur_hash_column(col, seed: int = 0) -> np.ndarray:
    """Murmur3-64 of an Arrow string/binary column (uint64)."""
    mat, lengths = arrow_to_key_matrix(col)
    return murmur3_64_padded(mat, lengths, seed)
