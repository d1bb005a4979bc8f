"""Pure-Python XXH64 bit-identical to Spark's ``F.xxhash64`` (seed 42).

Why this exists: ``bucket(n, col)`` hidden partitioning stamps
``pmod(xxhash64(col), n)`` on every partition entry (Iceberg's bucket
transform shape; reference ``common.py`` discretization is the analog
surface). Probing those stamps previously required a tiny Spark job per
probe set so the hash was bit-identical to the JVM write side — which
meant the session-less contexts (the ``naru_snapshot`` DataSource's
planning worker and commit worker) could not prune or WRITE bucket
partitions at all. This module is the session-free twin: the standard
public XXH64 algorithm (Collet's xxHash spec) specialized to the three
input shapes Spark's ``XxHash64`` expression uses —

- ``hash_int``   : tinyint/smallint/int columns (4-byte shortcut)
- ``hash_long``  : bigint columns (8-byte shortcut)
- ``hash_bytes`` : string columns (UTF-8 bytes, general stream)

Bit-parity with the JVM implementation is asserted in
``tests/test_snapshot_datasource.py`` across negative ints, extreme
longs, unicode strings, and the empty string. Seed is Spark's fixed 42.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF  # 64-bit wrap

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_int(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 32-bit int (Spark's ``XXH64.hashInt``) — the path
    the JVM takes for tinyint/smallint/int columns. Returns a SIGNED
    64-bit value (what ``F.xxhash64`` yields)."""
    u = v & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (u * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _signed(_fmix(h))


def hash_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit long (Spark's ``XXH64.hashLong``) — the
    bigint-column path. Signed 64-bit result."""
    u = v & _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((u * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _signed(_fmix(h))


def hash_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte stream (Spark's ``XXH64.hashUnsafeBytes``) — the
    string-column path (UTF-8 bytes). Signed 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + _word(data, i) * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + _word(data, i + 8) * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + _word(data, i + 16) * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + _word(data, i + 24) * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= (_rotl((_word(data, i) * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _signed(_fmix(h))


def _word(data: bytes, i: int) -> int:
    return int.from_bytes(data[i:i + 8], "little")


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


_INT_DTYPES = ("tinyint", "smallint", "int")


def spark_xxhash64(value, dtype: str) -> int | None:
    """``F.xxhash64(col.cast(dtype))`` for one non-null Python value,
    dispatched the way Spark's ``XxHash64`` expression dispatches on the
    column type. Returns None for dtypes this twin does not cover (the
    caller must fall back to keeping/refusing, never guess)."""
    if dtype in _INT_DTYPES:
        return hash_int(int(value))
    if dtype == "bigint":
        return hash_long(int(value))
    if dtype == "string":
        return hash_bytes(str(value).encode("utf-8"))
    return None


def hash_long_np(v, seed: int = SPARK_SEED):
    """Vectorized ``hash_long`` over an int64 numpy array (uint64
    wraparound arithmetic mirrors the scalar path bit-for-bit) — the
    write-side fanout path for ``bucket(n, <bigint col>)`` over large
    batches."""
    import numpy as np

    with np.errstate(over="ignore"):
        u = v.astype(np.uint64)
        P1, P2, P4, P5 = (np.uint64(_P1), np.uint64(_P2),
                          np.uint64(_P4), np.uint64(_P5))
        h = np.uint64((seed + _P5 + 8) & _M)
        x = u * P2
        x = ((x << np.uint64(31)) | (x >> np.uint64(33))) * P1
        h = h ^ x
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * P1 + P4
        return _fmix_np(h)


def hash_int_np(v, seed: int = SPARK_SEED):
    """Vectorized ``hash_int`` over an int32-valued numpy array."""
    import numpy as np

    with np.errstate(over="ignore"):
        u = (v.astype(np.int64) & 0xFFFFFFFF).astype(np.uint64)
        P1, P2, P3 = np.uint64(_P1), np.uint64(_P2), np.uint64(_P3)
        h = np.uint64((seed + _P5 + 4) & _M)
        h = h ^ (u * P1)
        h = ((h << np.uint64(23)) | (h >> np.uint64(41))) * P2 + P3
        return _fmix_np(h)


def _fmix_np(h):
    import numpy as np

    with np.errstate(over="ignore"):
        P2, P3 = np.uint64(_P2), np.uint64(_P3)
        h = h ^ (h >> np.uint64(33))
        h = h * P2
        h = h ^ (h >> np.uint64(29))
        h = h * P3
        h = h ^ (h >> np.uint64(32))
        return h.astype(np.int64)  # two's-complement = Spark's signed view


def buckets_np(v, dtype: str, n: int):
    """Vectorized ``bucket_of`` over a numpy array of non-null ints —
    int64 result array of pmod(xxhash64, n)."""
    h = hash_long_np(v) if dtype == "bigint" else hash_int_np(v)
    return h % n  # numpy % takes the divisor's sign: already pmod


def bucket_of(value, dtype: str, n: int) -> int | None:
    """``pmod(xxhash64(value), n)`` — the bucket transform's partition
    value for one non-null input, bit-identical to the JVM write
    expression in ``sinks._partition_transform_expr``."""
    h = spark_xxhash64(value, dtype)
    return None if h is None else h % n  # Python % is already pmod
