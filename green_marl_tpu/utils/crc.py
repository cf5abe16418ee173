"""Output-array CRC16 for determinism/verification gates.

Plays the role of Shoal's per-array CRC report (``CRC shl__<array> 0x...``
lines consumed by ``scripts/extract_result.py:147-166`` and gated by
``scripts/run.sh:297-303``).  The Shoal library itself is not present in
the reference checkout (dangling ``./shoal`` symlink), so its exact
polynomial is unverifiable; we use CRC-16/CCITT-FALSE (poly 0x1021, init
0xFFFF) over the raw little-endian bytes of the unpadded array and pin our
own golden values in the test-suite.  What matters — and what the tests
assert — is the reference property: the CRC is bit-stable across runs,
thread/chip counts, and placement configs for the same graph and seed.
"""

from __future__ import annotations

import numpy as np

_TABLE = None


def _table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        poly = 0x1021
        t = np.zeros(256, np.uint16)
        for b in range(256):
            crc = b << 8
            for _ in range(8):
                crc = ((crc << 1) ^ poly) if (crc & 0x8000) else (crc << 1)
                crc &= 0xFFFF
            t[b] = crc
        _TABLE = t
    return _TABLE


def crc16(data) -> int:
    """CRC-16/CCITT-FALSE of an array's raw bytes (host-side).

    Byte-serial (CRC chaining defeats vectorization) — intended for golden
    checks on test-sized arrays.  The CLI reports ``array_checksum`` for
    O(N)/O(E) outputs, which runs at C speed.
    """
    buf = np.ascontiguousarray(np.asarray(data)).view(np.uint8).tobytes()
    tab = _table().tolist()
    crc = 0xFFFF
    for b in buf:
        crc = ((crc << 8) & 0xFFFF) ^ tab[((crc >> 8) ^ b) & 0xFF]
    return crc


def crc16_hex(data) -> str:
    return f"0x{crc16(data):04x}"


def array_checksum(data) -> int:
    """Fast stable checksum (zlib CRC-32) of an array's raw bytes; the
    default per-array integrity value printed by the run harness."""
    import zlib
    buf = np.ascontiguousarray(np.asarray(data)).view(np.uint8)
    return zlib.crc32(buf.tobytes()) & 0xFFFFFFFF


def array_checksum_hex(data) -> str:
    return f"0x{array_checksum(data):08x}"
