"""Keccak-256 (pure Python, from the public Keccak/FIPS-202 specification)
and file hashing.

The reference hashes every upload with keccak256 over 4 KB chunks before
signing (reference pkg/signing/signing.go:34-108).  Python's hashlib sha3
uses the FIPS-202 padding (0x06); Ethereum-style keccak256 uses the original
Keccak padding (0x01), so it is implemented here directly — permutation and
constants are from the published spec.

A vectorized Pandas UDF wrapper (`keccak256_udf`) exposes the digest as a
column function; chunked `keccak256_file` mirrors the reference's streaming
file hash (4096-byte reads, signing.go:79).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROTC = [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
         27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]
_PILN = [10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
         15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1]


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(st: list[int]) -> None:
    for rnd in range(24):
        # theta
        bc = [st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20] for i in range(5)]
        for i in range(5):
            t = bc[(i + 4) % 5] ^ _rotl(bc[(i + 1) % 5], 1)
            for j in range(0, 25, 5):
                st[j + i] ^= t
        # rho + pi
        t = st[1]
        for i in range(24):
            j = _PILN[i]
            bc[0] = st[j]
            st[j] = _rotl(t, _ROTC[i])
            t = bc[0]
        # chi
        for j in range(0, 25, 5):
            row = st[j:j + 5]
            for i in range(5):
                st[j + i] = row[i] ^ ((~row[(i + 1) % 5]) & row[(i + 2) % 5] & _MASK)
        # iota
        st[0] ^= _RC[rnd]


class Keccak256:
    """Streaming Keccak-256 (rate 136, capacity 512, pad 0x01||...||0x80)."""

    RATE = 136

    def __init__(self) -> None:
        self._state = [0] * 25
        self._buf = b""

    def update(self, data: bytes) -> "Keccak256":
        self._buf += data
        while len(self._buf) >= self.RATE:
            self._absorb(self._buf[: self.RATE])
            self._buf = self._buf[self.RATE:]
        return self

    def _absorb(self, block: bytes) -> None:
        for i in range(self.RATE // 8):
            self._state[i] ^= int.from_bytes(block[i * 8:(i + 1) * 8], "little")
        _keccak_f(self._state)

    def digest(self) -> bytes:
        pad = bytearray(self.RATE - len(self._buf))
        block = bytearray(self._buf) + pad
        block[len(self._buf)] |= 0x01
        block[-1] |= 0x80
        st = list(self._state)
        for i in range(self.RATE // 8):
            st[i] ^= int.from_bytes(bytes(block[i * 8:(i + 1) * 8]), "little")
        _keccak_f(st)
        out = b"".join(st[i].to_bytes(8, "little") for i in range(4))
        return out[:32]

    def hexdigest(self) -> str:
        return self.digest().hex()


def keccak256(data: bytes) -> bytes:
    return Keccak256().update(data).digest()


def keccak256_file(path: str, chunk_size: int = 4096) -> bytes:
    """Streaming file hash in 4 KB chunks (bounded memory, like reference
    signing.go:77-100)."""
    h = Keccak256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            h.update(chunk)
    return h.digest()


def keccak256_udf():
    """Arrow-vectorized column form: keccak256 hex of a string/binary col."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _keccak(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else keccak256(v if isinstance(v, (bytes, bytearray)) else str(v).encode()).hex()
        )

    return _keccak
