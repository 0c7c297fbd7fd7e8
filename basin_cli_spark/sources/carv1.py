"""Minimal CAR v1 reader — the cold-store retrieval format.

The reference's cold path fetches content as a CAR v1 archive via
lassie/IPFS and extracts the root block's payload
(/root/reference/internal/app/retriever.go:92-156,216-233).  This module
implements the same extraction against the PUBLIC IPLD CAR v1
specification: varint-framed sections, a DAG-CBOR header carrying
{version: 1, roots: [...]}, binary CIDv1, and sha2-256 multihash
verification of the returned payload.

Only what extraction needs is implemented — unsigned-LEB128 varints, the
small DAG-CBOR subset the header uses (uints, text, bytes, arrays, maps,
tag 42), CIDv1 binary/base32 text forms — but each piece is complete for
its domain, not a stub.
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass

SHA2_256 = 0x12
RAW_CODEC = 0x55
DAG_PB_CODEC = 0x70
DAG_CBOR_CODEC = 0x71


# -- unsigned LEB128 --------------------------------------------------------


def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# -- CID v1 -----------------------------------------------------------------


@dataclass(frozen=True)
class CID:
    version: int
    codec: int
    hash_code: int
    digest: bytes

    def to_bytes(self) -> bytes:
        if self.version == 0:
            return write_uvarint(self.hash_code) + write_uvarint(len(self.digest)) + self.digest
        return (
            write_uvarint(self.version)
            + write_uvarint(self.codec)
            + write_uvarint(self.hash_code)
            + write_uvarint(len(self.digest))
            + self.digest
        )

    def text(self) -> str:
        """Multibase base32-lower ('b' prefix) — the canonical CIDv1 text
        form lassie and the provider use."""
        raw = self.to_bytes()
        b32 = base64.b32encode(raw).decode().lower().rstrip("=")
        return "b" + b32


def parse_cid_bytes(buf: bytes, pos: int) -> tuple[CID, int]:
    """Parse a binary CID at pos (CIDv0 = bare sha2-256 multihash;
    CIDv1 = version, codec, multihash)."""
    if buf[pos] == SHA2_256 and buf[pos + 1] == 0x20:  # CIDv0
        digest = buf[pos + 2 : pos + 34]
        return CID(0, DAG_PB_CODEC, SHA2_256, bytes(digest)), pos + 34
    version, pos = read_uvarint(buf, pos)
    if version != 1:
        raise ValueError(f"unsupported CID version {version}")
    codec, pos = read_uvarint(buf, pos)
    hash_code, pos = read_uvarint(buf, pos)
    hlen, pos = read_uvarint(buf, pos)
    digest = bytes(buf[pos : pos + hlen])
    if len(digest) != hlen:
        raise ValueError("truncated CID digest")
    return CID(1, codec, hash_code, digest), pos + hlen


def parse_cid_text(text: str) -> CID:
    if text.startswith("b"):  # multibase base32-lower
        raw = text[1:].upper()
        raw += "=" * (-len(raw) % 8)
        cid, end = parse_cid_bytes(base64.b32decode(raw), 0)
        return cid
    raise ValueError(f"unsupported CID multibase prefix: {text[:1]!r}")


def cid_for_raw(data: bytes) -> CID:
    """CIDv1 raw-codec sha2-256 for a payload — what a single-block CAR
    of opaque content roots at."""
    return CID(1, RAW_CODEC, SHA2_256, hashlib.sha256(data).digest())


# -- DAG-CBOR (header subset) ----------------------------------------------


def _read_cbor(buf: bytes, pos: int):
    major = buf[pos] >> 5
    info = buf[pos] & 0x1F
    pos += 1
    if info < 24:
        arg = info
    elif info == 24:
        arg, pos = buf[pos], pos + 1
    elif info == 25:
        arg, pos = int.from_bytes(buf[pos : pos + 2], "big"), pos + 2
    elif info == 26:
        arg, pos = int.from_bytes(buf[pos : pos + 4], "big"), pos + 4
    elif info == 27:
        arg, pos = int.from_bytes(buf[pos : pos + 8], "big"), pos + 8
    else:
        raise ValueError("indefinite lengths not used by DAG-CBOR")
    if major == 0:  # uint
        return arg, pos
    if major == 2:  # bytes
        return bytes(buf[pos : pos + arg]), pos + arg
    if major == 3:  # text
        return buf[pos : pos + arg].decode(), pos + arg
    if major == 4:  # array
        out = []
        for _ in range(arg):
            v, pos = _read_cbor(buf, pos)
            out.append(v)
        return out, pos
    if major == 5:  # map
        out = {}
        for _ in range(arg):
            k, pos = _read_cbor(buf, pos)
            v, pos = _read_cbor(buf, pos)
            out[k] = v
        return out, pos
    if major == 6:  # tag — 42 is an IPLD link: 0x00 + binary CID
        if arg != 42:
            raise ValueError(f"unexpected CBOR tag {arg}")
        inner, pos = _read_cbor(buf, pos)
        cid, _ = parse_cid_bytes(inner, 1)  # skip identity-multibase 0x00
        return cid, pos
    raise ValueError(f"unsupported CBOR major type {major}")


def _write_cbor_head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 256:
        return bytes([(major << 5) | 24, arg])
    if arg < 65536:
        return bytes([(major << 5) | 25]) + arg.to_bytes(2, "big")
    return bytes([(major << 5) | 26]) + arg.to_bytes(4, "big")


def encode_header(roots: list[CID]) -> bytes:
    """DAG-CBOR CAR header {roots: [...], version: 1} (map keys sorted
    per DAG-CBOR: 'roots' < 'version' by length-first ordering)."""
    body = _write_cbor_head(5, 2)
    body += _write_cbor_head(3, 5) + b"roots"
    body += _write_cbor_head(4, len(roots))
    for r in roots:
        link = b"\x00" + r.to_bytes()
        body += _write_cbor_head(6, 42) + _write_cbor_head(2, len(link)) + link
    body += _write_cbor_head(3, 7) + b"version" + _write_cbor_head(0, 1)
    return body


# -- CAR v1 read/write ------------------------------------------------------


def write_car_v1(blocks: list[tuple[CID, bytes]], roots: list[CID]) -> bytes:
    header = encode_header(roots)
    out = write_uvarint(len(header)) + header
    for cid, data in blocks:
        section = cid.to_bytes() + data
        out += write_uvarint(len(section)) + section
    return out


def iter_car_v1(car: bytes):
    """Yields (CID, payload) per section after validating the header."""
    hlen, pos = read_uvarint(car, 0)
    header, _ = _read_cbor(car[pos : pos + hlen], 0)
    if header.get("version") != 1:
        raise ValueError(f"not a CAR v1: {header!r}")
    pos += hlen
    while pos < len(car):
        slen, pos = read_uvarint(car, pos)
        end = pos + slen
        cid, pos = parse_cid_bytes(car, pos)
        yield header, cid, bytes(car[pos:end])
        pos = end


def extract_root_block(car: bytes, cid_text: str | None = None) -> bytes:
    """The reference's extract step (retriever.go:216-233): return the
    payload of the requested (or root) block, verifying the sha2-256
    multihash when present."""
    want = parse_cid_text(cid_text) if cid_text else None
    for header, cid, data in iter_car_v1(car):
        if want is None:
            roots = header.get("roots") or []
            if not roots:
                raise ValueError("CAR has no roots")
            want = roots[0]
        if cid == want:
            if cid.hash_code == SHA2_256 and hashlib.sha256(data).digest() != cid.digest:
                raise ValueError("block payload does not match CID digest")
            return data
    raise KeyError(f"block not found in CAR: {cid_text}")
