"""Golden crypto parity (reference pkg/signing/signing_test.go:12-41) and
public keccak vectors."""

import os

import pytest

from basin_cli_spark.functions.hashing import keccak256, keccak256_file
from basin_cli_spark.functions.signing import derive_address, sign_bytes, sign_file

PRIV = "59c6995e998f97a5a0044966f0945389dc9e86dae88c7a8412f4603b6b78690d"
GOLDEN_SIG = (
    "6ddb61a19b9df71136b48c80b2e86e7e20313d5eec0de9210802335b300ba8df"
    "6c332d35a5d753a028d703769fd9b66d7ce5902d80369750cf55118b1679d84900"
)


def test_keccak_empty():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak_abc():
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak_multiblock():
    # > rate (136 bytes) exercises the streaming absorb path
    data = b"x" * 1000
    assert keccak256(data) == keccak256_chunks(data)


def keccak256_chunks(data: bytes):
    from basin_cli_spark.functions.hashing import Keccak256

    h = Keccak256()
    for i in range(0, len(data), 7):
        h.update(data[i : i + 7])
    return h.digest()


def test_golden_signature():
    """Exact signature parity with the reference's golden fixture."""
    assert sign_bytes(b"data to be signed", PRIV).hex() == GOLDEN_SIG


def test_sign_file(tmp_path):
    p = tmp_path / "content.txt"
    p.write_bytes(b"data to be signed")
    assert sign_file(str(p), PRIV).hex() == GOLDEN_SIG


def test_sign_empty_file_rejected(tmp_path):
    p = tmp_path / "empty.txt"
    p.write_bytes(b"")
    with pytest.raises(ValueError):
        sign_file(str(p), PRIV)


def test_sign_missing_file_rejected(tmp_path):
    with pytest.raises(OSError):
        sign_file(str(tmp_path / "nope.txt"), PRIV)


def test_derive_address():
    # public well-known test key => its published address
    assert derive_address(PRIV) == "0x70997970c51812dc3a010c7d01b50e0d17dc79c8"


def test_file_hash_chunking(tmp_path):
    p = tmp_path / "big.bin"
    data = os.urandom(10000)
    p.write_bytes(data)
    assert keccak256_file(str(p)) == keccak256(data)
