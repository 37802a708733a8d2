"""Pure-Python Keccak-256 (the pre-NIST sha3 variant Ethereum uses).

The reference derives 4-byte method selectors with Web3.sha3 at import
time (operations/contract_transactions.py:11-25). hashlib's sha3_256 is
the NIST-padded variant and gives different digests, so we carry the
standard public-domain Keccak-f[1600] permutation. Only used for
driver-side constants (selectors, event topics) — never on the data path.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y]
_R = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _M64


def _keccak_f(a: list[list[int]]) -> list[list[int]]:
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _R[x][y])
        # chi
        a = [
            [b[x][y] ^ ((~b[(x + 1) % 5][y] & _M64) & b[(x + 2) % 5][y]) for y in range(5)]
            for x in range(5)
        ]
        # iota
        a[0][0] ^= rc
    return a


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    if pad_len == 1:
        padded += b"\x81"
    else:
        padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80"

    state = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            x, y = i % 5, i // 5
            state[x][y] ^= int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
        state = _keccak_f(state)

    out = bytearray()
    for i in range(25):
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
        if len(out) >= 32:
            break
    return bytes(out[:32])


def selector(signature: str) -> str:
    """First 4 bytes of keccak256(signature), hex without 0x —
    the reference's _extract_first_bytes (operations/contract_transactions.py:11-25)."""
    return keccak256(signature.encode()).hex()[:8]


def event_topic(signature: str) -> str:
    """Full 32-byte event topic, 0x-prefixed."""
    return "0x" + keccak256(signature.encode()).hex()
