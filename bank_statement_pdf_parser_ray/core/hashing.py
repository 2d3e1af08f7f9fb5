"""F5 row_hash + rolling-hash document fingerprint (SURVEY.md §2.8 F5).

Stable across processes/nodes (no PYTHONHASHSEED dependence): blake2b
truncated to 63 bits so checksums can be summed in int64 aggregates.
"""

from __future__ import annotations

import hashlib


def stable_hash64(s: str) -> int:
    """63-bit stable hash of a string (non-negative, int64-safe)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big") >> 1


def row_hash(*fields: str) -> int:
    """Order-sensitive hash of a result row's fields."""
    return stable_hash64("\x1f".join(fields))


def fingerprint(text: str, k: int = 8) -> int:
    """Deterministic document fingerprint: min of rolling k-gram hashes
    (a 1-perm MinHash — cheap winnowing-style signature)."""
    if len(text) < k:
        return stable_hash64(text)
    best = None
    # polynomial rolling hash over k-grams, mod 2^61-1
    MOD = (1 << 61) - 1
    B = 131
    h = 0
    pw = pow(B, k - 1, MOD)
    for i, ch in enumerate(text):
        o = ord(ch)
        if i < k:
            h = (h * B + o) % MOD
            if i == k - 1 and (best is None or h < best):
                best = h
        else:
            h = ((h - ord(text[i - k]) * pw) * B + o) % MOD
            if h < best:
                best = h
    return best if best is not None else 0
