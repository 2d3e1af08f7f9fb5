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


def row_hash_batch(conv_id, turn_idx, text) -> "object":
    """Vectorized 63-bit lineage hash of (conv_id, turn_idx,
    extracted_text) rows — the flagship's per-row ``row_h`` column
    (order-sensitive \\x1f field join, like ``row_hash``, but ONE
    polars hash kernel instead of a Python blake2b call per row: the
    per-row loop measured ~10 us/row, >40 core-seconds of the 4.9M-turn
    write leg). The values are engine-internal (manifest checksums +
    resume identity, never oracle-visible); runs that must interoperate
    across hash versions are fenced by EXTRACTOR_VERSION in the
    manifest parameter check. Returns a pyarrow int64 Array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    conv = pc.fill_null(conv_id, "\x00<null-conv>")
    joined = pc.binary_join_element_wise(
        pc.cast(conv, pa.string()),
        pc.cast(turn_idx, pa.string()),
        pc.fill_null(text, ""),
        "\x1f",
    )
    return hash_text_array(joined)


def hash_text_array(col) -> "object":
    """Vectorized 63-bit hash of a STRING Arrow column (polars xxhash,
    one kernel call — the per-row ``stable_hash64`` loop it replaces
    built a Python object per document in the dedup hot path). Returns
    a pyarrow int64 Array aligned with ``col``.

    NULLs hash to polars' fixed null hash, i.e. all NULL texts form ONE
    group — identical to SQL ``GROUP BY text`` semantics. The values are
    engine-internal group keys only (never oracle-visible), so the only
    requirement is determinism within a run plus the usual negligible
    63-bit collision bound."""
    import polars as pl
    import pyarrow as pa

    ca = col if isinstance(col, pa.ChunkedArray) else pa.chunked_array([col])
    h = pl.Series("t", ca.cast(pa.large_string())).hash(seed=0)
    out = (h // 2).cast(pl.Int64).to_arrow()
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
