"""Portable hashing & shingling primitives.

``h32`` is the engine's cross-checkable 32-bit hash: the first 8 hex
chars of md5, as a bigint. md5 is standard everywhere (Spark JVM,
DuckDB, Python hashlib), so every hash-derived operator (minhash,
simhash, LSH buckets) can be verified bit-for-bit by an independent SQL
oracle. xxhash64 would be ~3× faster JVM-side; swap via ``fast=True``
where no oracle parity is needed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^31−1 (Mersenne prime) — the universal-hash modulus. Chosen so
#: a·h + b stays < 2^62: exact in Spark longs AND in DuckDB BIGINTs
#: (which ERROR on 64-bit overflow instead of wrapping — a larger
#: modulus would silently diverge the two engines).
MERSENNE31 = 2147483647


def mh_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    ``h_i(x) = (a_i·x + b_i) mod 2^31−1`` — md5-derived like every
    other constant here, so an independent SQL oracle regenerates the
    identical family."""
    out = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"mh_a{i}".encode()).hexdigest()[:8], 16) % (MERSENNE31 - 1) + 1
        b = int(hashlib.md5(f"mh_b{i}".encode()).hexdigest()[:8], 16) % MERSENNE31
        out.append((a, b))
    return out


def h32(col: Column | str, seed: str | None = None, fast: bool = False) -> Column:
    """Deterministic 32-bit hash of a string column → bigint [0, 2^32)."""
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    if fast:
        return F.pmod(F.xxhash64(c), F.lit(4294967296))
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def word_tokens(col: Column | str) -> Column:
    """Whitespace word split (single-space corpus convention)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(tokens: Column, k: int = 3) -> Column:
    """k-word shingles of a token array: element i joins tokens[i..i+k-1].

    Returns an empty array when the document has fewer than k tokens.

    Built with ``zip_with`` over k shifted slices — deliberately NOT
    ``transform(sequence, i -> element_at(tokens, i+j))``: an
    expression referencing ``tokens`` INSIDE a lambda body is
    re-evaluated per element (per-element full re-split when tokens is
    ``split(text)``), an O(n²) blowup. The slice arguments here are
    evaluated once per row.
    """
    n = F.size(tokens)
    m = n - (k - 1)  # shingle count
    out = F.slice(tokens, 1, m)
    for j in range(1, k):
        out = F.zip_with(
            out, F.slice(tokens, j + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(n >= k, out).otherwise(F.array().cast("array<string>"))
