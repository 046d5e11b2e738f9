"""Deterministic cross-engine hashing primitives.

Engine-native hash functions differ between Spark (xxhash64/murmur3)
and DuckDB (its own hash), so every operator whose *results* must be
oracle-checkable (minhash, simhash, LSH banding, fingerprints) builds
on one shared primitive: the first 15 hex digits of md5, read as a
60-bit integer. md5 is available and bit-identical in both engines,
and 60 bits stays inside a signed BIGINT.

Spark:   CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB:  CAST(('0x' || SUBSTRING(MD5(x), 1, 15)) AS BIGINT)

Performance note: md5 here is JVM-side (whole-stage codegen), not a
Python UDF. It is ~2-3x slower than xxhash64; operators accept a
``fast=True`` flag to switch to xxhash64 when oracle parity is not
required (production path at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash64(col: Column, seed: int = 0) -> Column:
    """60-bit integer hash of (seed || value), identical in DuckDB."""
    base = F.concat(F.lit(f"s{seed}|"), col.cast("string")) if seed else col.cast("string")
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("bigint")


def oracle_md5_hash64(expr: str, seed: int = 0) -> str:
    """DuckDB SQL emitting the same value as :func:`md5_hash64`."""
    base = f"('s{seed}|' || CAST({expr} AS VARCHAR))" if seed else f"CAST({expr} AS VARCHAR)"
    return f"CAST(('0x' || SUBSTRING(MD5({base}), 1, 15)) AS BIGINT)"


# convenience constant documenting the pattern for raw SQL authors
ORACLE_MD5_HASH64 = "CAST(('0x' || SUBSTRING(MD5({expr}), 1, 15)) AS BIGINT)"


def md5_hash64_py(s: str, seed: int = 0) -> int:
    """Driver-side twin of :func:`md5_hash64` (hashlib md5 is the same
    md5): used to precompute literal constants (e.g. LSH plane weights)
    so plans carry folded literals instead of per-row md5 calls."""
    import hashlib

    base = f"s{seed}|{s}" if seed else s
    return int(hashlib.md5(base.encode()).hexdigest()[:15], 16)


# Universal-hash family for minhash: one md5 per value, then cheap
# affine transforms h_i = (a_i * (h mod P) + b_i) mod P. P is prime and
# < 2^30 so a_i * h fits a signed 64-bit integer in BOTH engines
# (DuckDB errors on bigint overflow; Spark wraps silently — staying
# under 2^62 keeps them identical).
MINHASH_PRIME = 1_073_741_789


def minhash_params(i: int) -> tuple:
    """Deterministic (a, b) for hash i, derived from the shared md5
    primitive so any engine can re-derive them."""
    a = md5_hash64_py(f"mh-a:{i}") % (MINHASH_PRIME - 1) + 1
    b = md5_hash64_py(f"mh-b:{i}") % MINHASH_PRIME
    return a, b


def universal_hash(col: Column, i: int) -> Column:
    """h_i(x) = (a_i * (md5_60(x) mod P) + b_i) mod P — JVM-side, one
    md5 total regardless of how many hash functions are evaluated."""
    a, b = minhash_params(i)
    base = F.pmod(md5_hash64(col), F.lit(MINHASH_PRIME))
    return F.pmod(base * F.lit(a) + F.lit(b), F.lit(MINHASH_PRIME))


def oracle_universal_hash(expr: str, i: int) -> str:
    a, b = minhash_params(i)
    base = f"({oracle_md5_hash64(expr)} % {MINHASH_PRIME})"
    return f"(({base} * {a} + {b}) % {MINHASH_PRIME})"


def hash64(col: Column, fast: bool = False) -> Column:
    """The shared 64-bit hash primitive with a production toggle:
    ``fast=False`` (default) is the md5-based form every DuckDB oracle
    can replicate; ``fast=True`` is Spark's native xxhash64 — ~2-3x
    less CPU, same distribution quality, NOT reproducible in the
    oracle. All dedup/LSH operators accept ``fast`` and thread it
    here; flip it in production once results no longer need
    cross-engine hash equality (the operators' STRUCTURE and
    guarantees are identical either way)."""
    return F.xxhash64(col) if fast else md5_hash64(col)


# Polynomial k-gram combination: a k-token shingle hash is built from
# per-TOKEN hashes as (sum_j th[i+j] * A^(k-1-j)) mod P, th beyond the
# token list counting as 0. One md5 per token (not per shingle), and
# the combination is 3 multiply-adds — exactly replicable in DuckDB
# SQL and in a numpy kernel. Overflow audit: th, A^j < P < 2^30, so
# every product < 2^60 and a k=3 sum < 3*2^60 < 2^63 — exact in
# signed 64-bit in Spark, DuckDB, and numpy alike.
SHINGLE_POLY_A = md5_hash64_py("shingle-poly-A") % (MINHASH_PRIME - 1) + 1


def shingle_poly_coeffs(k: int) -> list:
    """[A^(k-1), ..., A, 1] mod P — coefficient for token offset j is
    ``coeffs[j]``."""
    return [pow(SHINGLE_POLY_A, k - 1 - j, MINHASH_PRIME) for j in range(k)]


def poly_shingle_hashes_py(texts, k: int, prime: int = MINHASH_PRIME):
    """Shared batch stage of the Arrow dedup kernels: normalize +
    tokenize each text (ASCII-whitespace collapse, lower, split —
    exactly `_oracle_tokens_norm`), md5-hash the batch's UNIQUE tokens,
    and emit one int64 numpy array of polynomial k-gram shingle hashes
    per row (zero-padded window; an empty doc yields [0]). Runs on
    executors inside mapInPandas closures; pure stdlib+numpy."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    coeffs = shingle_poly_coeffs(k)
    ws = re.compile(r"[ \t\n\r\f\v]+")
    tok_lists = [
        [t for t in ws.sub(" ", (s or "").lower()).strip(" ").split(" ") if t]
        for s in texts
    ]
    flat = [t for ts in tok_lists for t in ts]
    if flat:
        # hash-based interning (pd.factorize) — ~10x cheaper than the
        # sort-based np.unique on object dtype; per-token hash values
        # don't depend on the interning order
        inv, uniq = pd.factorize(np.array(flat, dtype=object), sort=False)
        uh = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:15], 16) % prime for u in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        th_flat = uh[inv]
    else:
        th_flat = np.empty(0, dtype=np.int64)

    out = []
    pos = 0
    pad = np.zeros(k - 1, dtype=np.int64)
    for ts in tok_lists:
        n = len(ts)
        if n == 0:
            out.append(np.zeros(1, dtype=np.int64))
        else:
            thp = np.concatenate([th_flat[pos : pos + n], pad])
            m = max(n - k + 1, 1)
            acc = np.zeros(m, dtype=np.int64)
            for j, c in enumerate(coeffs):
                acc += thp[j : m + j] * c
            out.append(acc % prime)
        pos += n
    return out
