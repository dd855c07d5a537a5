"""Deterministic, engine-portable hashing for dedup/fingerprinting.

All hashes here are defined by plain integer arithmetic (polynomial
rolling hash mod a 31-bit prime + affine universal re-hash), NOT engine
builtins like xxhash64 — so the exact same values are computable in any
SQL engine (the DuckDB oracles in __spark_entry__.py reproduce them),
in numpy (vectorized pandas-UDF path), and in pure Python (tests).

  h(token)     = fold(h*31 + codepoint) mod P        P = 2^31 - 1
  g_i(h)       = (a_i * h + b_i) mod P               a_i, b_i seeded
  minhash_i(S) = min over tokens of g_i(h(token))
  simhash(S)   = sign-aggregated 32-bit fingerprint over g_0(h(token))

Everything stays within int64: P < 2^31 so a*h + b < 2^62.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def perm_params(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a tiny LCG (reproducible anywhere)."""
    params = []
    x = seed
    for _ in range(num_perm):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = (x % (MERSENNE31 - 1)) + 1
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = x % MERSENNE31
        params.append((a, b))
    return params


def token_hash(token: Column) -> Column:
    """Polynomial hash of a string column, JVM-side only: fold over the
    codepoint array with aggregate() — stays in whole-stage codegen."""
    return F.aggregate(
        F.transform(F.split(token, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(MERSENNE31),
    )


def token_hash_py(token: str) -> int:
    """Pure-python mirror of token_hash (for tests/oracles)."""
    acc = 0
    for ch in token:
        # ascii() semantics: first code point of the character
        acc = (acc * 31 + ord(ch[0])) % MERSENNE31
    return acc


def minhash_signature(token_hashes: Column, num_perm: int, seed: int = 1) -> Column:
    """array<long> minhash signature from an array<long> of token hashes.
    Empty input -> array of P (the max), deterministic."""
    def perm_fn(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31)

    sigs = [
        F.array_min(F.transform(token_hashes, perm_fn(a, b)))
        for a, b in perm_params(num_perm, seed)
    ]
    return F.array(*[F.coalesce(s, F.lit(MERSENNE31)) for s in sigs])


def simhash32(token_hashes: Column) -> Column:
    """32-bit simhash: for each bit, sum +1/-1 over token hashes; bit set
    when the sum is positive. Pure Column expressions (no UDF)."""
    def contrib_fn(k: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for k in range(32):
        contrib = F.aggregate(token_hashes, F.lit(0).cast("long"), contrib_fn(k))
        bits.append(F.when(contrib > 0, F.lit(1 << k).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def hamming32(x: Column, y: Column) -> Column:
    """Hamming distance between two 32-bit ints stored as long (JVM-side
    popcount of the XOR; the DuckDB oracle mirrors it as an explicit
    32-term shift-and-mask sum — identical for non-negative 32-bit
    values)."""
    return F.bit_count(x.bitwiseXOR(y)).cast("int")


def rolling_fingerprint(token_hashes: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial fold over token
    hashes (a rolling hash of the token stream)."""
    return F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(1000003) + h) % F.lit(MERSENNE31),
    )
