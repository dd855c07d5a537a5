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

import numpy as np
import pandas as pd
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


def gram_hashes(grams: Column) -> Column:
    """array<string> -> array<long>: ``token_hash`` of every element,
    computed by ONE Arrow-vectorized numpy kernel per batch instead of an
    interpreted per-character fold per element (guide §4.2: higher-order
    aggregate/transform lambdas never enter whole-stage codegen, and the
    per-char fold dominated the shingle stage — measured this round).

    Bit-exact with ``token_hash``: h = Σ cp_i * 31^(n-1-i) mod P over the
    code points of each gram (utf-32 decode == Spark's split('') +
    ascii() per element, verified on BMP, non-BMP and combining chars).
    Null grams hash to null, null arrays stay null, like the JVM fold."""

    @F.pandas_udf("array<long>")
    def _hash(batch: pd.Series) -> pd.Series:
        P = np.int64(MERSENNE31)
        out = []
        flat: list = []
        sizes: list = []
        rows: list = []
        for row in batch:
            if row is None:
                rows.append(None)
                continue
            rows.append(len(flat))
            flat.extend(row)
            sizes.append(len(row))
        nulls = [i for i, g in enumerate(flat) if g is None]
        if nulls:
            flat = ["" if g is None else g for g in flat]
        if flat:
            lens = np.fromiter((len(g) for g in flat), np.int64, len(flat))
            cp = np.frombuffer(
                "".join(flat).encode("utf-32-le"), dtype="<u4"
            ).astype(np.int64)
            maxlen = int(lens.max())
            pow31 = np.ones(max(maxlen, 1), np.int64)
            for i in range(1, maxlen):
                pow31[i] = (pow31[i - 1] * 31) % P
            ends = np.cumsum(lens)
            starts = ends - lens
            h = np.zeros(len(flat), np.int64)
            nz = lens > 0
            if cp.size and nz.any():
                pos = np.arange(cp.size, dtype=np.int64) - np.repeat(starts, lens)
                exp = np.repeat(lens, lens) - 1 - pos
                # cp < 2^21, pow31 < 2^31 -> product < 2^52; segment sums
                # stay far inside int64 for any realistic gram length
                contrib = (cp * pow31[exp]) % P
                # reduceat over NON-EMPTY segments only: their starts are
                # strictly increasing and in range, and each runs exactly
                # to the next non-empty start (empty grams occupy no code
                # points). Clamping empty starts instead would truncate
                # the preceding segment at a batch tail.
                h[nz] = np.add.reduceat(contrib, starts[nz]) % P
            hl = h.tolist()
            for i in nulls:
                hl[i] = None
        else:
            hl = []
        it = iter(sizes)
        for start in rows:
            if start is None:
                out.append(None)
            else:
                n = next(it)
                out.append(hl[start : start + n])
        return pd.Series(out)

    return _hash(grams)


def minhash_signature(token_hashes: Column, num_perm: int, seed: int = 1) -> Column:
    """array<long> minhash signature from an array<long> of token hashes.
    Empty input -> array of P (the max), deterministic.

    Computed by one Arrow-vectorized numpy kernel per batch (the previous
    formulation ran num_perm interpreted array transforms + mins per row;
    same affine permutations, identical int64 arithmetic mod P — the
    value contract the DuckDB oracles mirror is unchanged)."""
    params = perm_params(num_perm, seed)
    a_vec = np.array([a for a, _ in params], np.int64)
    b_vec = np.array([b for _, b in params], np.int64)

    @F.pandas_udf("array<long>")
    def _sig(batch: pd.Series) -> pd.Series:
        P = np.int64(MERSENNE31)
        # null and empty arrays both yield the all-P signature: the JVM
        # formulation coalesced a null array_min to P per slot
        rows = [None if r is None else np.asarray(r, np.int64) for r in batch]
        lens = np.array([0 if r is None else r.size for r in rows], np.int64)
        if int(lens.sum()) == 0:
            empty = np.full(len(a_vec), int(P), np.int64)
            return pd.Series([empty] * len(rows))
        h_all = np.concatenate([r for r in rows if r is not None and r.size])
        # a < P < 2^31 and h < 2^31 -> a*h + b < 2^62: exact in int64
        g = (h_all[:, None] * a_vec[None, :] + b_vec[None, :]) % P
        ends = np.cumsum(lens)
        starts = ends - lens
        nz = lens > 0
        sig = np.full((len(rows), len(a_vec)), int(P), np.int64)
        # reduceat over non-empty segments only (see gram_hashes note)
        sig[nz] = np.minimum.reduceat(g, starts[nz], axis=0)
        return pd.Series(list(sig))

    return _sig(token_hashes)


def simhash32(token_hashes: Column) -> Column:
    """32-bit simhash: for each bit, sum +1/-1 over token hashes; bit set
    when the sum is positive.

    One Arrow-vectorized numpy kernel per batch (the JVM formulation ran
    32 interpreted aggregate folds per row). Identical values: the same
    +1/-1 bit sums; a null or empty input array yields 0 (the folds'
    null/zero contribs never set a bit), and a null ELEMENT contributes
    -1 to every bit exactly like the JVM when().otherwise(-1) — same as
    a zero hash, which is how the kernel encodes it."""

    @F.pandas_udf("long")
    def _fp(batch: pd.Series) -> pd.Series:
        ks = np.arange(32, dtype=np.int64)
        rows = [
            None
            if r is None
            else np.asarray([0 if h is None else h for h in r], np.int64)
            for r in batch
        ]
        lens = np.array([0 if r is None else r.size for r in rows], np.int64)
        if int(lens.sum()) == 0:
            return pd.Series([0] * len(rows))
        h_all = np.concatenate([r for r in rows if r is not None and r.size])
        bits = (((h_all[:, None] >> ks[None, :]) & 1) * 2 - 1).astype(np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        nz = lens > 0
        fp = np.zeros(len(rows), np.int64)
        # reduceat over non-empty segments only (see gram_hashes note)
        sums = np.add.reduceat(bits, starts[nz], axis=0)
        fp[nz] = ((sums > 0).astype(np.int64) * (np.int64(1) << ks)).sum(axis=1)
        return pd.Series(fp)

    return _fp(token_hashes)


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
