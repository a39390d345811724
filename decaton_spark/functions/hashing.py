"""Cross-engine deterministic hashing fragments.

Several operators (simhash, minhash, fingerprints, Count-Min buckets)
need a hash function that produces *bit-identical* values in Spark and
in the DuckDB correctness oracle. Engine-native hashes differ
(xxhash64/murmur3 vs DuckDB's), so these helpers build the hash out of
the ANSI-ish intersection both dialects implement identically:
``md5`` (lowercase hex), ``substr`` (1-based), ``instr`` (1-based),
``concat``, integer arithmetic.

Expressions are generated as SQL text usable via ``F.expr`` on the
Spark side and embedded verbatim in oracle SQL — one definition, two
engines. Everything stays JVM-side / vectorized in Spark (no UDFs).
"""

from __future__ import annotations

HEX = "0123456789abcdef"


def hex_digit(expr: str, pos: int) -> str:
    """Value 0..15 of the 1-based ``pos``-th hex char of ``expr``.
    Cast to BIGINT so weighted sums never overflow INT (Spark ANSI)."""
    return f"CAST(instr('{HEX}', substr({expr}, {pos}, 1)) - 1 AS BIGINT)"


def hex_to_long(expr: str, start: int = 1, ndigits: int = 8) -> str:
    """Integer value of ``ndigits`` hex chars of ``expr`` from ``start``
    (big-endian). 8 digits => 0..2^32-1, safely inside BIGINT."""
    terms = []
    for i in range(ndigits):
        weight = 16 ** (ndigits - 1 - i)
        terms.append(f"{hex_digit(expr, start + i)} * {weight}")
    return "(" + " + ".join(terms) + ")"


def md5_long(expr: str, ndigits: int = 8, salt: str | None = None) -> str:
    """64-bit-safe integer hash of a string expression via md5."""
    salted = f"concat('{salt}', {expr})" if salt is not None else expr
    return hex_to_long(f"md5({salted})", 1, ndigits)


def md5_bucket(expr: str, width: int, salt: str | None = None) -> str:
    """Deterministic bucket in [0, width) — CM-sketch / LSH routing."""
    return f"({md5_long(expr, 8, salt)} % {width})"


def token_fingerprint(tokens_expr_spark: str) -> str:
    """Rolling polynomial fingerprint over an array of tokens (Spark
    higher-order-function form): h = (h*31 + md5int(tok)) mod 1e9+7.

    Spark-only text (uses ``aggregate``); the DuckDB oracle uses
    ``list_reduce`` with the same per-token md5 integers — see
    ``decaton_spark.queries`` for the paired oracle fragment.
    """
    tok_int = md5_long("t", 8)
    return (
        f"aggregate({tokens_expr_spark}, CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * 31 + {tok_int}) % 1000000007)"
    )
