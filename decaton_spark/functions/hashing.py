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


def hex_to_long_spark(expr: str, start: int = 1, ndigits: int = 8) -> str:
    """SPARK-ONLY fast form of ``hex_to_long``: one native ``conv()``
    call instead of ``ndigits`` instr/substr digit lookups. Bit-
    identical on valid lowercase hex (md5 output — the only input the
    engine feeds it; pinned against the portable form on the full
    fixture corpus in tests/test_ngram_constructions.py). The payoff
    is largest inside higher-order-function lambdas, where every
    expression node evaluates interpreted per array element: the
    minhash band-min transform dropped 2.62 s -> 1.00 s on the sf0.1
    corpus when its 8-digit weighted sum (8 instr + 8 substr + 8 mul +
    7 add per element per band) became one conv (round 8).

    NOT usable in oracle SQL — DuckDB has no ``conv``; the oracle side
    keeps ``hex_to_long``. ndigits must stay <= 15 so the value fits
    BIGINT without the unsigned wrap conv applies at 16 digits."""
    if ndigits > 15:
        raise ValueError("conv() wraps to signed past 15 hex digits")
    return f"CAST(conv(substr({expr}, {start}, {ndigits}), 16, 10) AS BIGINT)"


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
    # hex_to_long_spark, not md5_long: the per-token hash runs inside
    # the aggregate lambda (interpreted per element), where the
    # portable 8-digit instr/substr sum costs ~30 expression nodes per
    # token vs one native conv (bit-identical; same rationale and pin
    # as the minhash bands — see hex_to_long_spark)
    tok_int = hex_to_long_spark("md5(t)", 1, 8)
    return (
        f"aggregate({tokens_expr_spark}, CAST(0 AS BIGINT), "
        f"(acc, t) -> (acc * 31 + {tok_int}) % 1000000007)"
    )
