"""Cross-engine exactness idioms, single-sourced.

md5 hex-prefix integers (below) and tie-safe quantized float sums
(:func:`sum_q9`/:func:`mean_q9`) — fragments that MUST be byte-for-byte
twins between the Spark query and its DuckDB oracle.

Several operators need a deterministic integer in [0, 2^32) derived from
a key — reproducible hash sampling (q69, q99zb, q99zj/q99zk boundary
samples), split assignment (q99zp), priority sampling (q99o family),
simhash word hashes (q42/q43) — computed IDENTICALLY by Spark and DuckDB
so the oracle comparison is bit-exact. Spark has ``conv(substring(md5(x),
1, 8), 16, 10)``; DuckDB has no hex-cast builtin shared with Spark, so
the hex-digit positional sum is spelled out. Before this helper the two
fragments were copy-pasted at eight sites; editing one engine's copy (or
one site's modulus) without its twin silently breaks the bit-exactness
contract the idiom exists for.
"""

from __future__ import annotations


def md5_hex32_duck(col_sql: str) -> str:
    """DuckDB SQL: integer value of the first 8 hex chars of
    ``md5(col_sql)`` — parenthesized, safe to embed in any expression."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({col_sql}), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )


def md5_hex32_spark(col_sql: str) -> str:
    """Spark SQL twin of :func:`md5_hex32_duck` (same value, BIGINT)."""
    return f"CAST(conv(substring(md5({col_sql}), 1, 8), 16, 10) AS BIGINT)"


def sum_q9(col_sql: str) -> str:
    """Engine-portable EXACT scale-9 quantized sum of float/double values
    (one SQL string, valid in both Spark and DuckDB — use with F.expr on
    the Spark side). Yields DECIMAL * 1e9; divide by 1e9 after casting to
    double, or use :func:`mean_q9`.

    Why not ``SUM(CAST(x AS DECIMAL(18,9)))``: the double->decimal CAST
    rounds ties differently per engine — Spark HALF_UP, DuckDB half-even
    — and float32 data hits exact .5e-9 ties routinely (any value
    odd/2^10, e.g. 0.1494140625: Spark 0.149414063, DuckDB 0.149414062).
    q54/q89 diverged at sf0.1 exactly this way while passing the sparser
    sf0.01 gate (the q36 density-sensitivity class, CORRECTNESS_SF01).
    ``round()`` on DOUBLE rounds half AWAY FROM ZERO in both engines, so
    scaling by 1e9, round(), then casting the now-integral double to
    decimal is tie-free and exact; the decimal SUM is order-independent.

    Scale bound: DECIMAL(38,0) holds sums to 1e38; the later cast of the
    sum to double is exact while |sum| < 2^53, i.e. ~9e6 unit-magnitude
    values per GROUP — beyond that both engines round the same IEEE
    nearest-even way on the same exact decimal, so they still agree."""
    return (
        f"SUM(CAST(round(CAST({col_sql} AS DOUBLE) * 1e9)"
        " AS DECIMAL(38,0)))"
    )


def mean_q9(col_sql: str) -> str:
    """Engine-portable exact-sum mean of float/double values: the scale-9
    quantized sum divided back down, then by COUNT(*) — identical IEEE
    double ops in both engines."""
    return f"CAST({sum_q9(col_sql)} AS DOUBLE) / 1e9 / COUNT(*)"
