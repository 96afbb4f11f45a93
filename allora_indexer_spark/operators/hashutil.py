"""Cross-engine md5 hex-prefix integer idiom, single-sourced.

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
