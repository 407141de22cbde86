"""SimHash fingerprint kernel — shared SQL generators for both engines.

Leaf module (imports nothing from plans.*) so that both
``plans.dedup_advanced`` (the simhash lanes) and ``plans.dedup`` (the
cap audit, which surfaces simhash band-bucket sizes) can use the same
generated expressions without a circular import.

Portability contract: a 64-bit fingerprint needs per-bit token votes.
Both engines share md5; the per-bit extraction (hex digit → 4 bits) is
emitted as generated SQL in each dialect (Spark: shiftright/&, DuckDB:
>>/&) from ONE Python generator, so the 64 aggregate expressions are
structurally identical and the fingerprints match bit-for-bit.
"""

from __future__ import annotations

_HEX = "0123456789abcdef"


def _digit_cols(dialect: str = "duckdb") -> list[str]:
    """16 per-token hex-digit values d1..d16 ∈ [0,15], extracted ONCE
    per token; the 64 bit-votes read them with shift/mask arithmetic.

    DuckDB form: instr('0123456789abcdef', substr(h, p, 1)) - 1 — one
    string op per digit. Spark form: the caller pre-parses the two
    8-hex-char halves once per token (`_HALF_COLS`: conv(·,16,10) —
    32 bits each, bigint-safe, staged in their own projection so the
    parse isn't repeated 8× per half) and the digits are nibble
    shifts — two string parses per token instead of 16, the rest
    integer ops. Values are identical; only the engines' cheapest path
    differs.
    """
    if dialect == "spark":
        cols = []
        for p in range(1, 17):
            c, pos = ("c1", p) if p <= 8 else ("c2", p - 8)
            cols.append(
                f"CAST(shiftright({c}, {4 * (8 - pos)}) & 15 AS INT) AS d{p}"
            )
        return cols
    return [
        f"(instr('{_HEX}', substr(h, {p}, 1)) - 1) AS d{p}" for p in range(1, 17)
    ]


_HALF_COLS = [
    "CAST(conv(substr(h, 1, 8), 16, 10) AS BIGINT) AS c1",
    "CAST(conv(substr(h, 9, 8), 16, 10) AS BIGINT) AS c2",
]


def _simhash_bit_votes(dialect: str) -> list[str]:
    """64 aggregate expressions: vote sum for each fingerprint bit.

    Bit j lives in hex digit position j//4 (1-based) at sub-bit j%4,
    read from the pre-extracted d{pos} columns.
    """
    exprs = []
    for j in range(64):
        pos, b = j // 4 + 1, j % 4
        bit = f"(shiftright(d{pos}, {b}) & 1)" if dialect == "spark" else f"((d{pos} >> {b}) & 1)"
        exprs.append(f"sum(2 * {bit} - 1)")
    return exprs


def _simhash_select(dialect: str) -> str:
    votes = _simhash_bit_votes(dialect)
    bits = ", ".join(f"CASE WHEN {v} > 0 THEN '1' ELSE '0' END" for v in votes)
    return f"concat({bits})"


_TOKENS_SQL = f"""
      SELECT doc_id, {", ".join(_digit_cols())}
      FROM (
        SELECT doc_id, md5(t.token) AS h
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             UNNEST(toks) AS t(token)
      )
"""
