"""Cross-engine-stable numeric helpers shared by operators and oracles."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def q6(c: Column) -> Column:
    """floor(x*1e6 + 0.5)/1e6 — the engine-wide 6-decimal quantizer,
    deliberately NOT ``F.round``: on identical doubles sitting exactly
    on a 6-decimal boundary (integer-ratio and money arithmetic produce
    them; a cosine was caught doing it at sf0.1), Spark's round
    (shortest-decimal-string BigDecimal) and DuckDB's (binary value)
    can disagree by 1 ulp of the 6th decimal and flip rank orders. The
    floor form is pure IEEE ops, bit-identical across engines; its SQL
    twin ``floor(x * 1000000 + 0.5) / 1000000`` must be used verbatim
    in any paired oracle. One definition here so every Spark site stays
    in lockstep (ADVICE r4/r5: each hand-copied variant was an
    independent drift point, and one pairing did drift)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000
