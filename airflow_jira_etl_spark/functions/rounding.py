"""Cross-engine stable rounding for oracle-compared float columns.

Different engines disagree at exact half-way rounding boundaries
(Spark rounds the shortest-decimal rendering HALF_UP; C-family engines
round the scaled binary value half-away-from-zero). Exact-decimal
inputs (prices with 2 decimals, whole quantities) hit those boundaries
SYSTEMATICALLY under division/averaging, so ``round(x, 4)`` alone is
not reproducible across engines.

Convention (applied on BOTH the Spark and the oracle-SQL side):

    round(x + 1e-9, 4)

The 1e-9 nudge pushes any exact-boundary value deterministically above
the boundary in every engine, while being far too small to move any
non-boundary value across one (boundary spacing is 5e-5). Values large
enough that 1e-9 is below one ulp were never systematically at
boundaries (their low decimals are already arbitrary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9
DP = 4


def fround(col: Column, dp: int = DP) -> Column:
    """Boundary-stable round for oracle-compared float columns."""
    return F.round(col + F.lit(EPS), dp)


def sql_fround(expr: str, dp: int = DP) -> str:
    """The same convention, as oracle SQL text."""
    return f"round(({expr}) + 1e-9, {dp})"
