"""Cross-engine rounding parity for per-row doubles.

Spark's ``F.round`` rounds the SHORTEST DECIMAL REPR of a double
(``BigDecimal.valueOf`` goes through ``Double.toString``); DuckDB (and
C/C++ engines generally) round the BINARY value.  The two agree except
when the value sits within ~1 ulp of a decimal half boundary -- which
per-row RATIONALS OF SMALL INTEGERS (token ratios, overlap fractions,
integer-fixed-point back-division) actually hit: the r18 unicode
parity sweep caught quality_score minting 0.7213 on the Spark side and
0.7212 in DuckDB for the same double 0.72124999...947 (shortest repr
'0.72125').  Transcendental-valued columns (cosines over float norms,
log scores) never terminate at the rounding digit and are safe with
either spelling.

:func:`round_parity` is the DuckDB-compatible spelling --
``floor(|x| * 10^d + 0.5)`` on the magnitude, probe-verified
bit-compatible with DuckDB's double ``round()`` -- for any per-row
double an oracle replays.  Keep plain ``F.round`` where the input is
already a clean fixed-point value (e.g. re-rounding a sum of 1e-9
fixed-point terms at 9 digits) or a DECIMAL (exact either way, and a
double round-trip would LOSE precision).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_parity(col: Column | str, scale: int) -> Column:
    """Round half away from zero on the BINARY double value --
    bit-compatible with DuckDB's ``round(x, d)`` for doubles.  NULL in,
    NULL out.  See the module docstring for when to prefer this over
    ``F.round``."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**scale))
    mag = F.floor(F.abs(c) * p + F.lit(0.5)) / p
    return F.when(c < 0, -mag).otherwise(mag)
