"""Spreadsheet-safety scalar functions (the reference's F7 sanitizer).

Reference: scripts/spreadsheet_safety.py:8-46 — cells whose first
non-whitespace character is ``= + - @`` (or full-width ＝＋－＠) get a ``'``
prefix so spreadsheet apps don't execute them as formulas; the escape is
idempotent (already-escaped cells pass through). Null bytes are rejected
upstream; here they are stripped defensively.

Pure column expression — applies at CSV-export time for human-facing files
(the reference CI-enforces that every export routes through the sanitizer,
scripts/tests/test_export_sink_guard.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# first non-whitespace char is a formula trigger, and not already escaped
_TRIGGER_RE = r"^\s*[=+\-@＝＋－＠]"


def escape_formula(col) -> F.Column:
    """Idempotent formula-injection escape for one string column."""
    c = F.regexp_replace(col, "\x00", "")  # strip null bytes
    needs = c.rlike(_TRIGGER_RE) & ~c.startswith("'")
    return F.when(needs, F.concat(F.lit("'"), c)).otherwise(c)


def sanitize_for_export(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Escape every (or the given) string column before a human-facing CSV
    export — the distributed analog of write_csv_safely
    (spreadsheet_safety.py:341-344)."""
    from pyspark.sql.types import StringType

    if columns is None:
        columns = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    out = df
    for name in columns:
        out = out.withColumn(name, escape_formula(F.col(name)))
    return out


_INVALID_SHEET_CHARS = set("\\*?:/[]")


def validate_sheet_name(name: str) -> str:
    """Excel sheet-name validation (reference F8 —
    spreadsheet_safety.py:278-306): ≤31 chars, none of ``\\ * ? : / [ ]``,
    non-empty. Returns the name or raises ValueError."""
    if not name:
        raise ValueError("sheet name must be non-empty")
    if len(name) > 31:
        raise ValueError(f"sheet name exceeds 31 characters: {name!r}")
    bad = _INVALID_SHEET_CHARS.intersection(name)
    if bad:
        raise ValueError(f"sheet name contains invalid characters {sorted(bad)}: {name!r}")
    return name
