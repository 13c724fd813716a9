"""Global-MAD outlier variant (the reference's second, simpler detector).

Reference: /root/reference/updated_processor.py:27-54 — one global median/MAD
per series, modified z = 0.6745·|v − median|/max(MAD, 1e-4); flagged values
replaced with the global median; NaNs preserved and never flagged (pinned by
scripts/tests/test_updated_processor.py:31-47).

Unlike the windowed pipeline this is fully expressible in native Spark SQL
(see operators/textops.py / __spark_entry__.py q_global_mad) — this pandas
version exists for the parity tests.
"""

from __future__ import annotations

import numpy as np

MAD_FLOOR = 1e-4
Z_CONST = 0.6745


def global_mad_correct(values: np.ndarray, threshold: float = 3.0) -> tuple[np.ndarray, np.ndarray]:
    """Return (corrected, outlier_mask)."""
    arr = np.asarray(values, dtype=np.float64)
    median = np.nanmedian(arr)
    abs_dev = np.abs(arr - median)
    mad = max(np.nanmedian(abs_dev), MAD_FLOOR)
    with np.errstate(invalid="ignore"):
        z = Z_CONST * abs_dev / mad
        outliers = z > threshold  # NaN z ⇒ False ⇒ NaNs preserved
    corrected = arr.copy()
    corrected[outliers] = median
    return corrected, outliers
