"""Vectorized (Arrow) pandas UDFs — the sanctioned Python escape hatch.

Rule of thumb enforced across this engine: built-in column expressions
first (whole-stage codegen, zero Python); when Python is genuinely
needed, Arrow-batched ``@pandas_udf`` (10-100x over row-at-a-time
Python UDFs); never ``F.udf``.

``cosine_to_query`` is the demonstration case: numpy does the
batch-matrix work per Arrow batch. The expression-based quantized form
in operators.similarity remains the oracle-checked path; tests pin the
two against each other.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def cosine_to_query(query_vec: list[float]) -> Column:
    """Returns a column function: embedding array<float> → cosine
    similarity to the fixed query vector, computed vectorized per
    Arrow batch (one matrix-vector product per batch, not per row)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @pandas_udf(DoubleType())
    def _cos(embs: pd.Series) -> pd.Series:
        m = np.stack(embs.map(lambda e: np.asarray(e, dtype=np.float64)))
        dots = m @ q
        norms = np.linalg.norm(m, axis=1)
        return pd.Series(dots / (norms * qn))

    return _cos
