"""Arrow-vectorized kernels — the Pandas-UDF escape hatch, demonstrated
on cosine similarity.

The engine keeps every hot path JVM-side (zip_with/aggregate compile
into whole-stage codegen); this module exists for the cases that
genuinely need numpy (BLAS-backed matrix math, model inference): a
`pandas_udf` receives Arrow batches, so the per-row Python cost is
amortized to per-BATCH, ~10-100× cheaper than a row-at-a-time UDF. The
cosine kernel below stacks each batch into one (batch × dim) ndarray
and lets numpy do a single vectorized multiply-reduce per batch.

Equivalence with the JVM path is enforced by the oracle pairing of
`similarity_cosine_topk_pandas` (same DuckDB oracle as the zip_with
lane) — the Arrow path must produce value-identical results, not just
close ones (float64 end to end, index-order sums via np.einsum on
contiguous arrays... in practice np sums pairwise; equality holds after
the shared round(…, 6) because both operands are float64 dot products
of the same 64 values — verified by the gate at both SFs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def cosine_sim_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Batched cosine similarity of two array<double> columns."""
    a = np.stack(va.to_numpy())
    b = np.stack(vb.to_numpy())
    dots = np.einsum("ij,ij->i", a, b)
    na = np.sqrt(np.einsum("ij,ij->i", a, a))
    nb = np.sqrt(np.einsum("ij,ij->i", b, b))
    return pd.Series(dots / (na * nb))
