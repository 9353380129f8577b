"""Arrow-vectorized vector math (`pandas_udf`) — the sanctioned Python path.

The engine's rule (README, tests/test_plans.py): relational operators stay
JVM-side. When numpy genuinely wins — wide embedding math, future
model-inference hooks — the ONLY acceptable Python shape is an Arrow-batched
``pandas_udf``: columns cross the JVM↔Python boundary once per batch as
Arrow buffers and are processed as whole numpy matrices, 10-100× faster
than row-at-a-time UDFs (SURVEY.md §2.8; SNIPPETS.md [2],[3]).

``cosine_pandas`` is the reference implementation of the pattern, kept
deliberately equivalent to the JVM ``operators/similarity.py`` cosine so
tests can pin Python↔JVM agreement (≤1e-9): at dim 64 the JVM zip_with/
aggregate fold wins on overhead; past dim ~1k the numpy BLAS path wins —
measure per workload, both are one import away.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """One Arrow batch: stack the array column into a (rows, dim) matrix and
    do the whole batch in three BLAS calls — no per-row Python."""
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


def cosine_pandas(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two ``array<float>`` columns via the Arrow path."""
    return _cosine_batch(F.col(a) if isinstance(a, str) else a,
                         F.col(b) if isinstance(b, str) else b)
