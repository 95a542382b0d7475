"""Spark operator for LaTeX reconciliation (J5).

The reference reconciles a primary engine's text with a math-specialist
engine's text per document (``reconciler.py:83-135``); here both texts
are columns of the same row, so reconciliation is one Arrow map pass —
no join, no shuffle, scale-free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RECONCILE_SCHEMA = StructType(
    [
        StructField("merged_text", StringType()),
        StructField("n_latex_merged", IntegerType()),
    ]
)


def reconcile_latex(
    df: DataFrame, base_col: str = "base_text", source_col: str = "source_text"
) -> DataFrame:
    """Adds ``merged_text`` + ``n_latex_merged``: LaTeX blocks from
    ``source_col`` grafted into ``base_col`` (kernel/reconcile.py)."""

    @F.pandas_udf(RECONCILE_SCHEMA)
    def udf(base: pd.Series, source: pd.Series) -> pd.DataFrame:
        from smart_ocr_spark.kernel.reconcile import merge_latex_into_text

        rows = [
            merge_latex_into_text(b or "", s or "")
            for b, s in zip(base, source)
        ]
        return pd.DataFrame(rows, columns=["merged_text", "n_latex_merged"])

    return (
        df.withColumn("_rec", udf(F.col(base_col), F.col(source_col)))
        .select("*", "_rec.*")
        .drop("_rec")
    )
