"""W2 sequence-feature assembly (ref concatenate_features,
/root/reference/gan.py:348-385): for each row, the window of the previous k
values + the current value as a flat array, plus the next row's value as the
prediction target — the reference's GAN/CRNN input tensor shape, built with
lag/lead window functions (no UDF, no collect).

Head rows are zero-padded exactly like the reference (gan.py:357-360 pads the
first sequence_length rows with zeros).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sequence_features(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """(group, order..., features array<double>[k+1], target double)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    lags = [
        F.coalesce(F.lag(F.col(value_col), i).over(w), F.lit(0.0)).cast("double")
        for i in range(k, 0, -1)
    ]
    feats = F.array(*lags, F.col(value_col).cast("double"))
    return df.select(
        group_col,
        *order_cols,
        feats.alias("features"),
        F.lead(F.col(value_col)).over(w).cast("double").alias("target"),
    )
