"""Evaluation-metric block ported from the reference as pure DataFrame aggs.

The reference computes all of these from numpy/sklearn on driver memory
(SURVEY.md §2.4 A6-A10); here every metric derives from ONE confusion-count
aggregation `groupBy(label, pred).count()` — a single shuffle of
O(classes²) rows — then arithmetic on that tiny frame. No sklearn, no UDF.

Ports (formula-exact):
- per-class precision/recall/F1/support  → ref cnn.py:238-242 (sklearn
  precision_recall_fscore_support(average=None))
- accuracy                               → ref cnn.py:620 (accuracy_score)
- per-class accuracy from CM             → ref cnn.py:86-109
- error rate decomposed into substitutions/deletions/insertions:
  s=min(FN,FP), d=max(0,FN−FP), i=max(0,FP−FN)  → ref cnn.py:112-146
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """A6: confusion matrix as (label, pred, n) rows (ref cnn.py:634)."""
    return (
        df.groupBy(
            F.col(label_col).cast("long").alias("label"),
            F.col(pred_col).cast("long").alias("pred"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _class_margins(cm: DataFrame) -> DataFrame:
    """Per class c: tp, rowsum (actual count), colsum (predicted count)."""
    classes = (
        cm.select(F.col("label").alias("c"))
        .unionByName(cm.select(F.col("pred").alias("c")))
        .distinct()
    )
    rows = cm.groupBy(F.col("label").alias("c")).agg(F.sum("n").alias("rowsum"))
    cols = cm.groupBy(F.col("pred").alias("c")).agg(F.sum("n").alias("colsum"))
    tps = cm.filter(F.col("label") == F.col("pred")).select(
        F.col("label").alias("c"), F.col("n").alias("tp")
    )
    return (
        classes.join(rows, "c", "left")
        .join(cols, "c", "left")
        .join(tps, "c", "left")
        .select(
            "c",
            F.coalesce("tp", F.lit(0)).cast("double").alias("tp"),
            F.coalesce("rowsum", F.lit(0)).cast("double").alias("rowsum"),
            F.coalesce("colsum", F.lit(0)).cast("double").alias("colsum"),
        )
    )


def prf_from_confusion(cm: DataFrame, ndigits: int = 6) -> DataFrame:
    """A9: per-class precision/recall/F1/support (ref cnn.py:238-242,622-632)."""
    m = _class_margins(cm)
    prec = F.when(F.col("colsum") > 0, F.col("tp") / F.col("colsum")).otherwise(0.0)
    rec = F.when(F.col("rowsum") > 0, F.col("tp") / F.col("rowsum")).otherwise(0.0)
    f1 = F.when(F.col("tp") > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return m.select(
        F.col("c").alias("label"),
        F.round(prec, ndigits).alias("prec"),
        F.round(rec, ndigits).alias("rec"),
        F.round(f1, ndigits).alias("f1"),
        F.col("rowsum").cast("long").alias("support"),
    )


def accuracy(df: DataFrame, label_col: str, pred_col: str, ndigits: int = 6) -> DataFrame:
    """A10: plain accuracy (ref accuracy_score, cnn.py:620)."""
    return df.agg(
        F.round(
            F.avg((F.col(label_col) == F.col(pred_col)).cast("double")), ndigits
        ).alias("accuracy")
    )


def per_class_accuracy(cm: DataFrame, ndigits: int = 6) -> DataFrame:
    """A7: (TP+TN)/total per class from the confusion matrix (ref cnn.py:86-109)."""
    total = cm.agg(F.sum("n").alias("total"))
    m = _class_margins(cm).crossJoin(F.broadcast(total))
    # TN = total − rowsum − colsum + tp ; acc_c = (TP+TN)/total
    acc = (F.col("tp") + (F.col("total") - F.col("rowsum") - F.col("colsum") + F.col("tp"))) / F.col(
        "total"
    )
    return m.select(F.col("c").alias("label"), F.round(acc, ndigits).alias("class_accuracy"))


def sdi_error(cm: DataFrame, ndigits: int = 6) -> DataFrame:
    """A8: substitution/deletion/insertion error decomposition per class +
    per-class error contribution (ref cnn.py:112-146, exact formula port:
    s=min(FN,FP), d=max(0,FN−FP), i=max(0,FP−FN), contribution=(s+d+i)/N)."""
    total = cm.agg(F.sum("n").cast("double").alias("total"))
    m = _class_margins(cm).crossJoin(F.broadcast(total))
    fn = F.col("rowsum") - F.col("tp")
    fp = F.col("colsum") - F.col("tp")
    s = F.least(fn, fp)
    d = F.greatest(fn - fp, F.lit(0.0))
    i = F.greatest(fp - fn, F.lit(0.0))
    return m.select(
        F.col("c").alias("label"),
        s.cast("long").alias("s"),
        d.cast("long").alias("d"),
        i.cast("long").alias("i"),
        F.round((s + d + i) / F.col("total"), ndigits).alias("err_contrib"),
    )
