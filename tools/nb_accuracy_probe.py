"""NB model-variant accuracy comparison for SCALE_NOTES: train/score
on the documents table (labels = lang) in four configurations —
unigram, unigram+calibration, bigram, bigram+calibration — and report
self-classification accuracy (fraction of docs whose argmax label is
their own training label). Self-accuracy overstates generalization
for every variant equally; the DELTA between variants is the number
worth recording (the gate already pins exactness per variant).

Usage: python tools/nb_accuracy_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from pyspark.sql import functions as F

from amaxa_spark import get_spark
from amaxa_spark.operators.text import nb_classify


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("nb_accuracy_probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    out = {"sf_dir": sf_dir, "n_docs": n_docs}
    for name, kw in [
        ("unigram", {}),
        ("unigram_cal", {"weight_norm": True}),
        ("bigram", {"ngram": 2}),
        ("bigram_cal", {"ngram": 2, "weight_norm": True}),
    ]:
        t0 = time.time()
        pred = nb_classify(docs, docs, "text", "doc_id", "lang", **kw)
        joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
        agg = joined.agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("label_pred") == F.col("lang")).cast("long")
            ).alias("ok"),
        ).collect()[0]
        out[name] = {
            "scored": agg["n"],
            "acc": round(agg["ok"] / agg["n"], 4),
            "wall_s": round(time.time() - t0, 1),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
