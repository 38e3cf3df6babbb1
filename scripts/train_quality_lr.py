"""Produce the committed quality-classifier model
(models/quality_lr.json): distill the Gopher rule set into a
fastText-style hashed-BoW logistic model at sf0.01.

Deterministic end to end — md5 feature hashing, zero-init full-batch
GD, no RNG — so re-running this script reproduces the committed file
byte-for-byte. Re-run after changing gopher_rules defaults or the
tokenizer.

Usage: python scripts/train_quality_lr.py [out_path]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from faiss_vector_search_spark import io as fio
from faiss_vector_search_spark.operators import classifier, textstats
from faiss_vector_search_spark.session import get_spark


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "faiss_vector_search_spark", "models", "quality_lr.json",
    )
    spark = get_spark(app_name="train-quality-lr", master="local[8]",
                      shuffle_partitions=8)
    docs = fio.load_table(spark, "/root/testdata/sf0.01", "documents")
    labels = textstats.gopher_rules(docs).select(
        "doc_id", F.col("keep").cast("int").alias("label")
    )
    model = classifier.train_quality_classifier(
        docs, labels, n_buckets=64, hash_fn="md5"
    )
    # training provenance, read by humans not by the scorer
    model["trained_on"] = "sf0.01 documents, gopher_rules keep labels"
    with open(out, "w") as f:
        json.dump(model, f, indent=1)
    print("wrote", out)
    # quick in-sample agreement report
    scored = classifier.score_quality_classifier(docs, model, hash_fn="md5")
    j = scored.join(labels, "doc_id")
    agree = j.where(
        (j["keep"].cast("int") == j["label"])
    ).count() / j.count()
    print(f"in-sample agreement with gopher keep: {agree:.3f}")


if __name__ == "__main__":
    main()
