"""Produce the committed quality-classifier model
(models/quality_lr.json): distill the Gopher rule set into a
fastText-style hashed-BoW logistic model at sf0.01.

Deterministic end to end — md5 feature hashing, zero-init full-batch
GD, no RNG — so re-running this script reproduces the committed file
byte-for-byte. Re-run after changing gopher_rules defaults or the
tokenizer.

Usage: python scripts/train_quality_lr.py [out_path] [train_sf_dir]

``train_sf_dir`` defaults to sf0.01; pass /root/testdata/sf0.1 to
train on the 10x labeled sample (agreement is evaluated on BOTH the
training corpus and sf0.01, which the pytest regression gate pins).
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
    train_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="train-quality-lr", master="local[8]",
                      shuffle_partitions=8)
    docs = fio.load_table(spark, train_dir, "documents")
    labels = textstats.gopher_rules(docs).select(
        "doc_id", F.col("keep").cast("int").alias("label")
    )
    model = classifier.train_quality_classifier(
        docs, labels, n_buckets=64, hash_fn="md5"
    )
    # training provenance, read by humans not by the scorer
    model["trained_on"] = (
        f"{train_dir.rstrip('/').rsplit('/', 1)[-1]} documents, "
        "gopher_rules keep labels"
    )
    with open(out, "w") as f:
        json.dump(model, f, indent=1)
    print("wrote", out)

    def agreement(sf_dir: str) -> float:
        d = fio.load_table(spark, sf_dir, "documents")
        lab = textstats.gopher_rules(d).select(
            "doc_id", F.col("keep").cast("int").alias("label")
        )
        scored = classifier.score_quality_classifier(d, model, hash_fn="md5")
        j = scored.join(lab, "doc_id")
        return j.where(
            (j["keep"].cast("int") == j["label"])
        ).count() / j.count()

    print(f"agreement on train corpus ({train_dir}): "
          f"{agreement(train_dir):.3f}")
    # the pytest regression gate pins sf0.01 agreement >= 0.8
    print(f"agreement on sf0.01 (gate corpus): "
          f"{agreement('/root/testdata/sf0.01'):.3f}")


if __name__ == "__main__":
    main()
