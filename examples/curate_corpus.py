#!/usr/bin/env python
"""Training-corpus curation walkthrough — every stage a pre-training
data build runs, each one a registry operator (SURVEY §2C NS):

  quality gate → exact dedup → near-dedup clusters → canonical docs →
  benchmark decontamination → temperature resampling → chunking →
  corpus health reports (dup rate, vocab coverage, split counts).

The reference delegates all of this to external query layers
(reference: README.md:175-179); here it is one PySpark session over
the parquet corpus.

Usage: python examples/curate_corpus.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401  (imports populate REGISTRY)
from flink_stream_spark import get_spark
from flink_stream_spark.operators import REGISTRY

STAGES = [
    ("1. quality + dedup survivors", "pipeline_corpus_curation"),
    ("1b. Gopher hard-filter battery", "quality_gopher_rules"),
    ("1c. unigram rarity scores", "text_unigram_rarity"),
    ("2. near-dup clusters", "dedup_cluster_assign"),
    ("2b. duplicated spans (ExactSubstr)", "dedup_exact_substr_spans"),
    ("2c. boilerplate line removal (C4)", "text_line_dedup"),
    ("2d. new-batch dedup vs index", "dedup_incremental_new_batch"),
    ("2e. semantic dedup (SemDeDup)", "dedup_semdedup_cluster"),
    ("3. canonical doc per cluster", "dedup_canonical_doc"),
    ("4. dup rate by source", "dedup_rate_by_source"),
    ("5. benchmark decontamination", "text_decontaminate_overlap"),
    ("5b. PII redaction", "text_pii_redact"),
    ("6. temperature resampling", "sample_temperature_resample"),
    ("6b. weighted priority sample", "sample_priority_weighted"),
    ("6c. DSIR importance scores", "sample_dsir_importance"),
    ("7. train/val/test split", "sample_train_split"),
    ("7b. length-curriculum bins", "corpus_curriculum_bins"),
    ("8. chunk windows", "text_chunk_windows"),
    ("8b. BPE merge training", "text_bpe_train"),
    ("9. vocab coverage", "text_vocab_coverage"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curate-corpus", cpus=8)
    for title, name in STAGES:
        df = REGISTRY[name].build(spark, sf_dir)
        rows = df.count()
        print(f"\n== {title} ({name}): {rows} rows ==")
        df.show(5, truncate=60)
    print("done.")


if __name__ == "__main__":
    main()
