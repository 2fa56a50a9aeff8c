#!/usr/bin/env python
"""Scale probe: replicate the documents corpus N× (perturbed doc_ids,
written to /tmp) and measure how the dedup/text pipelines scale.

Not part of the driver gates — an engineering check that the declared
scale paths really are ~linear in input size (a superlinear blow-up
here means a hidden O(n²) stage or a serialization point).

Usage: python tools/scale_probe.py [factor=8]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_stream_spark import get_spark  # noqa: E402
from flink_stream_spark.operators import REGISTRY  # noqa: E402
import flink_stream_spark.operators.dedup  # noqa: F401,E402
import flink_stream_spark.operators.text  # noqa: F401,E402
import flink_stream_spark.operators.similarity  # noqa: F401,E402
import flink_stream_spark.operators.corpus_ops  # noqa: F401,E402
import flink_stream_spark.operators.quality  # noqa: F401,E402
import flink_stream_spark.operators.multimodal  # noqa: F401,E402

PROBES = [
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "text_fingerprint",
    "dedup_simhash",
    "text_chunk_windows",
    "text_decontaminate_overlap",
    "text_bpe_pair_merges",
    "quality_classifier_score",
    "corpus_pack_sequences",
    # round-5 additions
    "multimodal_image_dedup_dhash",
    "text_bpe_encode",
    "quality_mad_outliers",
    "dedup_semdedup_cluster",
]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("scale-probe")
    base = "/root/testdata/sf0.1"
    work = f"/tmp/flink_stream_spark/scale_probe_x{factor}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    d = spark.read.parquet(f"{base}/documents.parquet")
    n0 = d.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    big = (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            # perturb: replica tag changes the tail so replicas are not
            # exact dups but near-dups of each other
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(32)
    )
    big.write.mode("overwrite").parquet(f"{work}/documents.parquet")
    for t in ("embeddings",):
        shutil.copy(f"{base}/{t}.parquet", f"{work}/{t}.parquet")
    n1 = spark.read.parquet(f"{work}/documents.parquet").count()
    print(f"corpus: {n0} -> {n1} docs ({factor}x)")

    def materialize(df) -> None:
        # noop sink: every output row/column fully computed (a bare
        # count() would let Catalyst prune the measured expressions)
        df.write.format("noop").mode("overwrite").save()

    for name in PROBES:
        spec = REGISTRY[name]
        df_small = spec.build(spark, base)
        df_large = spec.build(spark, work)
        small, large = df_small.count(), df_large.count()  # untimed

        def timed(df) -> float:
            materialize(df)  # warm/codegen
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(df)
                best = min(best, time.perf_counter() - t0)
            return best

        t_small = timed(df_small)
        t_large = timed(df_large)
        ratio = t_large / max(t_small, 1e-9)
        print(
            f"{name}: sf0.1 {small} rows {t_small:.2f}s | x{factor} {large} rows "
            f"{t_large:.2f}s | time ratio {ratio:.1f} (linear would be ~{factor})"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
