#!/usr/bin/env python
"""Measure IVF recall@5 under the ADAPTIVE nprobe rule vs a PINNED
nprobe=2 on the recall-discriminating clustered fixture
(flink_stream_spark/testing/ann_fixture.py), at three corpus scales.
Records the table PLANS.md cites — the data behind keeping (or
revising) the n^(1/4) adaptive rule. Run: python tools/ann_recall_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_stream_spark import get_spark  # noqa: E402
from flink_stream_spark.operators.similarity import (  # noqa: E402
    ivf_nlist,
    ivf_nprobe,
    ivf_recall_frame,
)
from flink_stream_spark.testing.ann_fixture import write_embeddings_fixture  # noqa: E402


def mean_recall(spark, d, nprobe):
    rows = ivf_recall_frame(spark, d, nprobe=nprobe).collect()
    return sum(r["recall"] for r in rows) / len(rows)


def main() -> None:
    spark = get_spark(cpus=16)
    print("| n | nlist | adaptive nprobe | recall adaptive | recall pinned-2 |")
    print("|---|---|---|---|---|")
    for n in (4096, 16384, 65536):
        d = os.path.join(tempfile.gettempdir(), f"ann_fixture_{n}")
        write_embeddings_fixture(d, n)
        nlist = ivf_nlist(n)
        np_ad = ivf_nprobe(nlist)
        ra = mean_recall(spark, d, None)
        rp = mean_recall(spark, d, 2)
        print(f"| {n} | {nlist} | {np_ad} | {ra:.3f} | {rp:.3f} |")


if __name__ == "__main__":
    main()
