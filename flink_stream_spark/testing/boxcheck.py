"""Box-sanity preflight for the opt-in perf gates.

Round-9 finding: the sf1 gates failed with 2-8x inflation on EVERY
memory-heavy query while cache-resident CPU loops stayed fast — a
fresh 1 GB numpy copy measured 50-196 s against the ~0.3-4 s a
healthy run of the same box delivers (host-level memory provisioning
degradation; guest load, CPU burn benchmarks, and disk dd all looked
normal). A per-query 2x wall-clock bound is MEANINGLESS under a
~100x memory-bandwidth fault, and a gate that emits a breach list on
a broken box teaches the wrong lesson. So every gate first measures
the one resource the wedge joins, shuffles, and codec stages
actually bind on — large-working-set memory throughput — and
refuses to evaluate bounds when the box cannot provision memory at a
sane rate. The threshold (0.15 GB/s effective on a fresh-allocation
1 GB copy) sits ~3x below the worst healthy measurement and ~10x
above the measured broken state, so it cannot mask a genuine plan
regression: plans do not change memory provisioning rates.
"""

from __future__ import annotations

import time

# effective GB/s = 2 * size / wall (read + first-touch write);
# healthy box: 0.5-5 GB/s on a fresh 1 GB copy; broken: 0.01-0.04
MIN_EFFECTIVE_GBPS = 0.15
_PROBE_MB = 1024


def memory_throughput_gbps(probe_mb: int = _PROBE_MB) -> float:
    """Effective GB/s of one fresh-allocation numpy copy of
    ``probe_mb`` MB (read + first-touch-faulted write)."""
    import numpy as np

    a = np.ones(probe_mb * 1024 * 1024 // 8)
    t0 = time.perf_counter()
    b = a.copy()
    wall = time.perf_counter() - t0
    del a, b
    return 2 * probe_mb / 1024 / wall


def require_healthy_box() -> float:
    """Returns the measured throughput, or raises RuntimeError with
    the measurement when the box is too degraded for wall-clock
    bounds to mean anything."""
    gbps = memory_throughput_gbps()
    if gbps < MIN_EFFECTIVE_GBPS:
        raise RuntimeError(
            f"box memory throughput {gbps:.3f} GB/s is below the "
            f"{MIN_EFFECTIVE_GBPS} GB/s sanity floor (healthy: "
            "0.5-5 GB/s; the round-9 host-degradation incident "
            "measured 0.01-0.04). Perf bounds are not evaluable on "
            "this box right now — re-run the gate when the box "
            "recovers; do NOT re-record records under this state."
        )
    return gbps
