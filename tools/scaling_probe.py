"""Scale-trend probe (r8 verdict item 4): run the sf-parameterized
headline queries at sf0.001 / sf0.01 / sf0.1, record wall, JVM
executor time, and shuffle-write bytes per query, and fit observed
scaling exponents — evidence of how cost ACTUALLY grows with data,
not just plan inspection.

Exponent = log10(metric(0.1) / metric(0.01)) — one decade of scale
(the two largest SFs; the smallest is reported but excluded from the
fit because fixed per-query overheads dominate it).  Exponent ~1.0 =
linear; the copurchase cache build is intrinsically superlinear in
docs-per-order (k² pairs per order) and is called out as such.

Wall-clock at these SFs is mostly fixed planning overhead, so the
verdict column keys off the EXEC exponent (and shuffle bytes, the
scale-up killer).  Corpus-graph queries (g4x/g7x/q175) are excluded:
their input is the fixed 1,202-file reference corpus, not sf-scaled.

Writes SCALING.md at the repo root and prints one JSON line.
Run on an IDLE box: python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import math
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

QUERIES = [
    "q01_pricing_summary",
    "q03_top_unshipped_orders",
    "q05_region_nation_revenue",
    "q07_window_top_orders_per_customer",
    "q09_events_hourly_tumbling",
    "q11_sessionization",
    "q20_dedup_exact",
    "q22_dedup_minhash_lsh",
    "q23_dedup_simhash",
    "q24_text_stats",
    "q26_ann_bruteforce_topk",
    "q27_ann_lsh_topk",
    "q28_embedding_neardup_pairs",
    "q166_link_prediction_copurchase",
    "q172_entity_resolution",
    "q203_curation_with_pii",
]

# per-query scale notes that override the automatic verdict (the
# exponents still print, so a regression past these explanations is
# visible in the numbers)
NOTES = {
    # the copurchase build joins lineitem with itself per order:
    # Σ_orders k² pairs with k = lines per order — quadratic in k,
    # which is sf-INVARIANT (same order-size distribution at every
    # sf), hence linear in sf; q166 consumes the aggregated cache
    "cache_copurchase": (
        "quadratic in lines-per-order (sf-invariant) => LINEAR in sf; "
        "cache pins the aggregated frame"
    ),
    # within-block pair fan-out is quadratic in block occupancy, and
    # occupancy grows with sf until entity.candidate_pairs' max_block
    # cap (10k) drops pathological blocks loudly — pre-cap regime at
    # these SFs, bounded at true scale
    "q172_entity_resolution": (
        "pre-cap regime: blocked-pair shuffle ~sf^1.6 until the "
        "max_block=10k guard bounds it (documented)"
    ),
}


class StageClock:
    """Delta reader over the status REST API: (executorRunTime_ms,
    shuffleWriteBytes) summed over completed stages (bench.py's
    ExecClock plus the shuffle counter)."""

    def __init__(self, spark):
        url = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        self._ep = (
            f"{url}/api/v1/applications/{app}/stages?status=complete"
            if url
            else None
        )
        self._last = self._read()

    def _read(self):
        if not self._ep:
            return None
        try:
            with urllib.request.urlopen(self._ep, timeout=10) as r:
                stages = json.load(r)
            return (
                sum(s.get("executorRunTime", 0) for s in stages),
                sum(s.get("shuffleWriteBytes", 0) for s in stages),
            )
        except Exception:
            return None

    def delta(self):
        cur = self._read()
        for _ in range(8):
            time.sleep(0.25)
            nxt = self._read()
            if nxt == cur:
                break
            cur = nxt
        prev, self._last = self._last, cur
        if cur is None or prev is None:
            return None, None
        return cur[0] - prev[0], cur[1] - prev[1]


def main() -> int:
    from graphdb_neo4j_spark import get_spark
    from graphdb_neo4j_spark.sources.tables import TABLE_NAMES, load_table
    from graphdb_neo4j_spark.workloads import QUERY_FNS, _copurchase_edges

    spark = get_spark(
        "scaling-probe",
        **{
            "spark.ui.enabled": "true",
            "spark.ui.port": "4048",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    clock = StageClock(spark)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, dict]] = {}
    for sf in SFS:
        tag = sf.rsplit("sf", 1)[-1]
        for t in TABLE_NAMES:
            load_table(spark, sf, t).count()  # footer/JIT warm, uncounted
        # the shared cache, measured as its own row (uncounted in q166)
        clock.delta()
        t0 = time.perf_counter()
        _copurchase_edges(spark, sf).count()
        wall = time.perf_counter() - t0
        ems, shuf = clock.delta()
        results.setdefault("cache_copurchase", {})[tag] = {
            "wall_s": round(wall, 3),
            "exec_ms": ems,
            "shuffle_mb": None if shuf is None else round(shuf / 1e6, 2),
        }
        for name in QUERIES:
            clock.delta()
            t0 = time.perf_counter()
            run(QUERY_FNS[name](spark, sf))
            wall = time.perf_counter() - t0
            ems, shuf = clock.delta()
            results.setdefault(name, {})[tag] = {
                "wall_s": round(wall, 3),
                "exec_ms": ems,
                "shuffle_mb": None if shuf is None else round(shuf / 1e6, 2),
            }
            print(f"[{tag}] {name}: {wall:.2f}s exec={ems}ms", flush=True)

    def expo(a, b):
        if not a or not b or a <= 0 or b <= 0:
            return None
        return round(math.log10(b / a), 2)

    lines = [
        "# SCALING — observed scale trend of the sf-parameterized headline queries",
        "",
        "Measured by `tools/scaling_probe.py` on an idle box (one pass per",
        "sf, per-query deltas of JVM executorRunTime and shuffle-write bytes",
        "from the status REST API; tables pre-warmed per sf, the shared",
        "copurchase cache measured as its own row and pre-built before q166).",
        "",
        "`exec exp` / `shuffle exp` = log10 of the 0.01→0.1 ratio (one decade;",
        "1.0 = linear in sf).  Wall at these SFs is dominated by fixed planning",
        "cost, so exponents are computed on executor time and shuffle volume.",
        "Corpus-graph queries are sf-independent (fixed 1,202-file corpus) and",
        "out of scope here.",
        "",
        "| query | exec_ms @0.001/0.01/0.1 | shuffle MB @0.001/0.01/0.1 "
        "| exec exp | shuffle exp | verdict |",
        "|---|---|---|---|---|---|",
    ]
    summary = {}
    for name, by_sf in results.items():
        e = [by_sf.get(t, {}).get("exec_ms") for t in ("0.001", "0.01", "0.1")]
        s = [by_sf.get(t, {}).get("shuffle_mb") for t in ("0.001", "0.01", "0.1")]
        ee = expo(e[1], e[2])
        se = expo(s[1], s[2])
        worst = max(x for x in (ee, se, -9.9) if x is not None)
        if name in NOTES:
            verdict = NOTES[name]
        elif ee is None and se is None:
            verdict = "too small to fit (exec ~0 at these SFs)"
        elif worst <= 1.15:
            verdict = "linear"
        elif worst <= 1.35:
            verdict = "near-linear (log factors / fixed stage costs shrinking)"
        else:
            verdict = "CHECK: superlinear beyond noise"
        lines.append(
            "| {} | {} | {} | {} | {} | {} |".format(
                name,
                "/".join("-" if x is None else str(x) for x in e),
                "/".join("-" if x is None else str(x) for x in s),
                "-" if ee is None else ee,
                "-" if se is None else se,
                verdict,
            )
        )
        summary[name] = {"exec_exp": ee, "shuffle_exp": se}
    out_path = Path(__file__).resolve().parent.parent / "SCALING.md"
    out_path.write_text("\n".join(lines) + "\n")
    print(json.dumps({"metric": "scaling_probe", "exponents": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
