"""Streaming sketch tests: batch ≡ stream equivalence (mergeability).

The defining property of HLL / count-min: sketching micro-batches and
folding the deltas must be BIT-IDENTICAL to sketching the whole input
at once, for any batch split.  maxFilesPerTrigger forces a multi-batch
split; the assertions compare full register/counter tables, not just
estimates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.sketch import (
    cms_counters,
    cms_estimate,
    hll_distinct,
    hll_merge_registers,
    hll_registers,
)
from graphdb_neo4j_spark.streaming.sketch import (
    cms_fold,
    compact_sketch_log,
    hll_estimate,
    streaming_cms,
    streaming_hll,
)


@pytest.fixture(scope="module")
def item_dir(spark, tmp_path_factory):
    """8 parquet files of (item) rows with overlapping values."""
    d = str(tmp_path_factory.mktemp("items"))
    rows = [(f"v{i % 700}",) for i in range(4000)]
    df = spark.createDataFrame(rows, ["item"])
    df.repartition(8).write.mode("overwrite").parquet(d)
    return d


def _run_stream(builder):
    q = builder.trigger(availableNow=True).start()
    q.awaitTermination(300)


def test_streaming_hll_matches_batch(spark, item_dir, tmp_path):
    state = str(tmp_path / "hll_state")
    stream = spark.readStream.schema("item string").option(
        "maxFilesPerTrigger", "2"
    ).parquet(item_dir)
    _run_stream(streaming_hll(stream, "item", state))

    batch_all = spark.read.parquet(item_dir)
    want = hll_distinct(batch_all, "item").head()
    got = hll_estimate(spark, state).head()
    assert got == want  # bit-identical, not approximately equal

    # register log spans multiple batches (the split actually happened)
    n_batches = (
        spark.read.parquet(f"{state}/hll_log")
        .select("batch_id").distinct().count()
    )
    assert n_batches >= 2

    # compaction preserves the estimate and shrinks the log to 1 batch
    compact_sketch_log(spark, state, "hll")
    assert hll_estimate(spark, state).head() == want
    assert (
        spark.read.parquet(f"{state}/hll_log")
        .select("batch_id").distinct().count()
        == 1
    )


def test_streaming_cms_matches_batch(spark, item_dir, tmp_path):
    state = str(tmp_path / "cms_state")
    stream = spark.readStream.schema("item string").option(
        "maxFilesPerTrigger", "2"
    ).parquet(item_dir)
    _run_stream(streaming_cms(stream, "item", state))

    batch_all = spark.read.parquet(item_dir)
    want = {
        (r.r, r.bucket): r.cnt for r in cms_counters(batch_all, "item").collect()
    }
    got = {(r.r, r.bucket): r.cnt for r in cms_fold(spark, state).collect()}
    assert got == want

    # point estimates through the folded counters match the batch path
    cand = spark.createDataFrame([("v0", 0), ("v699", 0)], ["item", "x"])
    est_stream = {
        r.item: r.cms_est
        for r in cms_estimate(cand, cms_fold(spark, state), "item").collect()
    }
    est_batch = {
        r.item: r.cms_est
        for r in cms_estimate(cand, cms_counters(batch_all, "item"), "item").collect()
    }
    assert est_stream == est_batch

    compact_sketch_log(spark, state, "cms")
    got2 = {(r.r, r.bucket): r.cnt for r in cms_fold(spark, state).collect()}
    assert got2 == want


def test_hll_merge_registers_equals_whole(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["v"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], ["v"])
    merged = hll_merge_registers(
        hll_registers(a, "v"), hll_registers(b, "v")
    )
    whole = hll_registers(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


# ---------------------------------------------------------------------------
# streaming SCD2 ≡ batch rebuild
# ---------------------------------------------------------------------------

def test_streaming_scd2_matches_batch(spark, tmp_path):
    from graphdb_neo4j_spark.sources.tables import load_table
    from graphdb_neo4j_spark.streaming.dim import scd2_history, streaming_scd2
    from graphdb_neo4j_spark.workloads import QUERY_FNS

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    # append-ordered split: 3 sequential time slices (the CDC contract)
    src = str(tmp_path / "ev_stream")
    ordered = events.orderBy("ts", "event_id").collect()
    n = len(ordered)
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = ordered[lo: lo + (n + 2) // 3]
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    state = str(tmp_path / "scd2_state")
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/part*")
    q = streaming_scd2(stream, state).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = {
        tuple(r)
        for r in scd2_history(spark, state)
        .select("user_id", "state", "effective_from_us", "effective_to_us",
                "version", "is_current")
        .collect()
    }
    want = {
        tuple(r)
        for r in QUERY_FNS["q61_scd2_user_state"](spark, sf)
        .select(F.col("user_id"), F.col("state"), F.col("effective_from_us"),
                F.col("effective_to_us"), F.col("version"), F.col("is_current"))
        .collect()
    }
    assert got == want
    # multiple batches actually ran
    n_batches = (
        spark.read.parquet(f"{state}/meta").select("batch_id").distinct().count()
    )
    assert n_batches >= 3


def test_progress_metrics_counts_late_drops(spark, tmp_path):
    """An event older than (max event time − watermark) at batch
    boundary is dropped by the watermarked aggregation: absent from the
    sink, with watermark progression visible in progress_metrics."""
    import time as _time

    from graphdb_neo4j_spark.streaming.ingest import progress_metrics

    src = str(tmp_path / "late_src")
    base = 1_700_000_000_000_000  # µs
    hour = 3_600_000_000
    on_time = [(base + i * hour, f"u{i}") for i in range(6)]
    spark.createDataFrame(on_time, "t long, u string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src}/f0")
    # second file: one fresh row + one row 5h older than the max seen
    spark.createDataFrame(
        [(base + 7 * hour, "fresh"), (base, "too_late")], "t long, u string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f1")

    stream = spark.readStream.schema("t long, u string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/f*")
    agg = (
        stream.select(F.timestamp_micros("t").alias("et"), "u")
        .withWatermark("et", "1 hour")
        .groupBy(F.window("et", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    out = str(tmp_path / "late_out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{out}_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    for _ in range(20):
        m = progress_metrics(q)
        if m["n_progress_events"]:
            break
        _time.sleep(0.5)
    assert m["input_rows"] == 8
    # watermark advanced past the first batch's max event time - delay
    assert m["last_watermark"] is not None
    # the data-level proof of the drop: the too_late row's window
    # ([base, base+1h), already expired+emitted in batch 1) would have
    # counted 2 rows if it had been accepted — the sink shows 1
    res = {
        (r["window"]["start"].isoformat(), r["n"])
        for r in spark.read.parquet(out).collect()
    }
    base_s = "2023-11-14T22:13:20"
    counts = {w: n for w, n in res}
    assert counts.get(base_s, 1) == 1  # too_late did NOT increment it


@pytest.fixture(scope="module")
def metric_dir(spark, tmp_path_factory):
    """8 parquet files of (grp, value) metric rows."""
    d = str(tmp_path_factory.mktemp("metrics"))
    rows = [
        ("g%d" % (i % 3), float((i * 37) % 1000) / 10.0) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    df.repartition(8).write.mode("overwrite").parquet(d)
    return d


def test_streaming_histogram_matches_batch(spark, metric_dir, tmp_path):
    from graphdb_neo4j_spark.operators.sketch import (
        fixed_histogram_counts,
        fixed_histogram_quantiles,
    )
    from graphdb_neo4j_spark.streaming.sketch import (
        histogram_estimate,
        histogram_fold,
        streaming_histogram,
    )

    LO, HI, NB = 0, 100_000_000, 64  # values live in [0, 100)
    state = str(tmp_path / "hist_state")
    stream = spark.readStream.schema("grp string, value double").option(
        "maxFilesPerTrigger", "2"
    ).parquet(metric_dir)
    _run_stream(streaming_histogram(stream, "grp", "value", state, LO, HI, NB))

    batch_all = spark.read.parquet(metric_dir)
    want_cells = {
        (r.g, r.bin): r.cnt
        for r in fixed_histogram_counts(
            batch_all, "grp", "value", LO, HI, NB
        ).collect()
    }
    got_cells = {
        (r.g, r.bin): r.cnt for r in histogram_fold(spark, state).collect()
    }
    assert got_cells == want_cells  # cell-exact, not approximate

    want_q = sorted(
        tuple(r)
        for r in fixed_histogram_quantiles(
            fixed_histogram_counts(batch_all, "grp", "value", LO, HI, NB),
            LO, HI, NB,
        ).collect()
    )
    got_q = sorted(
        tuple(r) for r in histogram_estimate(spark, state, LO, HI, NB).collect()
    )
    assert got_q == want_q

    # the split actually happened
    n_batches = (
        spark.read.parquet(f"{state}/hist_log")
        .select("batch_id").distinct().count()
    )
    assert n_batches >= 2

    # compaction preserves cells + estimates, folds log to one partition
    compact_sketch_log(spark, state, "hist")
    assert {
        (r.g, r.bin): r.cnt for r in histogram_fold(spark, state).collect()
    } == want_cells
    assert sorted(
        tuple(r) for r in histogram_estimate(spark, state, LO, HI, NB).collect()
    ) == want_q
    assert (
        spark.read.parquet(f"{state}/hist_log")
        .select("batch_id").distinct().count()
        == 1
    )


def test_streaming_histogram_clamps_out_of_range(spark, tmp_path):
    from graphdb_neo4j_spark.operators.sketch import fixed_histogram_counts

    df = spark.createDataFrame(
        [("g", -5.0), ("g", 0.5), ("g", 99.0)], "grp string, value double"
    )
    cells = {
        (r.g, r.bin): r.cnt
        for r in fixed_histogram_counts(
            df, "grp", "value", 0, 10_000_000, 10
        ).collect()
    }
    # -5 clamps into bin 0; 99 clamps into the top bin
    assert cells == {("g", 0): 2, ("g", 9): 1}


# ---------------------------------------------------------------------------
# streaming burst debounce ≡ batch q181
# ---------------------------------------------------------------------------

def test_streaming_debounce_matches_batch(spark, tmp_path):
    from graphdb_neo4j_spark.sources.tables import load_table
    from graphdb_neo4j_spark.streaming.debounce import (
        bursts_history,
        streaming_debounce,
    )
    from graphdb_neo4j_spark.workloads import QUERY_FNS

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    # append-ordered split: 3 sequential time slices (the CDC contract)
    src = str(tmp_path / "ev_stream")
    ordered = events.orderBy("ts", "event_id").collect()
    n = len(ordered)
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = ordered[lo: lo + (n + 2) // 3]
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    state = str(tmp_path / "debounce_state")
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/part*")
    q = streaming_debounce(stream, state).trigger(availableNow=True).start()
    q.awaitTermination(300)

    got = {tuple(r) for r in bursts_history(spark, state).collect()}
    want = {
        tuple(r)
        for r in QUERY_FNS["q181_burst_dedup"](spark, sf)
        .select("user_id", "event_type", "burst_id", "kept_event_id",
                "burst_start_us", "n_events", "n_dropped")
        .collect()
    }
    assert got == want
    n_batches = (
        spark.read.parquet(f"{state}/meta").select("batch_id").distinct().count()
    )
    assert n_batches >= 3

    # replay safety: re-running the stream over the same files is a
    # no-op (committed batches are skipped, history unchanged)
    stream2 = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/part*")
    q2 = streaming_debounce(stream2, state).trigger(availableNow=True).start()
    q2.awaitTermination(300)
    again = {tuple(r) for r in bursts_history(spark, state).collect()}
    assert again == want


# ---------------------------------------------------------------------------
# streaming golden record ≡ batch q180 (order-independent merge)
# ---------------------------------------------------------------------------

def test_streaming_golden_record_matches_batch(spark, tmp_path):
    from graphdb_neo4j_spark.sources.tables import load_table
    from graphdb_neo4j_spark.streaming.dim import (
        golden_history,
        streaming_golden_record,
    )
    from graphdb_neo4j_spark.workloads import QUERY_FNS

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    src = str(tmp_path / "ev_stream")
    # NON-chronological split (shuffled by hash): the monoid merge
    # needs no append-order contract, so prove it without one
    rows = events.collect()
    chunks = [[], [], []]
    for r in rows:
        chunks[r.event_id % 3].append(r)
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    state = str(tmp_path / "golden_state")
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/part*")
    q = streaming_golden_record(stream, state).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)

    got = {tuple(r) for r in golden_history(spark, state).collect()}
    want = {
        tuple(r)
        for r in QUERY_FNS["q180_golden_record"](spark, sf).collect()
    }
    assert got == want
    # replay no-op (committed batches are skipped; n_events not doubled)
    stream2 = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/part*")
    q2 = streaming_golden_record(stream2, state).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination(300)
    assert {tuple(r) for r in golden_history(spark, state).collect()} == want
