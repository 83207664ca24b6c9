"""Quickstart: the three things a kinesumer user does, on this engine.

Run:  python examples/quickstart.py [sf_dir]

1. CONSUME — the reference's `for record := range records` loop
   (README.md:67-70), here via the engine's FIRST-CLASS path: the
   custom Python streaming DataSource (offset-tracked shards,
   scanLimit pacing — the O1 shard scan as a real Spark source),
   consumed through Engine.run with the commit ledger. A file-backed
   stream variant follows, since parquet dirs are the usual stand-in.
2. ANALYZE — the queries the reference hands records off for:
   any registered operator, straight from the registry.
3. CURATE — the training-data pipeline over the same session (the
   full chain: quality gate → exact dedup → MinHash/LSH near-dup →
   LM selection cut, plus hybrid BM25∪vector retrieval over the
   curated corpus).
4. PRODUCE — the other side of the wire: the custom Python DataSource
   WRITER (PutRecords-style two-phase sink: staged task files, atomic
   manifest publish).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesumer_spark import get_spark
from kinesumer_spark.registry import all_queries
from kinesumer_spark.streaming.engine import Engine, StreamSource


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")

    # 1a. consume the CUSTOM Python streaming source (the default demo:
    # a real Spark DataSource with per-shard offsets and scanLimit
    # pacing, not a file directory) --------------------------------
    from kinesumer_spark.sources.python_source import register_sim_stream_source

    register_sim_stream_source(spark)
    eng0 = Engine(spark, app="quickstart-pysource", checkpoint_root=tempfile.mkdtemp())
    sim_records = eng0.consume(
        [
            StreamSource(
                "sim",
                format="kinesumer_sim_stream",
                options={"numShards": "3", "totalPerShard": "40", "scanLimit": "15"},
            )
        ]
    )
    sim_counts: list = []
    q0 = eng0.run(
        sim_records,
        lambda batch_df, batch_id: sim_counts.append(batch_df.count()),
    )
    q0.processAllAvailable()
    eng0.close()
    print(
        f"python-source: consumed {sum(sim_counts)} records across "
        f"{len(sim_counts)} paced microbatches; committed shards: "
        f"{len(eng0.checkpoints())}"
    )

    # 1b. consume a file-backed stream: an events-only dir stands in
    # for a Kinesis stream ----
    # (a StreamSource points at ONE stream's files; sf_dir holds every
    # table, so stage a link dir — a connector would own its own topic)
    stream_dir = tempfile.mkdtemp(prefix="qs_stream_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    eng = Engine(spark, app="quickstart", checkpoint_root=tempfile.mkdtemp())
    records = eng.consume(
        [StreamSource("events", stream_dir, max_files_per_trigger=None)]
    )

    delivered: list = []

    def sink(batch_df, batch_id):
        delivered.append(batch_df.count())

    q = eng.run(records, sink, trigger={"availableNow": True})
    q.awaitTermination(120)
    eng.close()
    print(f"consumed {sum(delivered)} records "
          f"across {len(delivered)} microbatches; "
          f"committed shards: {len(eng.checkpoints())}")

    # 2. analyze: any registered query --------------------------------
    queries = all_queries()
    for name in ("q1_pricing_summary", "events_funnel", "events_drift_chi2"):
        df = queries[name].spark(spark, sf_dir)
        print(f"\n== {name} ==")
        df.show(5, truncate=False)

    # 3. curate: the composed training-data pipelines + retrieval ------
    for name in (
        "pipeline_pretraining_curation_neardup",  # gate→exact→LSH→LM cut
        "pipeline_embedding_curation",
        "similarity_hybrid_rrf",  # BM25 ∪ vector, RRF-fused top-25
    ):
        print(f"\n== {name} ==")
        queries[name].spark(spark, sf_dir).show(10, truncate=False)

    # 4. produce: the custom Python DataSource WRITER ------------------
    from kinesumer_spark.sources.python_source import (
        _list_manifests,
        register_sim_sink,
    )

    register_sim_sink(spark)
    sink_dir = tempfile.mkdtemp(prefix="qs_sink_")
    spark.range(1000).selectExpr(
        "cast(id % 97 AS string) AS partition_key", "id AS payload"
    ).write.format("kinesumer_sim_sink").option("path", sink_dir).option(
        "numshards", "4"
    ).mode("append").save()
    import json

    # append publishes a job-unique manifest (r9: append accumulates;
    # overwrite replaces) — readers union _list_manifests/published_files
    (man_name,) = _list_manifests(sink_dir)
    with open(os.path.join(sink_dir, man_name)) as f:
        man = json.load(f)
    print(
        f"\nproduced {man['n_rows']} records into {len(man['by_shard'])} "
        f"shards across {len(man['files'])} put batches (atomic manifest)"
    )

    # 5. wire: the same consumer/producer over the real protocol -------
    # Against AWS, only the endpoint option changes; here a localhost
    # endpoint speaks the public Kinesis JSON protocol and injects the
    # faults a production consumer sees (throttles, iterator expiry) —
    # delivery is unchanged (see the stream_kinesis_wire_* queries for
    # the oracle-checked versions of everything below).
    import shutil

    from kinesumer_spark.sources.kinesis_wire import (
        FakeKinesisServer,
        open_stream,
        register_wire_source,
        simple_stream,
    )

    register_wire_source(spark)
    topo = simple_stream("wire", 2, 30)
    topo.update(open_stream("produced", 2))
    wire_work = tempfile.mkdtemp(prefix="qs_wire_")
    with FakeKinesisServer(topo) as srv:
        srv.api.throttle_every = 5  # botocore's retry absorbs these
        srv.api.expire_every = 7  # the consumer re-acquires these
        srv.api.put_fail_every = 7  # the producer resubmits these

        # produce: executors batch PutRecords (≤500/call) and retry
        # only failed entries — the AWS partial-failure contract
        spark.range(200).selectExpr(
            "cast(id % 41 AS string) AS partition_key",
            "to_json(struct(id AS k)) AS data",
        ).write.format("kinesumer_wire").option("endpoint", srv.url).option(
            "stream", "produced"
        ).mode("append").save()

        # consume: per-shard offset map, paced scans, exactly-once
        def capture(batch_df, batch_id):
            batch_df.write.mode("append").parquet(wire_work)

        q = (
            spark.readStream.format("kinesumer_wire")
            .option("endpoint", srv.url)
            .option("stream", "wire")
            .option("scanlimit", 10)
            .load()
            .writeStream.foreachBatch(capture)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
    n_wire = spark.read.parquet(wire_work).count()
    print(
        f"\nwire: consumed {n_wire} records over HTTP under injected "
        "throttle+expiry faults; produced 200 via PutRecords partial-retry"
    )
    shutil.rmtree(wire_work, ignore_errors=True)

    # 5. PREP — from curated corpus to training batches: the alpha=0.5
    # temperature mixture drawn through to PACKED sequences (one
    # whole-chain-oracled operator), and quantized-index similarity
    # search with exact re-rank over the embeddings table.
    reg = all_queries()
    mix = reg["pipeline_training_mix"].spark(spark, sf_dir)
    print("\ntraining mix → packed sequences (per language):")
    mix.show(10, truncate=False)
    topk = reg["similarity_int8_rerank"].spark(spark, sf_dir)
    print("int8-index top-k (scores exact after full-precision re-rank):")
    topk.show(10, truncate=False)

    # 6. PLAN — the budget/layout planning family (r13): how many epochs
    # per language fit a 2x token budget under the repeat cap, how a
    # fixed eval budget apportions across strata (and the builder that
    # selects exactly that), whether the split leaks train content into
    # eval, and the output-shard layout for the export.
    print("\nepoch plan under a 2x budget (repeat cap + water-filling):")
    reg["mix_epoch_planner"].spark(spark, sf_dir).show(5, truncate=False)
    print("eval-set apportionment executed (exact per-stratum quotas):")
    reg["sample_eval_set_build"].spark(spark, sf_dir).show(5, truncate=False)
    print("train->eval leakage audit (exact + near-dup tiers):")
    reg["split_leakage_audit"].spark(spark, sf_dir).show(truncate=False)
    print("export shard layout (token-budgeted output files):")
    reg["export_shard_plan"].spark(spark, sf_dir).show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
