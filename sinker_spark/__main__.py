"""CLI — the reference's ``sinker`` console entry point (reference
__main__.py:4-6, pyproject.toml:9-10) rebuilt on the Spark engine.

    python -m sinker_spark --definitions ./defs --source-parquet ./tables \
        [--cdc-dir ./cdc] [--dry-run] [--once]

- reads {view}.sql + views_to_indices.json from --definitions
- backfills every view (materialize + full upsert push)
- with --cdc-dir: runs the Structured Streaming sync loop over
  test_decoding-format CDC lines (``<lsn>\\t<line>`` text files)
- --dry-run compiles views and prints schemas/plans without writing
  (reference README.md:272 dry-run analog)
- sink: Elasticsearch if the client lib + ES are reachable, else the
  in-memory sink with a summary printout (local/offline mode)
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sinker_spark")
    ap.add_argument("--definitions", required=True, help="dir with {view}.sql + views_to_indices.json")
    ap.add_argument("--source-parquet", required=True, help="dir with {table}.parquet source tables")
    ap.add_argument("--cdc-dir", help="dir of CDC text files (<lsn>\\t<test_decoding line>)")
    ap.add_argument("--pg-dsn", help="Postgres DSN: poll a test_decoding logical replication "
                                     "slot directly (reference runner.py:56-64), no Kafka needed")
    ap.add_argument("--slot", default="sinker", help="replication slot name (with --pg-dsn)")
    ap.add_argument("--store", choices=["versioned", "bucketed", "manifest"], default="versioned",
                    help="snapshot store: versioned (atomic full rewrite), bucketed "
                         "(partial rewrite, in-place), manifest (partial rewrite + "
                         "atomic commit + time travel)")
    ap.add_argument("--dry-run", action="store_true", help="compile + explain only")
    ap.add_argument("--once", action="store_true", help="drain CDC backlog then exit (availableNow)")
    ap.add_argument("--poll-interval", type=int, default=None)
    args = ap.parse_args(argv)

    from sinker_spark.config import EngineConfig
    from sinker_spark.session import get_spark

    cfg = EngineConfig.from_env()
    cfg.definitions_path = args.definitions
    if args.poll_interval is not None:
        cfg.poll_interval = args.poll_interval

    try:
        spark = get_spark("sinker-spark-cli")
        views = cfg.load_views()
    except FileNotFoundError as e:
        print(f"error: definitions not found: {e.filename}", file=sys.stderr)
        print("expected --definitions dir with views_to_indices.json + {view}.sql files",
              file=sys.stderr)
        return 2

    # register source tables by file name
    import glob
    import os

    for path in sorted(glob.glob(os.path.join(args.source_parquet, "*.parquet")) +
                       glob.glob(os.path.join(args.source_parquet, "*"))):
        name = os.path.basename(path).replace(".parquet", "")
        try:
            spark.read.parquet(path).createOrReplaceTempView(name)
        except Exception:  # non-parquet entries in the dir
            continue

    if args.dry_run:
        for v in views:
            df = v.compile(spark)
            print(f"-- view {v.name} -> index {v.index} (deps: {sorted(v.deps)})")
            print(f"   schema: {df.schema.simpleString()}")
            print(f"   rows:   {df.count()}")
        return 0

    from sinker_spark.ivm import SnapshotStore
    from sinker_spark.runner import SyncEngine

    try:
        from sinker_spark.sinks.elastic import ElasticsearchSink

        sink = ElasticsearchSink(hosts=cfg.es_hosts, chunk_size=cfg.es_chunk_size,
                                 max_retries=cfg.es_max_retries,
                                 client_kwargs=cfg.es_client_kwargs(),
                                 raise_on_error=cfg.es_raise_on_error,
                                 raise_on_exception=cfg.es_raise_on_exception)
    except RuntimeError:
        from sinker_spark.sinks.memory import InMemorySink

        sink = InMemorySink()
        print("elasticsearch client unavailable -> using in-memory sink (offline mode)", file=sys.stderr)

    if args.store == "bucketed":
        from sinker_spark.ivm_bucketed import BucketedSnapshotStore

        store = BucketedSnapshotStore(spark, cfg.snapshot_root)
    elif args.store == "manifest":
        from sinker_spark.ivm_manifest import ManifestSnapshotStore

        store = ManifestSnapshotStore(spark, cfg.snapshot_root)
    else:
        store = SnapshotStore(spark, cfg.snapshot_root)
    # state-hygiene cadence knobs (maintenance.MaintenancePolicy);
    # SINKER_SPARK_MAINT_EVERY=0 disables the sweep entirely
    import os as _os

    from sinker_spark.maintenance import MaintenancePolicy

    maint_every = int(_os.environ.get("SINKER_SPARK_MAINT_EVERY", "32"))
    maintenance = (
        MaintenancePolicy(
            every_n_epochs=maint_every,
            keep_versions=int(_os.environ.get("SINKER_SPARK_MAINT_KEEP", "2")),
        )
        if maint_every > 0
        else None
    )
    eng = SyncEngine(spark, views, sink, store, maintenance=maintenance)

    if args.pg_dsn:
        # reference startup order (runner.py:52-64): reset the slot BEFORE
        # backfill so changes during backfill land in the slot, not the void
        from sinker_spark.sources.pg_slot import PostgresSlotSource

        def _connect():
            import psycopg

            return psycopg.connect(args.pg_dsn, autocommit=True)

        slot_src = PostgresSlotSource(slot=args.slot, connect_fn=_connect)
        slot_src.reset_slot()

    # (re)create each sink index with its {index}.json mappings/settings
    # before the first write (reference sinker.py:74-86)
    eng.backfill(index_bodies={v.index: cfg.index_settings(v.index) for v in views})
    print(f"backfilled {len(views)} view(s)")

    if args.pg_dsn:
        slot_src.run_microbatches(spark, eng, max_batches=1 if args.once else None,
                                  poll_interval=cfg.poll_interval)
    elif args.cdc_dir:
        from sinker_spark.cdc import parse_test_decoding
        from sinker_spark.sources.files import stream_cdc_text

        cdc = parse_test_decoding(stream_cdc_text(spark, args.cdc_dir))
        q = eng.run_stream(cdc, cfg.checkpoint_root, trigger_seconds=cfg.poll_interval,
                           available_now=args.once)
        q.awaitTermination()

    if hasattr(sink, "indices"):
        for index, docs in sink.indices.items():
            print(f"index {index}: {len(docs)} docs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
