"""CLI entry point — the reference's
``python -m citibike_data_process --file-local --read-local --make-local``
(citibike_data_process/main.py:27-43) re-expressed for the Spark engine:

    python -m citibike_deep_dive_spark \
        --input-dir ./archives --warehouse ./warehouse \
        [--export-db ./CitibikeData.db] [--s3-bucket B --s3-key K] \
        [--top-k 30] [--cpus 8]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="citibike_deep_dive_spark")
    p.add_argument("--input-dir", required=True, help="directory of trip-data zips")
    p.add_argument("--warehouse", required=True, help="parquet warehouse directory")
    p.add_argument("--state", default=None, help="state table path (default: <warehouse>/_state)")
    p.add_argument("--export-db", default=None, help="also export a DuckDB file artifact")
    p.add_argument("--s3-bucket", default=None, help="upload the DuckDB file to this bucket")
    p.add_argument("--s3-key", default=None, help="S3 key for the upload")
    p.add_argument("--top-k", type=int, default=30, help="routes enriched per year")
    p.add_argument("--cpus", default=None, help="local[] parallelism override")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from .session import get_spark

    t0 = time.time()
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(
        app_name="citibike-pipeline",
        master=f"local[{args.cpus}]" if args.cpus else None,
    )
    spark.sparkContext.setLogLevel("WARN")

    from .pipeline import run_pipeline

    result = run_pipeline(
        spark,
        input_dir=args.input_dir,
        warehouse_dir=args.warehouse,
        state_path=args.state,
        top_k=args.top_k,
    )
    print(
        f"processed {len(result.processed)} new archive(s), "
        f"skipped {result.skipped} already-ingested"
    )

    if args.export_db:
        from .sources.export import export_warehouse_to_duckdb, upload_file_to_s3

        tables = export_warehouse_to_duckdb(args.warehouse, args.export_db)
        print(f"exported {len(tables)} table(s) to {args.export_db}")
        if args.s3_bucket and args.s3_key:
            upload_file_to_s3(args.export_db, args.s3_bucket, args.s3_key)
            print(f"uploaded to s3://{args.s3_bucket}/{args.s3_key}")

    print(f"elapsed {time.time() - t0:.1f}s")
    if not preexisting:  # don't tear down a session the caller owns
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
