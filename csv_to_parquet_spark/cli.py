"""CLI entry point (reference main.go).

Usage: ``python -m csv_to_parquet_spark.cli -i data/ -o out/``
"""

from __future__ import annotations

import logging
import sys

from csv_to_parquet_spark.config import load_settings
from csv_to_parquet_spark.convert.converter import convert_all
from csv_to_parquet_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    cfg = load_settings(argv)
    logging.basicConfig(
        level=getattr(logging, cfg.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(message)s",
    )
    log = logging.getLogger("csv_to_parquet_spark")

    spark = get_spark(app_name="csv-to-parquet")
    summary = convert_all(
        spark,
        cfg.input,
        cfg.output or None,
        delimiter=cfg.delimiter,
        sample_rows=cfg.sample_rows,
        delete_original=cfg.delete_original,
        single_file=cfg.single_file,
        enhanced_dates=cfg.enhanced_dates,
        charset=cfg.charset,
    )

    # summary report (reference main.go:35-59)
    for r in summary.results:
        if r.ok:
            log.info(
                "converted %s -> %s (%.2f MB -> %.2f MB, %.1fs)",
                r.input,
                r.output,
                r.input_bytes / 1048576,
                r.output_bytes / 1048576,
                r.seconds,
            )
    log.info(
        "done: %d converted, %d failed, %.2f MB saved",
        summary.converted,
        summary.failed,
        summary.mb_saved,
    )
    return 1 if summary.failed else 0


if __name__ == "__main__":
    sys.exit(main())
