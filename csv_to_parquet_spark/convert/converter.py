"""The conversion engine: CSV → Parquet with reference semantics.

Maps the reference's per-file pipeline (converter/converter.go:116-182)
onto Spark:

  discover inputs (S1)  → file / dir glob *.csv
  pass 1 (I1)           → sample-N inference, exact lattice (inference.py)
  header cleaning (P1)  → clean_headers (headers.py)
  pass 2 (T1/T2/F1/K1)  → all-string scan → try_cast projection → parquet
  verify (V1)           → output exists and is non-empty
  delete original (D1)  → optional, --keep inverts
  summary (A1)          → Result fold with byte savings

Like the reference, every file is read twice (sample pass + full pass,
converter/converter.go:133 vs :328) and each file gets its OWN inferred
schema. Files convert concurrently — the reference caps 4 goroutines
(converter/converter.go:91); we submit up to 4 concurrent Spark *jobs*
from a thread pool, and Spark additionally parallelizes each job across
all cores/executors by file splits. At cluster scale a single huge CSV
still converts as a zero-shuffle scan→project→write pipelined across
executors, O(partition) memory.
"""

from __future__ import annotations

import csv as _csv
import glob
import logging
import os
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from csv_to_parquet_spark.convert.headers import clean_headers
from csv_to_parquet_spark.convert.inference import (
    InferredColumn,
    cast_column,
    format_schema,
    infer_column_kinds,
)

log = logging.getLogger("csv_to_parquet_spark")

MAX_CONCURRENT_FILES = 4  # reference semaphore cap, converter/converter.go:91
ROW_GROUP_BYTES = 128 * 1024 * 1024  # converter/converter.go:325


@dataclass
class Result:
    """Per-file outcome (reference Result, converter/converter.go:21-27)."""

    input: str
    output: str = ""
    input_bytes: int = 0
    output_bytes: int = 0
    rows: int = -1
    error: str = ""
    seconds: float = 0.0

    @property
    def ok(self) -> bool:
        return self.error == ""


@dataclass
class Summary:
    converted: int = 0
    failed: int = 0
    input_bytes: int = 0
    output_bytes: int = 0
    results: list[Result] = field(default_factory=list)

    @property
    def mb_saved(self) -> float:
        return (self.input_bytes - self.output_bytes) / (1024 * 1024)


def discover_inputs(input_path: str) -> list[str]:
    """File vs directory-glob discovery (converter/converter.go:66-88)."""
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.csv")))
    return [input_path]


def read_raw_header(
    path: str, delimiter: str, charset: str = "UTF-8"
) -> list[str]:
    """Read the raw header row driver-side (tiny read). Keeps the BOM so
    clean_header strips it exactly like the reference (converter.go:203)."""
    with open(path, encoding=charset, newline="") as f:
        reader = _csv.reader(f, delimiter=delimiter)
        for row in reader:
            return row
    return []


def read_csv_raw(
    spark: SparkSession,
    path: str,
    delimiter: str,
    n_cols: int,
    charset: str = "UTF-8",
) -> DataFrame:
    """All-string CSV scan with the reference's tolerance knobs:
    PERMISSIVE (short rows → trailing NULLs, extra cells dropped —
    converter.go:383-386) and STOP_AT_DELIMITER unescaped-quote handling
    (≈ Go LazyQuotes, converter.go:194)."""
    schema = ", ".join(f"`_raw{i}` STRING" for i in range(n_cols))
    return (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("unescapedQuoteHandling", "STOP_AT_DELIMITER")
        # RFC-4180 doubled-quote escaping inside quoted fields, like
        # Go encoding/csv (converter.go:192-194); Spark's default
        # escape is backslash, which Go CSV does not use.
        .option("escape", '"')
        .option("encoding", charset)
        .option("enforceSchema", True)
        .schema(schema)
        .csv(path)
    )


def read_csv_typed(
    spark: SparkSession,
    path: str,
    delimiter: str,
    cols: list[InferredColumn],
    enhanced_dates: bool = False,
    charset: str = "UTF-8",
) -> DataFrame:
    """Pass 2: the conversion scan.

    All-string CSV scan plus ONE codegen'd trim/try_cast projection —
    exactly the reference's parse order (CSV-parse, then TrimSpace,
    then per-type parse, converter.go:380-412). This order matters: a
    typed CSV read looks faster (the parser casts in place) but its
    whitespace handling never reaches inside quoted fields, so a
    quoted padded numeric like ``"  5  "`` would silently null where
    the reference stores 5. The projection reproduces silent-NULL cast
    semantics: unparseable ⇒ NULL, empty/whitespace-only ⇒ NULL in
    every type, short rows pad, extra cells drop (PERMISSIVE).

    Enhanced-dates mode changes nothing here — ``cast_column`` probes
    the reference's six date/timestamp layouts when inference typed the
    column date/timestamp (converter.go:264-271).
    """
    raw = read_csv_raw(spark, path, delimiter, len(cols), charset)
    return raw.select(
        *[cast_column(c.kind, f"_raw{i}").alias(c.name) for i, c in enumerate(cols)]
    )


def _head_lines(path: str, n: int, charset: str = "UTF-8") -> list[str]:
    """First ``n`` physical lines of the file, terminators stripped —
    the driver-side sample read. Legitimately a bounded driver read:
    the reference samples exactly this prefix (converter.go:218-224),
    and ``multiLine`` is false everywhere so Spark's own CSV scan also
    treats raw newlines as record separators — line-based sampling
    sees the same records the distributed parse will."""
    out: list[str] = []
    with open(path, encoding=charset, errors="replace", newline="") as f:
        for i, line in enumerate(f):
            if i >= n:
                break
            out.append(line.rstrip("\r\n"))
    return out


def infer_file_schema(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    sample_rows: int = 100,
    enhanced_dates: bool = False,
    charset: str = "UTF-8",
) -> list[InferredColumn]:
    """Pass 1: sample-bounded exact-lattice inference (converter.go:185-239).

    The sample is the file's first ``sample_rows`` records read
    DRIVER-SIDE and parsed through the SAME Spark CSV reader (an RDD
    of line strings with identical options — univocity parser, same
    PERMISSIVE/quote semantics). A ``.limit(n)`` over the file scan
    looks equivalent but plans a LocalLimit in EVERY split: measured
    ~0.8 s of 32 task launches each opening the 158 MB file at sf0.1,
    and at 100 TB it would launch the full scan stage — thousands of
    tasks to sample 100 rows. The prefix read is O(sample) always.
    """
    import tempfile

    raw_headers = read_raw_header(path, delimiter, charset)
    names = clean_headers(raw_headers)
    lines = _head_lines(path, sample_rows + 1, charset)  # +1: header line
    # stage the prefix as a tiny local file and parse it through the
    # SAME file-based reader as the full pass (identical univocity
    # options). NOT sc.parallelize(lines): a Python-RDD-backed CSV
    # scan routes every action through a Python worker round trip
    # (measured ~0.7 s per inference at sf0.1); the one-split file
    # scan is pure JVM.
    # the staged prefix is re-encoded in the SOURCE charset so the
    # sample parse (same reader, same encoding option) decodes the
    # exact bytes the full pass will
    with tempfile.NamedTemporaryFile(
        "w", encoding=charset, suffix=".csv", delete=False, newline=""
    ) as tf:
        tf.write("\n".join(lines))
        tmp = tf.name
    try:
        sample = read_csv_raw(spark, tmp, delimiter, len(names), charset)
        kinds = infer_column_kinds(sample, enhanced_dates=enhanced_dates)
    finally:
        os.remove(tmp)
    return [
        InferredColumn(name=names[i], raw_name=raw_headers[i], kind=kinds[f"_raw{i}"])
        for i in range(len(names))
    ]


def _single_file_output(tmp_dir: str, final_path: str) -> None:
    """Promote Spark's part-file to a single <base>.parquet (K2 parity —
    the reference maps 1 CSV → 1 parquet file, converter.go:107-114)."""
    parts = [p for p in glob.glob(os.path.join(tmp_dir, "part-*")) if not p.endswith(".crc")]
    if len(parts) != 1:
        raise RuntimeError(f"expected exactly one part file in {tmp_dir}, got {parts}")
    if os.path.exists(final_path):
        os.remove(final_path)
    shutil.move(parts[0], final_path)
    shutil.rmtree(tmp_dir, ignore_errors=True)


def output_path_for(input_file: str, output_dir: str | None) -> str:
    """<dir>/<base>.parquet (reference outputPath, converter.go:107-114)."""
    base = os.path.splitext(os.path.basename(input_file))[0] + ".parquet"
    d = output_dir if output_dir else os.path.dirname(input_file)
    return os.path.join(d, base)


def convert_file(
    spark: SparkSession,
    input_file: str,
    output_dir: str | None = None,
    delimiter: str = ",",
    sample_rows: int = 100,
    delete_original: bool = False,
    single_file: bool = True,
    enhanced_dates: bool = False,
    charset: str = "UTF-8",
) -> Result:
    """Convert one CSV file (reference convertFile, converter.go:116-182)."""
    t0 = time.monotonic()
    res = Result(input=input_file)
    try:
        res.input_bytes = os.path.getsize(input_file)
        out = output_path_for(input_file, output_dir)
        res.output = out

        cols = infer_file_schema(
            spark, input_file, delimiter, sample_rows, enhanced_dates, charset
        )
        log.debug("schema for %s: %s", input_file, format_schema(cols))

        typed = read_csv_typed(
            spark, input_file, delimiter, cols, enhanced_dates, charset
        )

        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        writer = typed.coalesce(1) if single_file else typed
        target = out + "._spark_tmp" if single_file else out
        (
            writer.write.mode("overwrite")
            .option("parquet.block.size", ROW_GROUP_BYTES)
            .parquet(target)
        )
        if single_file:
            _single_file_output(target, out)

        # V1: verify output exists and is non-empty (converter.go:161-166)
        if single_file:
            res.output_bytes = os.path.getsize(out)
        else:
            res.output_bytes = sum(
                os.path.getsize(p) for p in glob.glob(os.path.join(out, "*.parquet"))
            )
        if res.output_bytes == 0:
            raise RuntimeError(f"output {out} is empty")

        if delete_original:  # D1, converter.go:169-175
            try:
                os.remove(input_file)
            except OSError as e:
                log.warning("could not delete original %s: %s", input_file, e)
    except Exception as e:  # V2: partial-output cleanup (converter.go:153-158)
        res.error = str(e)
        for p in (res.output, res.output + "._spark_tmp"):
            if p and os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else os.remove(p)
    res.seconds = time.monotonic() - t0
    return res


def convert_all(
    spark: SparkSession,
    input_path: str,
    output_dir: str | None = None,
    delimiter: str = ",",
    sample_rows: int = 100,
    delete_original: bool = False,
    single_file: bool = True,
    enhanced_dates: bool = False,
    max_concurrent: int = MAX_CONCURRENT_FILES,
    charset: str = "UTF-8",
) -> Summary:
    """Convert a file or a directory of CSVs (reference ConvertAll,
    converter.go:66-105): each file keeps its own inferred schema, up to
    ``max_concurrent`` Spark jobs in flight."""
    files = discover_inputs(input_path)
    summary = Summary()
    if not files:
        log.warning("no CSV files found in %s", input_path)
        return summary

    def _one(f: str) -> Result:
        return convert_file(
            spark,
            f,
            output_dir,
            delimiter,
            sample_rows,
            delete_original,
            single_file,
            enhanced_dates,
            charset,
        )

    with ThreadPoolExecutor(max_workers=max_concurrent) as pool:
        results = list(pool.map(_one, files))

    for r in results:  # A1 summary fold (main.go:35-59)
        summary.results.append(r)
        if r.ok:
            summary.converted += 1
            summary.input_bytes += r.input_bytes
            summary.output_bytes += r.output_bytes
        else:
            summary.failed += 1
            log.error("failed: %s: %s", r.input, r.error)
    return summary
