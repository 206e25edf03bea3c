"""Configuration with reference-parity precedence.

defaults → YAML config file → CLI flag overrides, input required
(reference config/config.go:22-85). Notable parity details:

- the delimiter is truncated to its FIRST character — the reference
  takes ``Delimiter[0]`` as a byte (converter/converter.go:127-130),
  silently ignoring the rest; Spark's ``sep`` would accept multi-char,
  so we truncate here.
- ``delete_original`` defaults to **True** — the reference deletes
  source CSVs after a verified convert unless ``--keep`` is passed
  (config/config.go:26 ``DeleteOriginal: true``; README.md:64).
  Deliberate split: only this CLI/config surface carries the
  reference's destructive default; the library functions
  (``convert_file``/``convert_all``) keep ``delete_original=False``
  so a programmatic caller must opt in explicitly.
- ``--keep`` inverts ``delete_original`` (config/config.go:36,64-66).
- ``--config`` defaults to ``config.yaml`` and the file is
  **auto-loaded when present** with no flag. Missing-file tolerance
  is VALUE-based, exactly like the reference (config/config.go:46-50
  compares ``*configPath != "config.yaml"``): any path equal to the
  default string — including an explicitly typed ``--config
  config.yaml`` — tolerates absence, while any other unreadable path
  is an error.
- CLI flags override the config file only when "set" by the
  reference's zero-value rule: strings when non-empty, ints when > 0
  (config/config.go:58-78).
- ``batch_size`` exists for CLI parity but, like the reference (it only
  drives a debug-log cadence, converter/converter.go:365-367), does not
  affect the written row groups (always 128 MB).
"""

from __future__ import annotations

import argparse
import os as _os
from dataclasses import dataclass, fields

try:
    import yaml  # PyYAML — optional; config files are optional too
except ImportError:
    yaml = None


@dataclass
class Settings:
    input: str = ""
    output: str = ""  # empty → alongside each input (converter.go:107-114)
    delimiter: str = ","
    batch_size: int = 10000  # log cadence only (config/config.go:27)
    sample_rows: int = 100  # inference sample (config/config.go:29)
    delete_original: bool = True  # reference default (config/config.go:26)
    log_level: str = "info"
    # engine extensions beyond the reference surface:
    single_file: bool = True  # 1 CSV → 1 parquet file (reference layout)
    enhanced_dates: bool = False  # type probed dates for real (SURVEY §7 M2)
    charset: str = "UTF-8"  # source encoding (e.g. ISO-8859-1 legacy drops)

    def __post_init__(self) -> None:
        if self.delimiter:
            self.delimiter = self.delimiter[0]  # first byte only


def load_settings(argv: list[str] | None = None) -> Settings:
    parser = argparse.ArgumentParser(
        prog="csv-to-parquet-spark",
        description=(
            "Convert CSV files to Parquet (Spark engine). "
            "WARNING: by default the ORIGINAL CSV FILES ARE DELETED after "
            "verified conversion (reference parity, config/config.go:26); "
            "pass --keep to retain them."
        ),
    )
    parser.add_argument(
        "--config",
        "-c",
        default="config.yaml",
        help="YAML config file (default config.yaml, auto-loaded when present)",
    )
    parser.add_argument("--input", "-i", help="input CSV file or directory")
    parser.add_argument("--output", "-o", help="output directory")
    parser.add_argument("--delimiter", "-d", help="CSV delimiter (first char used)")
    parser.add_argument("--batch-size", type=int, dest="batch_size")
    parser.add_argument("--sample-rows", type=int, dest="sample_rows")
    parser.add_argument(
        "--delete-original", action="store_true", default=None, dest="delete_original"
    )
    parser.add_argument(
        "--keep",
        action="store_true",
        default=None,
        help=(
            "keep original files (overrides delete_original, which "
            "DEFAULTS TO TRUE like the reference CLI)"
        ),
    )
    parser.add_argument("--log-level", dest="log_level")
    parser.add_argument(
        "--charset",
        help="source file encoding (default UTF-8; e.g. ISO-8859-1)",
    )
    parser.add_argument(
        "--multi-file",
        action="store_true",
        default=None,
        help="write native Spark directory layout instead of one parquet file",
    )
    parser.add_argument(
        "--enhanced-dates",
        action="store_true",
        default=None,
        help="infer DATE/TIMESTAMP types instead of storing dates as strings",
    )
    args = parser.parse_args(argv)

    cfg = Settings()
    # config.yaml auto-probe (config/config.go:34,46-50): missing-file
    # tolerance is VALUE-based like the reference — any path equal to
    # the default string (even explicitly typed) tolerates absence;
    # any other unreadable path raises.
    if not _os.path.exists(args.config):
        if args.config != "config.yaml":
            raise OSError(f"config file not found: {args.config}")
        f = None  # default config file missing is fine
    else:
        if yaml is None:
            # checked before open() so no file handle is leaked on raise
            raise RuntimeError("PyYAML not available but a config file exists")
        f = open(args.config, encoding="utf-8")
    if f is not None:
        with f:
            doc = yaml.safe_load(f) or {}
        valid = {fld.name for fld in fields(Settings)}
        for k, v in doc.items():
            if k in valid:
                setattr(cfg, k, v)

    # CLI overrides (pflag zero-value precedence, config/config.go:58-78:
    # strings override when non-empty, ints when > 0)
    for name in (
        "input",
        "output",
        "delimiter",
        "log_level",
        "charset",
    ):
        v = getattr(args, name)
        if v:  # non-empty string, like the reference's `!= ""` guards
            setattr(cfg, name, v)
    for name in ("batch_size", "sample_rows"):
        v = getattr(args, name)
        if v is not None and v > 0:  # reference's `> 0` guards
            setattr(cfg, name, v)
    if args.delete_original is not None:
        cfg.delete_original = args.delete_original
    if args.keep:
        cfg.delete_original = False
    if args.multi_file:
        cfg.single_file = False
    if args.enhanced_dates:
        cfg.enhanced_dates = True
    if cfg.delimiter:
        cfg.delimiter = cfg.delimiter[0]

    if not cfg.input:
        parser.error("input is required (config/config.go:80-82)")
    return cfg
