"""Locate a usable ``google.protobuf`` runtime without pip.

``transformWithStateInPandas`` speaks protobuf between the JVM state
server and the Python worker (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``). This container has no pip-installed protobuf
and installing packages is off-limits, but the system
google-cloud-sdk ships the upstream pure-Python protobuf runtime
(Apache-2.0, ``google/protobuf`` 6.32) inside its appengine platform
directory. :func:`ensure_protobuf` makes that runtime importable in
THE CURRENT PROCESS — driver or Python worker — falling back to a
real installed protobuf if one ever appears (the system path is
appended, never prepended, so a pip package always wins).

Version-check note: pyspark 4.1.2's gencode was produced by protoc
6.33 while the system runtime is 6.32; protobuf's gencode/runtime
validator rejects *older runtime than gencode* outright. For this
one-minor-version gap on a stable proto (plain proto3 messages, no
editions features) the generated descriptors load fine, so
:func:`ensure_protobuf` relaxes the validator to a warning — scoped:
only when the system fallback is in use, never for a real install.
The resulting wire behavior is oracle-checked end to end by
``stream_transform_with_state`` (tests/test_round6c.py), which is the
meaningful compatibility test.

Shadowing caveat: Python imports at most ONE ``sitecustomize``, so if
some other PYTHONPATH entry already provides one (e.g. coverage.py's
subprocess hook), whichever comes first wins. The shim dir is
PREPENDED because the spawned processes hard-fail without it in this
container (no installed protobuf); an environment that both has a
sitecustomize AND needs this shim must merge the two by hand.

Worker caveat (why this is a function, not import-time state): the
StatefulProcessor instance is cloudpickled BY VALUE, so the worker
process may never import this package's modules at unpickle time.
The processor's ``init`` therefore calls :func:`ensure_protobuf`
itself — ``init`` runs before the API client's first (lazy)
``StateMessage_pb2`` import, which is early enough.
"""

from __future__ import annotations

import os
import sys

#: System locations that ship the pure-Python protobuf runtime.
_SYSTEM_PROTOBUF_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _pb2_loads() -> bool:
    """True iff pyspark's generated state-server messages import."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


def _relax_version_check() -> None:
    """Downgrade the gencode/runtime version mismatch to a warning.

    Applied ONLY for the system-fallback runtime (see module
    docstring); a real installed protobuf never reaches this path.
    """
    try:
        from google.protobuf import runtime_version
    except ImportError:
        return

    if getattr(runtime_version, "_sparkgraft_relaxed", False):
        return
    original = runtime_version.ValidateProtobufRuntimeVersion

    def _tolerant(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location):
        try:
            original(gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location)
        except runtime_version.VersionError:
            import warnings

            warnings.warn(
                f"protobuf gencode {gen_major}.{gen_minor}.{gen_patch} vs "
                f"system runtime {runtime_version.MAJOR}.{runtime_version.MINOR}"
                f".{runtime_version.PATCH} for {location}; proceeding "
                "(system-fallback runtime, see csv_to_parquet_spark.pbcompat)",
                stacklevel=2,
            )

    runtime_version.ValidateProtobufRuntimeVersion = _tolerant
    runtime_version._sparkgraft_relaxed = True


#: Directory holding the sitecustomize shim that replays this module's
#: fixes at interpreter startup in Spark-spawned python processes.
_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _export_shim_path() -> None:
    """Put the sitecustomize shim on PYTHONPATH for every python
    process Spark will spawn.

    Two channels, because env capture differs by JVM lifecycle:
    ``os.environ`` covers JVMs launched after this call; a live
    ``SparkContext.environment`` covers an already-running JVM — that
    dict is handed verbatim to ``PythonFunction.envVars`` for every
    UDF created afterwards, and both the executor worker daemons and
    the transformWithState PRE_INIT driver runner merge its PYTHONPATH
    into the spawned interpreter's environment. Those processes import
    ``StateMessage_pb2`` from framework code before any user code, so
    a startup (sitecustomize) hook is the only reliable patch point.
    """
    def _prepend(val: str | None) -> str:
        parts = [p for p in (val or "").split(os.pathsep) if p]
        if _SHIM_DIR in parts:
            return val  # type: ignore[return-value]
        return os.pathsep.join([_SHIM_DIR] + parts)

    os.environ["PYTHONPATH"] = _prepend(os.environ.get("PYTHONPATH"))
    try:
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if sc is not None:
            sc.environment["PYTHONPATH"] = _prepend(
                sc.environment.get("PYTHONPATH")
            )
    except Exception:
        pass


def ensure_protobuf(export_env: bool = True) -> bool:
    """Make ``google.protobuf`` + pyspark's StateMessage_pb2 importable
    in this process if at all possible. Idempotent; safe to call from
    driver and worker alike. Returns True iff the state-server
    messages load.

    ``export_env=False`` skips the PYTHONPATH/SparkContext export —
    used by the import-time catalog gate so merely importing the
    package never mutates process-global environment (r7 review); the
    transformWithState query functions call with the default True at
    use time, which is when spawned pythons actually need the shim.
    """
    if export_env:
        _export_shim_path()
    try:
        import google.protobuf  # noqa: F401

        # a real install (or an earlier call) — if pb2 still fails on a
        # version check and the runtime came from the system fallback,
        # relaxing is still legitimate
        if _pb2_loads():
            return True
        pb_file = sys.modules["google.protobuf"].__file__ or ""
        if any(pb_file.startswith(d) for d in _SYSTEM_PROTOBUF_DIRS):
            _relax_version_check()
            return _pb2_loads()
        return False
    except ImportError:
        pass

    for d in _SYSTEM_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(d, "google", "protobuf")):
            continue
        if d not in sys.path:
            sys.path.append(d)  # append: a pip install must shadow this
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            continue
        _relax_version_check()
        if _pb2_loads():
            return True
    return False
