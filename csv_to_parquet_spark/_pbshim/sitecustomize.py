"""Interpreter-startup shim: make ``google.protobuf`` usable in Spark's
spawned Python processes (executors' worker daemons and the
transformWithState PRE_INIT driver runner).

Loaded automatically by the stdlib ``site`` module in ANY Python
process whose PYTHONPATH contains this directory —
``csv_to_parquet_spark.pbcompat.ensure_protobuf`` exports exactly
that, both into ``os.environ`` (future JVMs) and into the live
``SparkContext.environment`` (already-running JVMs pass it to every
spawned python via ``PythonFunction.envVars``).

Those spawned processes import ``StateMessage_pb2`` from framework
code BEFORE any user code runs (the PRE_INIT runner does it in its
handshake), so no user-code hook can patch them — interpreter startup
is the only reliable point. Content mirrors
:func:`csv_to_parquet_spark.pbcompat.ensure_protobuf` but is
self-contained: PYTHONPATH carries only this directory, not the repo.

Everything is best-effort and guarded: if a real protobuf is
installed, this is a no-op beyond one cheap import attempt.
"""

try:
    import os as _os
    import sys as _sys

    _APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

    try:
        from google.protobuf import descriptor as _d  # noqa: F401

        _have_real = True
    except ImportError:
        _have_real = False

    if not _have_real and _os.path.isdir(
        _os.path.join(_APPENGINE, "google", "protobuf")
    ):
        if _APPENGINE not in _sys.path:
            _sys.path.append(_APPENGINE)
        # a bare namespace-package `google` from an earlier failed
        # import would shadow the real one — drop it so the next
        # import re-resolves against the extended path
        for _m in ("google.protobuf", "google"):
            _mod = _sys.modules.get(_m)
            if _mod is not None and getattr(_mod, "__file__", None) is None:
                del _sys.modules[_m]
        try:
            from google.protobuf import runtime_version as _rv

            if not getattr(_rv, "_sparkgraft_relaxed", False):
                _orig = _rv.ValidateProtobufRuntimeVersion

                def _tolerant(*args, **kwargs):
                    try:
                        _orig(*args, **kwargs)
                    except _rv.VersionError:
                        pass  # system-fallback runtime: one-minor gap, see pbcompat

                _rv.ValidateProtobufRuntimeVersion = _tolerant
                _rv._sparkgraft_relaxed = True
        except ImportError:
            pass
except Exception:  # never break interpreter startup
    pass
