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

Python loads at most ONE ``sitecustomize``, and this directory is
PREPENDED to PYTHONPATH, so any pre-existing sitecustomize (e.g.
coverage.py's subprocess hook) would be silently shadowed — the tail
of this shim therefore CHAIN-LOADS the next ``sitecustomize`` found
later on ``sys.path`` (ADVICE r7).

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
                    except _rv.VersionError as _e:
                        # mirror pbcompat._relax_version_check: the
                        # swallowed mismatch must stay visible
                        import warnings as _w

                        _w.warn(
                            f"protobuf gencode/runtime version mismatch "
                            f"tolerated by the spark-graft pbshim "
                            f"(system-fallback runtime, see "
                            f"csv_to_parquet_spark.pbcompat): {_e}",
                            stacklevel=2,
                        )

                _rv.ValidateProtobufRuntimeVersion = _tolerant
                _rv._sparkgraft_relaxed = True
        except ImportError:
            pass

    # chain-load a sitecustomize this shim shadowed: find the next
    # sys.path entry (after this file's directory) that provides one
    # and execute it under the same module name, so e.g. coverage.py's
    # subprocess hook still runs in every spawned python
    _here = _os.path.dirname(_os.path.abspath(__file__))
    for _p in _sys.path:
        _cand = _os.path.join(_p or ".", "sitecustomize.py")
        try:
            _same = _os.path.samefile(_os.path.dirname(_cand) or ".", _here)
        except OSError:
            _same = False
        if _same or not _os.path.isfile(_cand):
            continue
        import runpy as _runpy

        # Report (don't swallow) failures inside the downstream hook —
        # CPython's site module prints sitecustomize errors too; only the
        # pb shim's own failures stay silent via the outer guard.
        try:
            _shadowed = _runpy.run_path(_cand, run_name="sitecustomize_shadowed")
        except Exception:
            import traceback as _tb

            print(
                f"Error in shadowed sitecustomize ({_cand}); continuing",
                file=_sys.stderr,
            )
            _tb.print_exc()
            break
        # expose it like site would have (best effort)
        _sys.modules.setdefault(
            "sitecustomize_shadowed", type(_sys)("sitecustomize_shadowed")
        ).__dict__.update(_shadowed)
        break
except Exception:  # never break interpreter startup
    pass
