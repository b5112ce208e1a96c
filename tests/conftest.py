import os
import sys

import pytest

# Pip-less protobuf drop (round-8, r7 verdict #6): pyspark's
# transformWithStateInPandas driver/worker protocol imports
# google.protobuf, which is not pip-installed in this container.  A
# public protobuf runtime (6.32.0) ships inside the machine's Google
# Cloud SDK; appending it to sys.path (and PYTHONPATH, so the
# StreamingPythonRunner's spawned driver worker inherits it) lets the
# env-gated streaming test execute.  pyspark 4.1.2's generated
# StateMessage_pb2 was compiled with protoc 6.33.0 — one minor AHEAD
# of the 6.32 runtime — so the runtime's own documented escape hatch
# (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) is set; the gated test
# then verifies behavior end-to-end, which is the real compatibility
# check.  A pip-installed protobuf always wins (sys.path APPEND).
_GAE_PB = "/usr/lib/google-cloud-sdk/platform/google_appengine"
try:  # pragma: no cover - trivially environment-dependent
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(os.path.join(_GAE_PB, "google", "protobuf")):
        # expose ONLY the google/ package through a shim dir — the GAE
        # platform dir also carries top-level modules (api_server,
        # dev_appserver, ...) that must not shadow anything in spawned
        # workers.  In THIS interpreter sys.path.append puts the shim
        # after site-packages, so a pip install always wins here; in
        # children PYTHONPATH precedes site-packages by Python's own
        # rules (any position within PYTHONPATH does), which is why
        # this whole block only engages when the import above failed —
        # i.e. when there is no pip protobuf in this environment to
        # shadow.  Appending at the END of PYTHONPATH still keeps any
        # pre-existing PYTHONPATH entries ahead of the shim.
        import tempfile

        _shim = os.path.join(tempfile.gettempdir(), "spark_graft_pb_shim")
        _link = os.path.join(_shim, "google")
        _target = os.path.join(_GAE_PB, "google")
        os.makedirs(_shim, exist_ok=True)
        # /tmp is world-writable: never trust a pre-existing link that
        # points anywhere else (a hostile symlink would get imported
        # as google.protobuf by every spawned worker) — recreate it
        if os.path.lexists(_link) and os.path.realpath(_link) != _target:
            os.unlink(_link)
        if not os.path.lexists(_link):
            try:
                os.symlink(_target, _link)
            except FileExistsError:
                pass  # concurrent pytest session won the race; same link
        sys.path.append(_shim)
        os.environ["PYTHONPATH"] = (
            os.environ.get("PYTHONPATH", "") + os.pathsep + _shim
        ).lstrip(os.pathsep)
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )

from ena_database_build_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("ena-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark
