"""Pip-less protobuf drop (round-8, r7 verdict #6; hardened in
round 9 per the r8 ADVICE medium finding and verdict #7).

pyspark's transformWithStateInPandas driver/worker protocol imports
google.protobuf, which is not pip-installed in this container.  A
public protobuf runtime (6.32.0) ships inside the machine's Google
Cloud SDK; exposing it on sys.path (and PYTHONPATH, so the
StreamingPythonRunner's spawned driver worker inherits it) lets the
env-gated streaming test execute.  pyspark 4.1.2's generated
StateMessage_pb2 was compiled with protoc 6.33.0 — one minor AHEAD of
the 6.32 runtime — so the runtime's own documented escape hatch
(TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) is set; the gated test
then verifies behavior end-to-end, which is the real compatibility
check.  A pip-installed protobuf always wins (the shim only engages
when ``import google.protobuf`` fails).

Security (r8 ADVICE, medium): the r8 shim used a FIXED dir under the
world-writable /tmp (`/tmp/spark_graft_pb_shim`); another local user
could pre-create it and swap the ``google`` symlink between our
realpath check and the workers' imports, so every spawned Spark
worker would import attacker code as google.protobuf.  The shim now
creates a FRESH per-process directory via tempfile.mkdtemp() (mode
0700, owner-only by contract) and symlinks inside it — there is no
pre-existing state to trust and no cross-user race window.

Robustness (r8 verdict #7): install_protobuf_shim() never raises on
an unusable SDK drop — a missing dir, a broken symlink target, or an
SDK bundle whose protobuf can't actually be imported all return None,
which leaves google.protobuf unimportable and lets the streaming test
fall back to its visible skip instead of an import error.
"""

from __future__ import annotations

import importlib
import os
import shutil
import sys
import tempfile

GAE_PB_DEFAULT = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _probe_import(shim: str) -> bool:
    """True iff google.protobuf imports cleanly with `shim` appended.

    Runs in THIS interpreter but fully unwinds on failure (sys.path
    entry and any half-imported google* modules are removed) so a
    broken SDK drop leaves the interpreter exactly as it was.
    """
    sys.path.append(shim)
    preexisting = {m for m in sys.modules if m == "google" or m.startswith("google.")}
    try:
        importlib.import_module("google.protobuf.descriptor")
        return True
    except Exception:  # pragma: no cover - exercised via fake SDK dirs
        for m in list(sys.modules):
            if (m == "google" or m.startswith("google.")) and m not in preexisting:
                del sys.modules[m]
        sys.path.remove(shim)
        return False


def install_protobuf_shim(gae_dir: str = GAE_PB_DEFAULT) -> str | None:
    """Expose the Google Cloud SDK's bundled protobuf, if present and
    importable.  Returns the shim dir on success, None otherwise
    (including when a pip protobuf already exists — nothing to do).

    Only the ``google/`` package is exposed, through a symlink inside
    a fresh owner-only mkdtemp dir — the GAE platform dir also
    carries top-level modules (api_server, dev_appserver, ...) that
    must not shadow anything in spawned workers.
    """
    try:
        import google.protobuf  # noqa: F401

        return None  # pip-installed protobuf wins; shim not needed
    except ImportError:
        pass

    target = os.path.join(gae_dir, "google")
    if not os.path.isdir(os.path.join(target, "protobuf")):
        return None  # SDK moved / not installed -> visible test skip

    # Fresh per-process dir: mkdtemp is 0700 and collision-free, so no
    # other user can have pre-created it or can swap the link later.
    # Failure paths remove it (r9 review): a host where the bundle is
    # unimportable would otherwise leak one dir per test process.
    shim = tempfile.mkdtemp(prefix="spark_graft_pb_shim_")
    try:
        os.symlink(target, os.path.join(shim, "google"))
    except OSError:  # pragma: no cover - symlink-less FS
        shutil.rmtree(shim, ignore_errors=True)
        return None

    if not _probe_import(shim):
        shutil.rmtree(shim, ignore_errors=True)
        return None  # bundle present but unimportable -> visible skip

    # Spawned Spark workers inherit the shim via PYTHONPATH.  Within
    # PYTHONPATH position is irrelevant vs site-packages (any
    # PYTHONPATH entry precedes it by Python's own rules), and this
    # branch only runs when there IS no pip protobuf to shadow;
    # appending at the END still keeps pre-existing PYTHONPATH
    # entries ahead of the shim.
    os.environ["PYTHONPATH"] = (
        os.environ.get("PYTHONPATH", "") + os.pathsep + shim
    ).lstrip(os.pathsep)
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    return shim
