"""Failure-path coverage for the protobuf shim (r8 verdict #7: if the
Google Cloud SDK moves or its bundle stops importing, the
transformWithState test must fall back to a VISIBLE skip — the shim
must return None, never raise — and the r8 ADVICE medium: the shim
dir must be fresh/owner-only, never a fixed world-writable path)."""

import os
import stat
import sys

from ena_database_build_spark.pbshim import install_protobuf_shim


def _snapshot():
    return list(sys.path), os.environ.get("PYTHONPATH")


def test_missing_sdk_dir_returns_none(tmp_path):
    """SDK moved away entirely -> None, interpreter untouched."""
    path_before, pp_before = _snapshot()
    assert install_protobuf_shim(str(tmp_path / "nonexistent")) is None
    assert (list(sys.path), os.environ.get("PYTHONPATH")) == (
        path_before, pp_before)


def test_dir_without_protobuf_returns_none(tmp_path):
    """A google/ dir with no protobuf package inside -> None."""
    (tmp_path / "google").mkdir()
    assert install_protobuf_shim(str(tmp_path)) is None


def test_unimportable_bundle_returns_none_and_unwinds(tmp_path):
    """google/protobuf exists but raises on import (e.g. an SDK two
    minors ahead whose own guard raises) -> None, and the probe's
    sys.path/sys.modules changes are fully unwound."""
    pb = tmp_path / "google" / "protobuf"
    pb.mkdir(parents=True)
    (tmp_path / "google" / "__init__.py").write_text("")
    (pb / "__init__.py").write_text("")
    (pb / "descriptor.py").write_text(
        "raise ImportError('simulated version-incompatible bundle')\n")
    path_before, _ = _snapshot()
    assert install_protobuf_shim(str(tmp_path)) is None
    assert list(sys.path) == path_before
    assert not any(
        m for m, mod in sys.modules.items()
        if m.startswith("google") and mod is not None
        and str(tmp_path) in (getattr(mod, "__file__", "") or "")
    )


def test_importable_fake_bundle_installs_owner_only_fresh_dir(
        tmp_path, monkeypatch):
    """Happy path on a fake-but-importable bundle: returns a FRESH
    mkdtemp dir (owner-only mode 0700 — the ADVICE fix), exposes only
    the google symlink, and exports it via PYTHONPATH.  Any
    already-installed protobuf (e.g. conftest's real shim) is hidden
    for the duration so the install branch actually executes."""
    monkeypatch.setattr(sys, "path", [
        p for p in sys.path if "pb_shim" not in p])
    for m in [m for m in sys.modules
              if m == "google" or m.startswith("google.")]:
        monkeypatch.delitem(sys.modules, m)
    monkeypatch.setenv("PYTHONPATH", "/keep/me")

    pb = tmp_path / "google" / "protobuf"
    pb.mkdir(parents=True)
    (tmp_path / "google" / "__init__.py").write_text("")
    (pb / "__init__.py").write_text("")
    (pb / "descriptor.py").write_text("OK = True\n")
    shim = install_protobuf_shim(str(tmp_path))
    try:
        assert shim is not None and os.path.basename(shim).startswith(
            "spark_graft_pb_shim_")
        mode = stat.S_IMODE(os.stat(shim).st_mode)
        assert mode == 0o700, oct(mode)
        assert os.listdir(shim) == ["google"]
        pp = os.environ["PYTHONPATH"].split(os.pathsep)
        assert shim in pp and pp[0] == "/keep/me"
    finally:
        # unwind what install_protobuf_shim added; monkeypatch restores
        # sys.path/PYTHONPATH/sys.modules snapshots itself
        for m in [m for m in sys.modules
                  if m == "google" or m.startswith("google.")]:
            mod_file = getattr(sys.modules[m], "__file__", "") or ""
            if shim and shim in os.path.realpath(mod_file):
                del sys.modules[m]


def test_shim_never_uses_fixed_tmp_path(tmp_path):
    """Regression pin for the ADVICE finding: no fixed
    /tmp/spark_graft_pb_shim path anywhere in the shim source."""
    from ena_database_build_spark import pbshim

    src = open(pbshim.__file__).read()
    assert 'os.path.join(tempfile.gettempdir(), "spark_graft_pb_shim")' \
        not in src
    assert "mkdtemp" in src
