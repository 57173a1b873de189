"""The spark-submit --py-files artifact: buildable, importable from the zip
alone, reproducible (north_rule launch contract)."""

from __future__ import annotations

import subprocess
import sys
import zipfile


def test_pyfiles_zip_imports_standalone(tmp_path):
    from tools.package_pyfiles import build_zip
    import al_drift_detection_spark

    repo_root = str(
        __import__("pathlib").Path(al_drift_detection_spark.__file__).parent.parent
    )
    out = build_zip(repo_root, str(tmp_path / "engine.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "al_drift_detection_spark/__init__.py" in names
    assert "al_drift_detection_spark/runner.py" in names
    assert not any(n.startswith(("tests/", "tools/")) for n in names)
    # import the package from the ZIP ONLY, in a clean interpreter — what an
    # executor does after spark-submit ships the archive
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import al_drift_detection_spark.suite, al_drift_detection_spark.kernels; "
        "print('ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out], capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 0 and r.stdout.strip() == "ok", r.stderr[-500:]


def test_pyfiles_zip_reproducible(tmp_path):
    from tools.package_pyfiles import build_zip
    import al_drift_detection_spark

    repo_root = str(
        __import__("pathlib").Path(al_drift_detection_spark.__file__).parent.parent
    )
    a = build_zip(repo_root, str(tmp_path / "a.zip"))
    b = build_zip(repo_root, str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
