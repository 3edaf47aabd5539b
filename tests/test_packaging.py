"""spark-submit packaging contract (north rule: ``spark-submit --py-files``
on multi-executor clusters).

Pins the cheap, deterministic parts in-suite: the py-files zip builds
byte-reproducibly, contains exactly the package sources, and the package
imports AND computes from inside the zip in a clean interpreter (zipimport
— what executors do with --py-files).  The full JVM path is exercised
manually and recorded in BENCH/BASELINE.md: ``scripts/submit.sh
--synthetic 120`` runs the whole pipeline from the zip under spark-submit
local[4] (874 pairs -> 481 matches -> 120 clusters, exit 0).
"""

import hashlib
import importlib.util
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# load scripts/build_pyfiles.py by file path — no session-wide sys.path
# mutation (scripts/ must not shadow repo-root modules for later tests)
_spec = importlib.util.spec_from_file_location(
    "er_build_pyfiles", os.path.join(REPO, "scripts", "build_pyfiles.py")
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
PKG, build_zip = _mod.PKG, _mod.build_zip


def _sha(path):
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def test_zip_reproducible_and_source_only(tmp_path):
    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    members = build_zip(REPO, z1)
    build_zip(REPO, z2)
    assert _sha(z1) == _sha(z2), "py-files artifact must be byte-reproducible"
    names = zipfile.ZipFile(z1).namelist()
    assert all(n.endswith(".py") for n in names)
    assert all(n.startswith(PKG + "/") for n in names)
    assert not any("__pycache__" in n or n.startswith("tests") for n in names)
    # every on-disk module made it in (nothing silently dropped)
    on_disk = set()
    for dirpath, _, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                on_disk.add(os.path.relpath(os.path.join(dirpath, fn), REPO))
    assert set(members) == on_disk


def test_zipimport_clean_interpreter(tmp_path):
    z = str(tmp_path / "er.zip")
    build_zip(REPO, z)
    # fresh interpreter, cwd outside the repo, repo stripped from sys.path:
    # only the zip can satisfy the import — exactly an executor's view
    code = (
        "import sys; sys.path.insert(0, %r); "
        "sys.path = [p for p in sys.path if p not in (%r, '')]; "
        "from lab02_citation_matching_and_entity_resolution_spark.functions.normalize "
        "import normalize_text; "
        "import lab02_citation_matching_and_entity_resolution_spark.operators.clustering as c; "
        "print(normalize_text('  The  Answer: 42! '))" % (z, REPO)
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path),
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip().splitlines()[-1] == "the answer: 42"
