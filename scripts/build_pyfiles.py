#!/usr/bin/env python
"""Build the ``--py-files`` artifact for spark-submit (north rule: "runs via
spark-submit --py-files on multi-executor clusters").

Produces ``dist/er_engine.zip`` containing only the package's ``.py`` sources
(no tests, no caches, no data), with deterministic member order and fixed
timestamps so the artifact is byte-reproducible: two builds of the same tree
hash identically, which lets a deploy pipeline cache it by content.

Usage:  python scripts/build_pyfiles.py [--out dist/er_engine.zip]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import zipfile

PKG = "lab02_citation_matching_and_entity_resolution_spark"
# fixed timestamp (2020-01-01) => reproducible zip bytes
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build_zip(repo_root: str, out_path: str) -> list[str]:
    """Write the py-files zip; return the archived member names (sorted)."""
    pkg_dir = os.path.join(repo_root, PKG)
    members: list[str] = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append(os.path.relpath(full, repo_root))
    out_dir = os.path.dirname(out_path) or "."
    os.makedirs(out_dir, exist_ok=True)
    # private (mkstemp) staging in the destination dir + atomic rename:
    # concurrent builds never interleave writes, and a concurrent submit
    # never sees a torn zip
    fd, tmp = tempfile.mkstemp(prefix=".er_engine_", suffix=".zip.tmp", dir=out_dir)
    try:
        with os.fdopen(fd, "wb") as raw, zipfile.ZipFile(raw, "w", zipfile.ZIP_DEFLATED) as zf:
            for rel in members:
                with open(os.path.join(repo_root, rel), "rb") as fh:
                    data = fh.read()
                info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_EPOCH)
                info.external_attr = 0o644 << 16
                zf.writestr(info, data, zipfile.ZIP_DEFLATED)
        os.chmod(tmp, 0o644)  # mkstemp creates 0600; the artifact is world-readable
        os.replace(tmp, out_path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return members


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dist/er_engine.zip")
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # relative --out is anchored at the repo root (where submit.sh expects
    # it), and the resolved path is what gets printed
    out_path = args.out if os.path.isabs(args.out) else os.path.join(repo_root, args.out)
    members = build_zip(repo_root, out_path)
    print(f"{out_path}: {len(members)} files")


if __name__ == "__main__":
    main()
