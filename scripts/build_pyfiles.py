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
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in members:
            with open(os.path.join(repo_root, rel), "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    os.replace(tmp, out_path)  # atomic: a concurrent submit never sees a torn zip
    return members


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dist/er_engine.zip")
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    members = build_zip(repo_root, os.path.join(repo_root, args.out)
                        if not os.path.isabs(args.out) else args.out)
    print(f"{args.out}: {len(members)} files")


if __name__ == "__main__":
    main()
