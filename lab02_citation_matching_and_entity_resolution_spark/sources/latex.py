"""LaTeX project-assembly source (SURVEY.md §2.1 S6).

The reference walks one paper's LaTeX source tree on the local filesystem:
find the main .tex (ref: src/parse_util.py:1071-1095 legacy_find_main_tex),
then recursively inline ``\\input``/``\\include``/``\\subfile``/``\\import``
with ``\\includeonly`` filtering, comment stripping, and cycle protection
(ref :1037-1068 legacy_inline_includes; helpers :985-1032).

Spark-first shape: a project is a GROUP of (relpath, content) rows and
assembly runs as applyInPandas per project_id — each project is small (one
paper's tree), projects are many, so the grain distributes exactly like every
other per-group operator in this engine; at 100 TB the unit of parallelism is
the project, never the file.

Fresh implementation of the semantics over an in-memory {relpath: content}
mapping instead of filesystem probing.  One documented deviation: main-file
detection iterates candidates in sorted(relpath) order — the reference
iterates ``rglob()`` order, which is filesystem-dependent and unspecified, so
a deterministic total order is the only reproducible choice.
"""

from __future__ import annotations

import posixpath
import re
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ref: src/parse_util.py:975-983 — root-level main-file names, in priority order
MAIN_TEX_CANDIDATES = (
    "main.tex",
    "paper.tex",
    "ms.tex",
    "manuscript.tex",
    "article.tex",
    "root.tex",
)

_INCLUDE_RE = re.compile(r"\\(input|include|subfile)\{([^}]+)\}")
_IMPORT_RE = re.compile(r"\\import\{([^}]+)\}\{([^}]+)\}")
_INCLUDEONLY_RE = re.compile(r"\\includeonly\{([^}]*)\}", re.I)
# head-scan probes match the reference exactly (ref :1081-1084): the basic
# probe needs only the OPENING brace, so a command whose argument spans the
# 2000-char head boundary still marks the file as main-like
_HEAD_INCLUDE_RE = re.compile(r"\\(input|include|subfile)\{")

ASSEMBLED_SCHEMA = "project_id string, main_path string, text string"


def strip_tex_comments(text: str) -> str:
    """Drop %-comments, keeping escaped \\% (ref :644-645)."""
    return re.sub(r"(?<!\\)%.*", "", text)


def _normalize_include_token(token: str) -> str:
    # ref :1004-1012: strip braces/ws, backslash->slash, drop .tex suffix,
    # drop empty/./.. path parts
    token = token.strip().strip("{}")
    if not token:
        return ""
    token = token.replace("\\", "/")
    if token.endswith(".tex"):
        token = token[:-4]
    return "/".join(p for p in token.split("/") if p and p not in (".", ".."))


def _parse_includeonly(raw: str) -> Optional[set]:
    # ref :1015-1023: first \includeonly{...}, comma-split, normalized;
    # absent or all-empty -> None (no filtering)
    m = _INCLUDEONLY_RE.search(raw)
    if not m:
        return None
    items = {_normalize_include_token(x) for x in m.group(1).split(",")}
    items.discard("")
    return items or None


def _include_allowed(raw_path: str, include_only: Optional[set]) -> bool:
    # ref :1026-1032: no \includeonly -> everything allowed; else match the
    # normalized token or its basename
    if include_only is None:
        return True
    norm = _normalize_include_token(raw_path)
    if not norm:
        return False
    return norm in include_only or norm.rsplit("/", 1)[-1] in include_only


def _resolve(files: dict, current_dir: str, raw_path: str) -> Optional[str]:
    # ref :990-1001: append .tex when missing; try relative to the including
    # file's directory first, then the project root
    candidate = raw_path.strip()
    if not candidate:
        return None
    if not candidate.endswith(".tex"):
        candidate = f"{candidate}.tex"
    for cand in (posixpath.join(current_dir, candidate), candidate):
        norm = posixpath.normpath(cand)
        if norm in files:
            return norm
    return None


def find_main_tex(files: dict) -> Optional[str]:
    """Pick the project's main .tex (ref :1071-1095, deterministic order).

    Priority: a root-level well-known name; else the first file whose head
    (2000 chars) contains an include-ish command; else the first whose head
    declares ``\\documentclass``; else None.
    """
    if not files:
        return None
    for name in MAIN_TEX_CANDIDATES:
        if name in files:
            return name
    ordered = sorted(files)
    for relpath in ordered:
        head = (files[relpath] or "")[:2000]
        if _HEAD_INCLUDE_RE.search(head) or _IMPORT_RE.search(head):
            return relpath
    for relpath in ordered:
        if "\\documentclass" in (files[relpath] or "")[:2000]:
            return relpath
    return None


def inline_includes(
    files: dict,
    relpath: str,
    visited: Optional[set] = None,
    include_only: Optional[set] = None,
) -> str:
    """Recursively splice included files into one document (ref :1037-1068).

    Cycles return '' at the revisit (visited set); unresolvable includes
    vanish; ``\\include`` targets blocked by ``\\includeonly`` vanish;
    ``\\input``/``\\subfile``/``\\import`` ignore the includeonly filter —
    all exactly the reference's rules, including the quirk that a file with
    no inherited includeonly parses its OWN ``\\includeonly`` on first entry.
    """
    visited = visited if visited is not None else set()
    if relpath in visited:
        return ""
    visited.add(relpath)
    raw = strip_tex_comments(files.get(relpath) or "")
    if include_only is None:
        include_only = _parse_includeonly(raw)
    raw = _INCLUDEONLY_RE.sub("", raw)
    current_dir = posixpath.dirname(relpath)

    def splice_basic(m: re.Match) -> str:
        cmd = (m.group(1) or "").lower()
        inc = m.group(2)
        if cmd == "include" and not _include_allowed(inc, include_only):
            return ""
        target = _resolve(files, current_dir, inc)
        if target is None:
            return ""
        return inline_includes(files, target, visited, include_only)

    def splice_import(m: re.Match) -> str:
        target = _resolve(files, current_dir, posixpath.join(m.group(1), m.group(2)))
        if target is None:
            return ""
        return inline_includes(files, target, visited, include_only)

    out = _INCLUDE_RE.sub(splice_basic, raw)
    return _IMPORT_RE.sub(splice_import, out)


def assemble_latex_projects(
    files_df: DataFrame,
    project_col: str = "project_id",
    path_col: str = "relpath",
    content_col: str = "content",
) -> DataFrame:
    """S6: (project_id, relpath, content) rows -> one assembled doc per project.

    Per-project applyInPandas: find the main .tex, inline its include tree.
    Projects with no identifiable main file emit no row (the reference's
    caller skips None from legacy_find_main_tex).  Only .tex rows participate
    in main-detection/inlining; other rows are ignored by the resolver since
    include targets always get a .tex suffix (ref :995-996).
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        files = {
            p: (c if isinstance(c, str) else "")
            for p, c in zip(pdf[path_col], pdf[content_col])
            if isinstance(p, str) and p.endswith(".tex")
        }
        main = find_main_tex(files)
        if main is None:
            return pd.DataFrame(columns=["project_id", "main_path", "text"])
        pid = pdf[project_col].iloc[0]
        return pd.DataFrame(
            [{"project_id": pid, "main_path": main, "text": inline_includes(files, main)}]
        )

    return (
        files_df.select(
            F.col(project_col).alias(project_col),
            F.col(path_col).alias(path_col),
            F.col(content_col).alias(content_col),
        )
        .groupBy(project_col)
        .applyInPandas(run, schema=ASSEMBLED_SCHEMA)
    )


def read_latex_project_files(spark: SparkSession, root: str) -> DataFrame:
    """Load ``root/<project>/**/*.tex`` into (project_id, relpath, content).

    Recursive wholetext scan; project_id is the first path component under
    ``root``, relpath the remainder.  Files sitting directly in ``root``
    (no project directory) are dropped — every file must belong to a group.
    """
    from urllib.parse import quote

    marker = root.rstrip("/") + "/"
    # input_file_name() yields the Hadoop Path URI, which percent-encodes
    # e.g. spaces — match the marker in BOTH raw and URI-encoded spelling,
    # and fail LOUDLY if neither matched: the pre-r5 string match silently
    # left the full URI in place on mismatch, collapsing every file into a
    # bogus project_id of 'file:'.  The safe set mirrors what a java.net.URI
    # path leaves unencoded (unreserved + sub-delims + ':@/'), so e.g.
    # '/tmp/c++ projects' encodes to the same '.../c++%20projects' spelling
    # on both sides.
    enc_marker = quote(marker, safe="/:@!$&'()*+,;=")
    raw = (
        spark.read.option("wholetext", True)
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", "*.tex")
        .text(root)
        .select(F.input_file_name().alias("_file"), "value")
    )
    pat = "^.*?(?:" + re.escape(marker) + "|" + re.escape(enc_marker) + ")"
    stripped = F.regexp_replace(F.col("_file"), pat, "")
    # decode the URI remainder back to real path components; '+' is literal
    # in a java.net.URI path (only %-escapes encode), so protect it from
    # url_decode's form-decoding ('+' -> ' ') by re-escaping it first
    rel_raw = F.url_decode(F.regexp_replace(stripped, r"\+", "%2B"))
    rel = F.when(
        # an unsubstituted row still carries the URI scheme prefix
        rel_raw.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:/"),
        F.raise_error(
            F.concat(
                F.lit(
                    "read_latex_project_files: cannot derive relpath under "
                    f"root {marker!r} from file "
                ),
                F.col("_file"),
            )
        ),
    ).otherwise(rel_raw)
    return (
        raw.select(
            rel.alias("_rel"),
            F.col("value").alias("content"),
        )
        .where(F.col("_rel").contains("/"))
        .select(
            F.substring_index(F.col("_rel"), "/", 1).alias("project_id"),
            F.regexp_replace(F.col("_rel"), "^[^/]+/", "").alias("relpath"),
            "content",
        )
    )
