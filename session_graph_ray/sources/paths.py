"""Read-time partition-path predicates (SURVEY.md F4).

Reference semantic: the bulk processor drops ``/subagents/`` transcript
files BEFORE reading them — a 76% duplicate-triple avoidance that costs
zero I/O (``/root/reference/pipeline/bulk_process.py:31-33, 54-58``;
rationale ``CLAUDE.md:248``). The Ray-Data form: filter the FILE LIST that
feeds ``read_parquet`` / ``read_json``, so excluded partitions never produce
read tasks — pruning at the driver's metadata level, not per-row.
"""

from __future__ import annotations

import glob
import os


def filtered_paths(
    root_or_glob: "str | list[str]",
    exclude_substrings: tuple[str, ...] = (),
    include_suffixes: tuple[str, ...] = (".parquet",),
) -> list[str]:
    """Expand a directory/glob/explicit file list into a sorted file list
    with path predicates applied before any read task is scheduled."""
    if isinstance(root_or_glob, (list, tuple)):
        paths = list(root_or_glob)
    elif any(ch in root_or_glob for ch in "*?["):
        paths = glob.glob(root_or_glob)
    elif os.path.isdir(root_or_glob):
        paths = [
            os.path.join(dp, f)
            for dp, _dn, fns in os.walk(root_or_glob)
            for f in fns
        ]
    else:
        paths = [root_or_glob]
    out = [
        p
        for p in sorted(paths)
        if (not include_suffixes or p.endswith(include_suffixes))
        and not any(s in p for s in exclude_substrings)
    ]
    return out
