"""Granule file discovery: recursively list (and optionally stage) the
files under one or more top directories that match ANY of a set of
regexes and/or wildcard globs — the ingest-discovery front end that
feeds ``sources.granule.read_granules``.

Reference parity: ``climatology/clim/wls.py`` (the file is a misnamed
copy of the author's ``filelist.py`` utility — see its own module
header at wls.py:3 and the usage example at clim/sort.py:37; it
contains a recursive regex/wildcard file walker with ``s/pat/subst/``
name rewriting, size/mtime reporting, and atomic fetch-into-directory,
NOT weighted-least-squares math). This module re-implements the
in-scope semantics: ``matchAnyThenConstrain`` (wls.py:42),
``parse_re_with_subst`` (wls.py:712 — the ``s/pat/subst/`` form),
local ``walk`` + match + stat (wls.py:155-200) and the
tmp-write-then-``os.rename`` atomic fetch (wls.py:216-232). The
remote FTP/HTTP walkers (wls.py:391-665) are Python-2 ``urllib2``
network clients, out of scope in this offline engine — URL top paths
raise.

Scale note: listing is driver/catalog-side METADATA work here exactly
as it is inside Spark's own InMemoryFileIndex; at lake scale discovery
should read the write-time shard manifest (sources/lake.py) instead of
walking a filesystem, and this utility is the bootstrap for trees that
have no manifest yet (arrival directories, external granule drops).
"""

from __future__ import annotations

import os
import re
import shutil
from fnmatch import fnmatchcase
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

# the reference's rewrite form: 's/pattern/substitution/'
_RE_WITH_SUBST = re.compile(r"^s/(.+)/(.+)/$")


def parse_re_with_subst(spec: str) -> tuple[str, str | None]:
    """'s/pat/subst/' -> (pat, subst); anything else -> (spec, None)."""
    m = _RE_WITH_SUBST.match(spec)
    return (m.group(1), m.group(2)) if m else (spec, None)


def match_name(name: str, regs, wildcards,
               constraint: Callable[[str], bool] | None = None
               ) -> tuple[bool, str]:
    """(matched, possibly-rewritten name): True if `name` matches ANY
    compiled (pattern, subst) pair or ANY wildcard; with neither given,
    everything matches. A matching pattern with a substitution rewrites
    the name (the reference's URL-rewrite hook)."""
    if not regs and not wildcards:
        matched = True
    else:
        matched = False
        for pattern, subst in regs:
            if pattern.search(name):
                matched = True
                if subst is not None:
                    name = pattern.sub(subst, name)
                break
        if not matched:
            matched = any(fnmatchcase(name, w) for w in wildcards)
    if matched and constraint is not None:
        matched = bool(constraint(name))
    return matched, name


def list_files(top_paths, regexes=(), wildcards=(),
               match_path: bool = False, directories: bool = False,
               bottom_up: bool = False, with_info: bool = False,
               constraint: Callable[[str], bool] | None = None,
               fetch_dir: str | None = None,
               ) -> Iterator[tuple]:
    """Yield (path, rewritten_name) — plus (size, mtime) when
    `with_info` — for every file (or directory, with `directories`)
    under `top_paths` matching any regex/wildcard.

    regexes may be plain patterns or 's/pat/subst/' rewrite specs;
    matching is against the BASENAME unless `match_path`. `fetch_dir`
    copies each match into the directory under its (rewritten)
    basename via a tmp file + atomic os.rename, and yields the
    destination path instead — the reference's fetch mode.
    """
    if isinstance(top_paths, str):
        top_paths = [top_paths]
    regs = [(re.compile(p), s)
            for p, s in (parse_re_with_subst(r) for r in regexes)]
    wilds = list(wildcards)
    work_dir = None
    if fetch_dir is not None:
        work_dir = os.path.join(fetch_dir, ".tmp")
        os.makedirs(work_dir, exist_ok=True)
    for top in top_paths:
        if re.match(r"^[a-z][a-z0-9+.-]*://", top):
            raise NotImplementedError(
                "remote URL listing (ftp/http) is out of scope; "
                "stage granules locally first")
        for root, dirs, files in os.walk(os.path.abspath(top),
                                         topdown=not bottom_up):
            dirs.sort()
            for entry in sorted(dirs if directories else files):
                full = os.path.join(root, entry)
                name = full if match_path else entry
                ok, newname = match_name(name, regs, wilds, constraint)
                if not ok:
                    continue
                out = full
                if fetch_dir is not None and not directories:
                    dest = os.path.join(fetch_dir,
                                        os.path.basename(newname))
                    tmp = os.path.join(work_dir, os.path.basename(dest))
                    shutil.copyfile(full, tmp)
                    os.rename(tmp, dest)  # atomic move into place
                    out = dest
                if with_info:
                    st = os.stat(out)
                    yield out, newname, st.st_size, st.st_mtime
                else:
                    yield out, newname


def files_df(spark: SparkSession, top_paths, regexes=(), wildcards=(),
             **kw) -> DataFrame:
    """The discovery listing as a DataFrame (path, name, size, mtime) —
    the hand-off surface into read_granules / distributed ingest (each
    row becomes one section-spec / one mapInPandas task)."""
    rows = list(list_files(top_paths, regexes, wildcards,
                           with_info=True, **kw))
    return spark.createDataFrame(
        rows, "path string, name string, size long, mtime double")
