"""The registry's rotation-audit comments drive next round's window
selection — a miscounted group header propagates into bad planning
(round-12 ADVICE: r11's comments said 'group B (6)' over 8 entries and
'remaining 32' over a 31-row tail). Pin every counted marker to the
actual dict layout."""
import re

import pytest

SRC = "__spark_entry__.py"
ENTRY = re.compile(r'^    "([a-z0-9_]+)": q_\w+,$')
COUNTED = re.compile(r"\((\d+)(?: rows)?[);,]")


def _layout():
    """(marker_line, count_or_None, n_entries_following) per comment
    section inside the _QUERIES literal."""
    with open(SRC) as fh:
        src = fh.read()
    body = src[src.index("_QUERIES: dict"):]
    body = body[:body.index("\n}")]
    sections = []
    for line in body.splitlines():
        if ENTRY.match(line):
            if not sections:
                pytest.fail("entry before any section marker")
            sections[-1][2] += 1
        elif line.strip().startswith("# group ") or "--- tail" in line \
                or "--- checked in round" in line:
            m = COUNTED.search(line)
            sections.append([line.strip(), int(m.group(1)) if m else None, 0])
    return sections


def test_counted_markers_match_layout():
    sections = _layout()
    assert sections, "no section markers found"
    bad = [(s[0], s[1], s[2]) for s in sections
           if s[1] is not None and s[1] != s[2]]
    assert not bad, f"comment counts disagree with layout: {bad}"


def test_window_is_exactly_50_entries():
    sections = _layout()
    window = 0
    for marker, _, n in sections:
        if "--- tail" in marker:
            break
        window += n
    else:
        pytest.fail("no tail marker found")
    assert window == 50, f"window holds {window} entries, driver checks 50"
