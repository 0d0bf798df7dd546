#!/usr/bin/env python3
"""Regenerate SURVEY.md's sf1 slope table from BENCH_SF1.json,
preserving per-query notes from the existing table. Markdown cells are
split on unescaped pipes only, so notes containing \| survive intact
(the bug a sed-based regeneration hit in round 11)."""
import json
import re
import sys

SURVEY = "SURVEY.md"
BENCH = "BENCH_SF1.json"
HEADER = "| query | sf0.1 s | sf1 s | slope (10× data) | note |"


def split_row(line):
    # split on '|' not preceded by a backslash
    cells = re.split(r"(?<!\\)\|", line)
    return [c.strip() for c in cells][1:-1]  # drop edge empties


def main():
    bench = json.load(open(BENCH))["queries"]
    text = open(SURVEY).read()
    lines = text.split("\n")
    start = lines.index(HEADER)
    end = start + 2
    notes = {}
    while end < len(lines) and lines[end].startswith("|"):
        cells = split_row(lines[end])
        if len(cells) == 5 and cells[0] != "query":
            notes[cells[0]] = cells[4]
        end += 1
    rows = sorted(bench.items(), key=lambda kv: -kv[1]["slope"])
    out = [HEADER, "|---|---|---|---|---|"]
    for name, v in rows:
        note = notes.get(name, "")
        out.append(
            f"| {name} | {v['sf01_sec']:.2f} | {v['sf1_sec']:.2f} "
            f"| {v['slope']:.2f} | {note} |")
    new = lines[:start] + out + lines[end:]
    open(SURVEY, "w").write("\n".join(new))
    print(f"rewrote {len(rows)} rows ({len(notes)} notes carried)")


if __name__ == "__main__":
    main()
