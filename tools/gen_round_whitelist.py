#!/usr/bin/env python3
"""Regenerate the ENTRY section of tools/round_whitelist.txt from source.

Keeps the header (lines up to and including the first blank line after the
comment block) and rewrites the entries. Run after intentionally adding a
round( site you have classified as safe (see the header's class list);
RoundAuditSpec enforces the file.
"""
import os

WL = os.path.join(os.path.dirname(__file__), "round_whitelist.txt")
SRC = os.path.join(os.path.dirname(__file__), "..", "src", "main", "scala")

header = []
with open(WL) as fh:
    for line in fh:
        if line.startswith("#") or not line.strip():
            header.append(line)
        else:
            break

out = []
for root, _, fs in os.walk(SRC):
    for f in sorted(fs):
        if not f.endswith(".scala"):
            continue
        p = os.path.join(root, f)
        rel = os.path.relpath(p, SRC)
        for line in open(p):
            t = line.strip()
            if t.startswith("//") or t.startswith("*") or t.startswith("/*"):
                continue
            if "round(" in t and "math.round" not in t:
                out.append(rel + "|" + t)

with open(WL, "w") as fh:
    fh.writelines(header)
    for l in out:
        fh.write(l + "\n")
print(f"wrote {len(out)} entries")
