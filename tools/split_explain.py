#!/usr/bin/env python3
"""Split graft.Explain output into plans/<tag>/<lane>_<suffix>.txt files.

Usage: split_explain.py <explain_log> <out_dir> <suffix>
Reads the "========== <lane> ==========" headers graft.Explain prints and
writes each lane's formatted plan to <out_dir>/<lane>_<suffix>.txt.
"""
import re
import sys
import os

log, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(out_dir, exist_ok=True)
lane = None
buf = []


def flush():
    if lane and buf:
        text = "".join(buf).strip() + "\n"
        with open(os.path.join(out_dir, f"{lane}_{suffix}.txt"), "w") as f:
            f.write(text)


for line in open(log):
    m = re.match(r"=+ ([a-z0-9_]+) =+\s*$", line)
    if m:
        flush()
        lane = m.group(1)
        buf = []
    elif lane is not None:
        buf.append(line)
flush()
print("done")
