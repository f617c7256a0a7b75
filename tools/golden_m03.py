#!/usr/bin/env python3
"""Independent golden derivation for m03_frame_sample at sf0.01.

m03 synthesizes a 4096-byte blob per document (mix64 chain seeded by the
Java hashCode of the text XOR 0xf1a6e5), decimates it into every 4th
256-byte frame, and emits per-frame md5 digests. Everything is exact byte
arithmetic, so this golden re-derives each digest in pure Python with
hashlib. Run once from tools/; commit the output.
"""
import hashlib

import pyarrow.parquet as pq

from golden_t09_t10 import M64, mix64
from golden_m01 import java_hash


def frames(text):
    h = mix64((java_hash(text) ^ 0xF1A6E5) % (1 << 64))
    blob = bytearray(4096)
    for i in range(4096):
        h = mix64(h)
        blob[i] = h & 0xFF
    return [(f, hashlib.md5(bytes(blob[f * 256:(f + 1) * 256])).hexdigest())
            for f in range(0, 16, 4)]


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    tbl = pq.read_table(f"{sf}/documents.parquet")
    rows = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    out = []
    for doc_id, text in rows:
        for f, digest in frames(text):
            out.append(f"{doc_id}\t{f}\t{digest}")
    path = f"/root/repo/src/test/resources/golden/m03_frames_{tag}.tsv"
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"{len(out)} rows -> {path}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
