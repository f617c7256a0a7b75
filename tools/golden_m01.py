#!/usr/bin/env python3
"""Independent golden derivation for m01_media_features at sf0.01.

m01 renders an 8x8 PNG per document (mix64-chained RGB pixels seeded by the
Java hashCode of the text), then runs the REAL decode path: magic-byte
sniff -> javax.imageio decode (true dims) -> 2x2 grid-pooled integer
luminance in float32. Because the pixel values are fully determined BEFORE
the PNG round trip, this golden recomputes them analytically — Java UTF-16
hashCode, splitmix64 chain, integer luminance, float32 accumulation in scan
order, Spark's HALF_UP float rounding (BigDecimal(double) semantics) — in
pure Python with NO image library. A mismatch would catch either a kernel
bug or a lossy imageio encode/decode. Run once; commit the output.
"""
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pyarrow.parquet as pq

from golden_t09_t10 import M64, mix64


def java_hash(s):
    """java.lang.String.hashCode over UTF-16 code units (corpus is BMP-only,
    same assumption golden_t09_t10.hash_string asserts)."""
    h = 0
    for ch in s:
        assert ord(ch) <= 0xFFFF
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def round4_spark_float(v32):
    """Spark round(FloatType, 4): widen to double, BigDecimal via
    Double.toString (shortest repr == Python repr), setScale HALF_UP,
    narrow back to float."""
    d = Decimal(repr(float(v32))).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    return np.float32(float(d))


def features(text):
    """(f0, f3): mean luminance of the top-left / bottom-right 4x4 quadrant
    of the analytically-known 8x8 pixel grid, float32-accumulated in the
    same y-outer/x-inner order as the Scala kernel."""
    pix = []
    # seed = mix64(hashCode.toLong) — two's complement for the negative case
    h = mix64(java_hash(text) % (1 << 64))
    for p in range(64):
        h = mix64((h + p) & M64)
        pix.append(h & 0xFFFFFF)
    acc = [np.float32(0)] * 4
    cnt = [0] * 4
    for y in range(8):
        for x in range(8):
            rgb = pix[y * 8 + x]
            r, g, b = (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF
            lum = (r * 299 + g * 587 + b * 114) // 1000  # Java int division
            cell = min(1, y * 2 // 8) * 2 + min(1, x * 2 // 8)
            acc[cell] = acc[cell] + np.float32(lum) / np.float32(255.0)
            cnt[cell] += 1
    f = [acc[i] / np.float32(cnt[i]) for i in range(4)]
    return round4_spark_float(f[0]), round4_spark_float(f[3])


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    tbl = pq.read_table(f"{sf}/documents.parquet")
    rows = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    out = []
    for doc_id, text in rows:
        f0, f3 = features(text)
        out.append(f"{doc_id}\tpng\t8\t8\t{str(f0)}\t{str(f3)}")
    path = (f"/root/repo/src/test/resources/golden/m01_media_{tag}.tsv")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"{len(out)} rows -> {path}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
