#!/usr/bin/env python3
"""Independent golden derivation for m04_video_meta at sf0.01.

m04 assembles a deterministic ISO-BMFF (MP4) header per document —
mix64-chained timescale/duration/width/height/mdat-length seeded by the
Java hashCode of the text XOR 0x51dea — via the real box writer
(VideoCodecs.encodeMp4Header), then parses it back with the real box
walker (VideoCodecs.parseMp4). Because every field is fully determined
BEFORE the byte round trip, this golden recomputes them analytically:
the mix64 chain, the fixed public-spec box sizes (ftyp 20 B, moov 216 B,
mdat 8+len B -> n_bytes = 244 + mdat_len), the duration division and
Spark's round(DOUBLE, 6) HALF_UP semantics — in pure Python with no
container library. A mismatch would catch either chain drift or a lossy
encode/parse. Run once per SF tag; commit the output.
"""
from decimal import Decimal, ROUND_HALF_UP

import pyarrow.parquet as pq

from golden_t09_t10 import M64, mix64
from golden_m01 import java_hash


def round6_spark_double(v):
    """Spark round(DoubleType, 6): BigDecimal via Double.toString (shortest
    repr == Python repr), setScale HALF_UP, back to double."""
    return float(Decimal(repr(float(v))).quantize(Decimal("0.000001"),
                                                  ROUND_HALF_UP))


def fields(text):
    h = mix64((java_hash(text) ^ 0x51DEA) % (1 << 64))
    timescale = 600 + h % 90000
    h = mix64(h)
    dur_ticks = h % 10000000
    h = mix64(h)
    width = 16 * (1 + h % 256)
    h = mix64(h)
    height = 16 * (1 + h % 256)
    h = mix64(h)
    mdat_len = 64 + (h & 0xFF)
    # encodeMp4Header layout: ftyp(8+12) + moov(8 + mvhd(8+100) + trak(8 +
    # tkhd(8+84))) + mdat(8+len) = 20 + 216 + 8 + len
    n_bytes = 244 + mdat_len
    duration_s = round6_spark_double(dur_ticks / timescale)
    return (n_bytes, timescale, duration_s, width, height)


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    tbl = pq.read_table(f"{sf}/documents.parquet")
    rows = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    out = []
    for doc_id, text in rows:
        n_bytes, timescale, duration_s, width, height = fields(text)
        out.append(f"{doc_id}\tmp4\t{n_bytes}\tisom\t{timescale}\t"
                   f"{duration_s}\t1\t{width}\t{height}")
    path = f"/root/repo/src/test/resources/golden/m04_video_{tag}.tsv"
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"{len(out)} rows -> {path}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
