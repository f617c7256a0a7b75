#!/usr/bin/env python3
"""Independent golden derivation for m02_audio_features at sf0.01.

m02 synthesizes 800 PCM samples per document (a mix64 chain seeded by the
Java hashCode of the text XOR 0x5eed, arithmetic-shifted to [-1, 1)
float32), writes a REAL 16-bit WAV through the JDK writer, and decodes it
back through javax.sound before computing an 8-window RMS energy envelope.
The samples are fully determined BEFORE the WAV round trip, and PCM16
quantization is exactly clamp(round(s * 32767)) on encode and /32768 on
decode — so this golden recomputes the envelopes analytically in pure
Python with NO audio library. A mismatch catches either a kernel bug or a
lossy encode/decode. Run once from tools/; commit the output.
"""
import numpy as np
import pyarrow.parquet as pq

from golden_t09_t10 import M64, mix64
from golden_m01 import java_hash, round4_spark_float

N = 800
DIM = 8


def envelope(text):
    h = mix64((java_hash(text) ^ 0x5EED) % (1 << 64))
    sum_sq = [0.0] * DIM
    cnt = [0] * DIM
    inv = np.float32(float(1 << 52))
    for i in range(N):
        h = mix64((h + i) & M64)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        # Java arithmetic >> == Python floor-shift on signed ints
        sample = np.float32(signed >> 11) / inv
        # Math.round(float): floor(x + 0.5f) in FLOAT arithmetic, clamped
        t = np.float32(sample * np.float32(32767.0))
        q = int(np.floor(np.float32(t + np.float32(0.5))))
        q = max(-32768, min(32767, q))
        val = np.float32(q) / np.float32(32768.0)
        w = min(DIM - 1, i * DIM // N)
        sum_sq[w] += float(val) * float(val)
        cnt[w] += 1
    return [round4_spark_float(np.float32(np.sqrt(sum_sq[w] / cnt[w])))
            for w in range(DIM)]


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    tbl = pq.read_table(f"{sf}/documents.parquet")
    rows = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    out = []
    for doc_id, text in rows:
        e = envelope(text)
        out.append(f"{doc_id}\twav\t8000.0\t1\t{N}\t0.1\t{e[0]}\t{e[DIM-1]}")
    path = f"/root/repo/src/test/resources/golden/m02_audio_{tag}.tsv"
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"{len(out)} rows -> {path}")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
