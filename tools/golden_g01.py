#!/usr/bin/env python3
"""Independent golden derivation for g01_supermer_spans at sf0.01.

Reimplements from scratch: the md5-chain DNA derivation, 2-bit encoding,
reverse complement, canonical XOR minimizer priority with the Kraken 2
toggle mask, the spaced-seed keep-mask, and a brute-force per-kmer window
minimum — no shared code with the Scala scanner, so the pinned golden is a
cross-implementation check of the core kernel. Run once; commit the output.
"""
import hashlib
import pyarrow.parquet as pq

M64 = (1 << 64) - 1
K, M, S = 35, 31, 7
XOR_MASK = 0xE37E28C4271B5A2D
HEX2DNA = str.maketrans("0123456789abcdef", "AAAACCCCGGGGTTTT")
CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def dna_of(text):
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    return (h(text) + h(text + "x") + h(text + "y") + h(text + "z")).translate(HEX2DNA)


def mer_mask(m):
    return (1 << (2 * m)) - 1


def encode(s):
    v = 0
    for ch in s:
        v = (v << 2) | CODE[ch]
    return v


def rc(mer, m):
    out = 0
    for _ in range(m):
        out = (out << 2) | (3 - (mer & 3))
        mer >>= 2
    return out


SPACE_MASK = mer_mask(M)
for i in range(S):
    SPACE_MASK &= ~(3 << (2 * (2 * i + 1)))
PRI_MASK = XOR_MASK & mer_mask(M)


def priority(mer):
    r = rc(mer, M)
    canon = mer if mer <= r else r  # unsigned min; values < 2^62 so int cmp ok
    return (canon ^ PRI_MASK) & SPACE_MASK


def g01_row(dna):
    n = len(dna)
    pris = [priority(encode(dna[j:j + M])) for j in range(n - M + 1)]
    per_kmer = [min(pris[i:i + K - M + 1]) for i in range(n - K + 1)]
    spans = 1 + sum(1 for a, b in zip(per_kmer, per_kmer[1:]) if a != b)
    return spans, len(per_kmer), len(set(per_kmer))


def main(sf="/root/testdata/sf0.01", tag="sf001"):
    tbl = pq.read_table(f"{sf}/documents.parquet")
    docs = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    with open(f"src/test/resources/golden/g01_spans_{tag}.tsv", "w") as f:
        for doc_id, text in docs:
            spans, kmers, distinct = g01_row(dna_of(text))
            f.write(f"{doc_id}\t{spans}\t{kmers}\t{distinct}\n")
    print("wrote", len(docs), "rows")


if __name__ == "__main__":
    import sys
    main(*sys.argv[1:])
