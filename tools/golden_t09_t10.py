#!/usr/bin/env python3
"""Independent golden derivation for t09 (language-ID argmax counts) and
t10 (winnowing fingerprint counts) over /root/testdata/sf0.01/documents.

Reimplements the kernels from scratch (FNV-1a/splitmix64 hashing, winnowing
window minimum with the <=-rightmost rule, script-first language heuristic)
in Python, so the pinned goldens in src/test/resources/golden/ are NOT a
tautology of the Scala implementation. Run once; commit the outputs.
"""
import pyarrow.parquet as pq

M64 = (1 << 64) - 1


def mix64(z):
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def hash_string(s):
    h = 0xCBF29CE484222325
    for ch in s:  # UTF-16 code units: python chars > 0xFFFF would differ,
        # but the corpus is BMP-only (asserted below)
        assert ord(ch) <= 0xFFFF
        h ^= ord(ch)
        h = (h * 0x100000001B3) & M64
    return mix64(h)


def winnowing_count(text, k=8, window=4):
    L = len(text)
    if L < k:
        return 0 if L == 0 else 1
    n = L - k + 1
    hashes = [hash_string(text[i:i + k]) for i in range(n)]
    out = set()
    last = n - window
    w = 0
    while w <= max(0, last):
        min_idx = w
        for j in range(w + 1, min(w + window, n)):
            if hashes[j] <= hashes[min_idx]:  # unsigned cmp == int cmp here
                min_idx = j
        out.add(hashes[min_idx])
        w += 1
    return len(out)


STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "is", "that", "it", "was",
           "for", "with", "as", "on", "at", "by"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "que", "un",
           "une", "dans", "pour", "pas", "sur", "avec"},
    "es": {"el", "la", "los", "de", "que", "y", "es", "en", "un", "una",
           "del", "las", "por", "con", "para"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den",
           "nicht", "ein", "eine", "mit", "auf", "sich", "auch"},
    "it": {"il", "di", "che", "e", "la", "per", "non", "sono", "con",
           "del", "una", "gli", "nel", "anche", "come"},
    "pt": {"o", "de", "a", "e", "do", "da", "em", "um", "para", "com",
           "uma", "os", "no", "na", "por"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "dat", "op",
           "te", "zijn", "met", "voor", "niet", "aan"},
}

RANGES = [
    ("han", 0x4E00, 0x9FFF), ("kana", 0x3040, 0x30FF),
    ("hangul", 0xAC00, 0xD7AF), ("cyr", 0x0400, 0x04FF),
    ("arab", 0x0600, 0x06FF), ("deva", 0x0900, 0x097F),
    ("greek", 0x0370, 0x03FF), ("hebrew", 0x0590, 0x05FF),
    ("thai", 0x0E00, 0x0E7F),
]
SCRIPT_LANG = {"han": "zh", "hangul": "ko", "cyr": "ru", "arab": "ar",
               "deva": "hi", "greek": "el", "hebrew": "he", "thai": "th"}


def detect_language(text):
    if not text:
        return "und"
    counts = {name: 0 for name, _, _ in RANGES}
    letters = 0
    for ch in text:
        c = ord(ch)
        if ch.isalpha():
            letters += 1
            for name, lo, hi in RANGES:
                if lo <= c <= hi:
                    counts[name] += 1
                    break
    if letters > 0:
        kana, han = counts["kana"], counts["han"]
        if (kana >= 1 and han >= 1) or (kana >= 2 and kana * 10 > letters):
            return "ja"
        # max with first-listed tie-break, mirroring Seq.maxBy
        dom_name, dom_n = None, -1
        for name, _, _ in RANGES:
            if name != "kana" and counts[name] > dom_n:
                dom_name, dom_n = name, counts[name]
        if dom_n * 3 > letters:
            return SCRIPT_LANG[dom_name]
    toks = [t for t in text.lower().split() if t]
    if not toks:
        return "und"
    best, best_score = "und", 0
    for lang in sorted(STOPWORDS):
        score = sum(1 for t in toks if t in STOPWORDS[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


def main():
    tbl = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    docs = sorted(zip(tbl.column("doc_id").to_pylist(),
                      tbl.column("text").to_pylist()))
    langs = {}
    with open("src/test/resources/golden/t10_fingerprints_sf001.tsv", "w") as f:
        for doc_id, text in docs:
            lang = detect_language(text)
            langs[lang] = langs.get(lang, 0) + 1
            f.write(f"{doc_id}\t{winnowing_count(text)}\n")
    with open("src/test/resources/golden/t09_langid_sf001.tsv", "w") as f:
        for lang in sorted(langs):
            f.write(f"{lang}\t{langs[lang]}\n")
    print("langs:", langs)


if __name__ == "__main__":
    main()
