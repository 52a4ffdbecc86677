"""Extract the published empirical codon matrices (ECM) from the reference
source into model/data/codon_ecm.npz.

These are PUBLISHED scientific constants — Kosiol, Holmes & Goldman (2007)
ECM(un)rest and Schneider, Cannarozzi & Gonnet (2005) — embedded as string
literals in /root/reference/model/modelcodon.cpp:16-160 and read by
readCodonModel (:699): lower-triangle exchangeabilities (61x61), then 61
frequencies, then the 61 codon labels that define the row order.
"""

import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/model/modelcodon.cpp").read_text()
OUT = Path(__file__).parent.parent / "iqtree2_tpu" / "model" / "data" / \
    "codon_ecm.npz"


def extract_string_var(name: str) -> str:
    """Concatenate the C++ string literal(s) assigned to `name` (handles
    'string X = "..." "..."...;' and 'string X = A + " " + B;')."""
    m = re.search(rf"string {name}\s*=\s*(.*?);", SRC, re.S)
    assert m, name
    expr = m.group(1)
    parts = []
    for tok in re.split(r"\+", expr):
        tok = tok.strip()
        lits = re.findall(r'"((?:[^"\\]|\\[\s\S])*)"', tok)
        if lits:
            parts.extend(x.replace("\\\n", " ") for x in lits)
        elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok):
            parts.append(extract_string_var(tok))
    return " ".join(parts)


def parse_model(text: str, n: int = 61):
    toks = text.split()
    nrt = n * (n - 1) // 2
    assert len(toks) >= nrt + n + n, (len(toks), nrt + 2 * n)
    vals = [float(x) for x in toks[: nrt + n]]
    codons = toks[nrt + n: nrt + n + n]
    M = np.zeros((n, n))
    k = 0
    for i in range(1, n):
        for j in range(i):
            M[i, j] = M[j, i] = vals[k]
            k += 1
    freqs = np.asarray(vals[nrt:])
    assert all(len(c) == 3 for c in codons), codons[:5]
    return M, freqs, codons


def main():
    out = {}
    for key, var in (("KOSI07", "model_ECMunrest"),
                     ("ECMREST", "model_ECMrest"),
                     ("SCHN05", "model_ECM_Schneider05")):
        M, f, codons = parse_model(extract_string_var(var))
        out[f"{key}_exch"] = M
        out[f"{key}_freqs"] = f
        out[f"{key}_codons"] = np.asarray(codons)
        print(key, M.shape, "freq sum", f.sum(), codons[:3])
    np.savez_compressed(OUT, **out)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
