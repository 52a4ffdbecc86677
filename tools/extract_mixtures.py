#!/usr/bin/env python
"""Extract the published protein mixture-model DATA (profile frequency
vectors, component exchangeability matrices, mixture weights) from the
reference's built-in model-definition text (model/modelmixture.cpp — a NEXUS
'models' block embedded as a C string) into
iqtree2_tpu/model/data/mixture_models.npz + mixture_defs.json.

These are numeric constants from the primary literature (Le, Gascuel &
Lartillot 2008; Le, Dang & Gascuel 2012; Quang, Gascuel & Lartillot 2008) —
data, not code.
"""

import json
import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/model/modelmixture.cpp")
OUT_DIR = Path(__file__).parent.parent / "iqtree2_tpu" / "model" / "data"

text = SRC.read_text()
# strip NEXUS [...] comments
text = re.sub(r"\[[^\]]*\]", " ", text)

# ---- frequency vectors:  frequency NAME = f1 ... f20;
freqs = {}
for m in re.finditer(r"frequency\s+(\S+)\s*=\s*([0-9.eE+\-\s]+);", text):
    name = m.group(1)
    vals = np.fromstring(m.group(2), sep=" ")
    if len(vals) == 20:
        freqs[name] = vals

# ---- full component matrices: model NAME = <190 exch> <20 freqs>;
matrices = {}
mixdefs = {}
for m in re.finditer(r"model\s+(\S+)\s*=\s*([^;]+);", text):
    name, body = m.group(1), m.group(2).strip()
    if re.fullmatch(r"[0-9.eE+\-\s]+", body):
        vals = np.fromstring(body, sep=" ")
        if len(vals) == 210:  # 190 lower-triangle exch + 20 freqs
            matrices[name] = vals
        continue
    # mixture definitions: MIX{a:rate,...} or BASE+G+FMIX{pi:rate:w,...}
    mm = re.search(r"(?:([A-Za-z0-9.]+)\+)?(?:G\+)?"
                   r"(MIX|FMIX)\{([^}]*)\}(?:\*(G4|R4))?", body)
    if not mm:
        continue
    base = mm.group(1) or ""
    kind = mm.group(2)
    comps = []
    for item in mm.group(3).split(","):
        parts = item.strip().split(":")
        cname = parts[0]
        crate = float(parts[1]) if len(parts) > 1 and parts[1] else 1.0
        cw = float(parts[2]) if len(parts) > 2 else None
        comps.append({"name": cname, "rate": crate, "weight": cw})
    mixdefs[name] = {"base": base, "kind": kind, "components": comps,
                     "suffix": mm.group(4) or ""}

OUT_DIR.mkdir(exist_ok=True)
np.savez_compressed(
    OUT_DIR / "mixture_models.npz",
    **{f"freq_{k}": v for k, v in freqs.items()},
    **{f"matrix_{k}": v for k, v in matrices.items()})
(OUT_DIR / "mixture_defs.json").write_text(json.dumps(mixdefs, indent=1))
print(f"profiles: {len(freqs)}, matrices: {len(matrices)}, "
      f"mixture defs: {len(mixdefs)}")
print("defs:", ", ".join(sorted(mixdefs)))
