"""Model-string parser: "GTR+F+I+G4" -> (SubstModel, RateModel).

Reference analog: ModelFactory (model/modelfactory.cpp:151) which parses the
model specification into substitution-model + rate-heterogeneity objects.
Supported grammar (subset growing toward full reference coverage):

  NAME[{p1,p2,...}] [+F|+FO|+FQ|+FC|+FU{...}|+FEQ] [+I[{p}]] [+G[n][{a}]]
       [+R[n][{r1,w1,...}]] [+E]  and MIX{m1,...}
"""

from __future__ import annotations

import re

import numpy as np

from iqtree2_tpu.data.alignment import Alignment
from iqtree2_tpu.model import dna, protein
from iqtree2_tpu.model.rates import (RateFree, RateFreeInvar, RateGamma,
                                     RateGammaInvar, RateInvar, RateModel)
from iqtree2_tpu.model.subst import GTRModel, SubstModel


class ModelSpec:
    def __init__(self, base: str, base_params, freq_type, freq_params,
                 rate_terms, other_terms=None):
        self.base = base
        self.base_params = base_params
        self.freq_type = freq_type
        self.freq_params = freq_params
        self.rate_terms = rate_terms  # list of (kind, ncat, params)
        self.other_terms = other_terms or []  # e.g. mixture suffixes +C20


_TERM_RE = re.compile(r"\+([A-Za-z]+)(\d*)(\{[^}]*\})?")


def parse_model_string(s: str) -> ModelSpec:
    s = s.strip()
    # base name with optional {params}
    m = re.match(r"^([A-Za-z0-9._]+)(\{[^}]*\})?", s)
    if not m:
        raise ValueError(f"cannot parse model string {s!r}")
    base = m.group(1)
    base_params = _parse_braces(m.group(2))
    rest = s[m.end():]

    freq_type = None
    freq_params = None
    rate_terms: list[tuple[str, int, list[float]]] = []
    other_terms: list[str] = []
    for t in _TERM_RE.finditer(rest):
        kind = t.group(1).upper()
        num = int(t.group(2)) if t.group(2) else None
        params = _parse_braces(t.group(3))
        full = f"{kind}{t.group(2) or ''}"
        if full in ("C10", "C20", "C30", "C40", "C50", "C60", "CF4",
                    "EX2", "EX3", "EHO", "UL2", "UL3", "EX_EHO",
                    "LG4M", "LG4X"):
            other_terms.append(full)
            continue
        if kind == "F" and num in (1, 3):
            freq_type = f"F{num}X4"   # codon positional frequencies
        elif kind in ("F", "FO", "FQ", "FEQ", "FU", "FC"):
            freq_type = {"F": "empirical", "FO": "estimate", "FQ": "equal",
                         "FEQ": "equal", "FU": "user",
                         "FC": "empirical"}[kind]
            freq_params = params
        elif kind == "I":
            rate_terms.append(("I", 1, params))
        elif kind == "G":
            rate_terms.append(("G", num or 4, params))
        elif kind == "R":
            rate_terms.append(("R", num or 4, params))
        elif kind in ("E", "EA", "EC", "EG", "ET"):
            rate_terms.append((kind, 1, params))  # sequencing error
        elif kind == "ASC":
            rate_terms.append(("ASC", 1, params))
        elif kind == "H":
            rate_terms.append(("H", num or 4, params))
        elif kind == "T":
            rate_terms.append(("T", num or 0, params))  # tree mixture
        elif kind == "P":
            rate_terms.append(("P", num or 9, params))  # PoMo
        else:
            raise ValueError(f"unsupported model term +{kind} in {s!r}")
    return ModelSpec(base, base_params, freq_type, freq_params, rate_terms,
                     other_terms)


def _parse_braces(s: str | None) -> list[float] | None:
    if not s:
        return None
    inner = s.strip()[1:-1]
    if not inner:
        return []
    return [float(x) for x in inner.split(",")]


MIXTURE_NAMES = {"C10", "C20", "C30", "C40", "C50", "C60", "EX2", "EX3",
                 "EHO", "UL2", "UL3", "EX_EHO", "LG4M", "LG4X", "LG4",
                 "CF4", "C10OPT", "C20OPT"}


def build_model(spec_str: str, aln: Alignment) -> tuple[SubstModel, RateModel,
                                                        dict]:
    """Instantiate model + rates for an alignment. Returns (model, rates,
    extras) where extras carries +ASC / +E flags."""
    s = spec_str.strip()
    # generic mixture MIX{m1,m2,...}[+rate terms]
    if s.upper().startswith("MIX{"):
        from iqtree2_tpu.model.mixture import make_generic_mix
        depth = 0
        for i, ch in enumerate(s):
            depth += ch == "{"
            depth -= ch == "}"
            if depth == 0 and ch == "}":
                break
        comps = _split_top_level(s[4:i])
        model = make_generic_mix(comps, aln)
        extras = {}
        rates = _build_rates(parse_model_string("JC" + s[i + 1:]), extras)
        return model, rates, extras

    spec = parse_model_string(spec_str)
    st = aln.seqtype.name
    extras: dict = {}

    # named protein mixtures (C10..C60, LG4M, LG4X, EX2, ...) and
    # base+profile combinations like LG+C20[+G...]
    base_up = spec.base.upper()
    if base_up in MIXTURE_NAMES or spec.other_terms:
        return _build_mixture_model(spec, aln, extras)

    # user-defined YAML models (--mdef; phylo-yaml analog)
    from iqtree2_tpu.io import yamlmodels
    if base_up in yamlmodels.MODELS:
        model = yamlmodels.make_yaml_model(base_up, aln)
        rates = _build_rates(spec, extras)
        return model, rates, extras

    # codon models
    if st.startswith("CODON") or base_up in ("GY", "MG", "MGK", "GY1KTS",
                                             "GY1KTV", "GY2K"):
        from iqtree2_tpu.model.codon import make_codon_model
        model = make_codon_model(spec, aln)
        rates = _build_rates(spec, extras)
        return model, rates, extras

    # ---------------- substitution model
    base_upper = spec.base.upper()
    freqs = None
    freq_type = spec.freq_type
    if freq_type == "user" and spec.freq_params:
        freqs = np.asarray(spec.freq_params, dtype=np.float64)
        freqs = freqs / freqs.sum()
    elif freq_type == "empirical" and spec.freq_params:
        # "+F{...}" with explicit values behaves like user frequencies
        freqs = np.asarray(spec.freq_params, dtype=np.float64)
        freqs = freqs / freqs.sum()
        freq_type = "user"
    elif freq_type == "empirical":
        freqs = aln.state_frequencies()

    if base_upper in ("UNREST", "NONREV"):
        from iqtree2_tpu.model.nonrev import UnrestModel
        model = UnrestModel(aln.num_states,
                            rates=(np.asarray(spec.base_params)
                                   if spec.base_params else None))
        rates = _build_rates(spec, extras)
        return model, rates, extras
    if st == "DNA":
        from iqtree2_tpu.model.liemarkov import (LieMarkovModel,
                                                 is_lie_markov_name)
        if is_lie_markov_name(spec.base) and not \
                dna.is_dna_model_name(base_upper):
            model = LieMarkovModel(spec.base, params=spec.base_params)
            rates = _build_rates(spec, extras)
            return model, rates, extras
    if st == "DNA" and dna.is_dna_model_name(base_upper):
        # DNA named model; default '+F'-less behavior: counted frequencies
        # for F81/HKY-class models is 'empirical' per reference defaults
        canonical, code, def_freq = dna.DNA_MODELS.get(
            base_upper, (spec.base, base_upper, "estimate"))
        ft = freq_type or def_freq
        if ft == "empirical" and freqs is None:
            freqs = aln.state_frequencies()
        if ft == "estimate" and freqs is None:
            freqs = aln.state_frequencies()  # starting point for estimation
        model = dna.make_dna_model(base_upper, freqs=freqs, freq_type=ft)
        if spec.base_params:
            model.set_rate_params(np.asarray(spec.base_params))
            model.fixed_rates = True
    elif st == "AA" and protein.is_protein_model_name(base_upper):
        model = protein.make_protein_model(
            spec.base, freqs=freqs, freq_type=freq_type)
    elif base_upper in ("MK", "JC2", "ORDERED") or st in ("BIN",) or \
            st.startswith("MORPH"):
        S = aln.num_states
        model = GTRModel(S, freq_type=freq_type or "equal",
                         freqs=freqs if freqs is not None
                         else np.full(S, 1.0 / S),
                         name=base_upper, fixed_rates=True)
        if base_upper == "ORDERED":
            # ordered states: only adjacent transitions
            iu = np.triu_indices(S, 1)
            model.exch_rates = np.where(
                iu[1] - iu[0] == 1, 1.0, 0.0).astype(np.float64)
    elif base_upper == "GTR20":
        model = protein.make_protein_model("GTR20", freq_type=freq_type)
    else:
        raise ValueError(
            f"model {spec.base!r} not supported for seqtype {st}")

    model = _maybe_wrap_seqerror(model, spec, extras, st)
    model = _maybe_pomo(model, spec, extras, st, aln)
    rates = _build_rates(spec, extras)
    return model, rates, extras


def _maybe_pomo(model, spec, extras: dict, st: str, aln):
    """+P{N}: replace the DNA model with the polymorphism-aware PoMo
    state space built on its mutation parameters (model/modelpomo.h:40)."""
    for kind, n, p in spec.rate_terms:
        if kind != "P":
            continue
        if st != "DNA":
            raise ValueError("PoMo (+P) requires DNA data")
        from iqtree2_tpu.model.pomo import PoMoModel
        exch = getattr(model, "exch_rates", None)
        freqs = aln.state_frequencies()
        N = n or 9
        extras["pomo"] = N
        theta = p[0] if p else 0.01
        return PoMoModel(N=N, exch=exch, freqs=freqs, theta=theta,
                         fix_theta=bool(p))
    return model


def _maybe_wrap_seqerror(model, spec, extras: dict, st: str):
    """+E/+EA/+EC/+EG/+ET: wrap a DNA model with the sequencing-error tip
    transform (model/modeldnaerror.cpp)."""
    for kind, _, p in spec.rate_terms:
        if kind in ("E", "EA", "EC", "EG", "ET"):
            if st != "DNA":
                raise ValueError("+E sequencing error requires DNA data")
            from iqtree2_tpu.model.seqerror import DNAErrorModel
            base = -1 if kind == "E" else "ACGT".index(kind[1])
            eps = p[0] if p else 0.05
            extras["seqerr"] = kind
            return DNAErrorModel(model, epsilon=eps, fix_epsilon=bool(p),
                                 error_base=base)
    return model


def _build_rates(spec: ModelSpec, extras: dict) -> RateModel:
    """Rate-heterogeneity object from the +I/+G/+R/+ASC terms."""
    kinds = {k for (k, _, _) in spec.rate_terms}
    if "ASC" in kinds:
        extras["asc"] = True
    get = {k: (n, p) for (k, n, p) in spec.rate_terms}
    if "T" in kinds:
        # +T: tree-mixture model (IQTreeMix, tree/iqtreemix.h:21) — trees
        # supplied separately; weights optionally pinned by +T{w1,...}
        extras["treemix"] = True
        extras["treemix_weights"] = get["T"][1] or None
        kinds.discard("T")

    # "+X{v}" brace parameters FIX the value (reference semantics: the model
    # string grammar of ModelFactory, model/modelfactory.cpp:151); the fix
    # flags live on the rate objects so every optimizer path honors them.
    if "H" in kinds:
        # +H{k}: heterotachy (GHOST) — k classes with their own branch
        # lengths; weights EM-optimized (tree/phylotreemixlen.cpp)
        if kinds - {"H"}:
            raise ValueError("+H cannot be combined with other rate terms")
        from iqtree2_tpu.model.heterotachy import RateHeterotachy
        n, p = get["H"]
        extras["mixlen"] = n
        return RateHeterotachy(n, weights=p or None)

    p_inv = 0.0
    fix_pinv = False
    if "I" in kinds:
        n, p = get["I"]
        p_inv = p[0] if p else 0.1
        fix_pinv = bool(p)
        extras["fix_pinv"] = fix_pinv
    if "G" in kinds:
        n, p = get["G"]
        alpha = p[0] if p else 1.0
        fix_alpha = bool(p)
        extras["fix_alpha"] = fix_alpha
        if "I" in kinds:
            return RateGammaInvar(n, alpha=alpha, p_invar=p_inv,
                                  fix_alpha=fix_alpha, fix_pinv=fix_pinv)
        return RateGamma(n, alpha=alpha, fix_alpha=fix_alpha)
    if "R" in kinds:
        n, p = get["R"]
        rr = ww = None
        fix_fr = False
        if p:
            ww = np.asarray(p[0::2])
            rr = np.asarray(p[1::2])
            fix_fr = True
            extras["fix_free_rates"] = True
        if "I" in kinds:
            return RateFreeInvar(n, p_invar=p_inv, rates=rr, weights=ww,
                                 fix_rates=fix_fr, fix_pinv=fix_pinv)
        return RateFree(n, rates=rr, weights=ww, fix_rates=fix_fr)
    if "I" in kinds:
        return RateInvar(p_inv, fix_pinv=fix_pinv)
    return RateModel()


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside braces."""
    out, cur, depth = [], [], 0
    for ch in s:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _build_mixture_model(spec: ModelSpec, aln: Alignment, extras: dict):
    """Named mixture models: bare (C20, EX2, LG4X, ...) or base+profile
    (LG+C20, WAG+C60, ...). Reference analog: ModelMixture built-ins
    (model/modelmixture.cpp)."""
    from iqtree2_tpu.model.mixture import make_mixture
    base_up = spec.base.upper()
    if base_up in MIXTURE_NAMES:
        model = make_mixture(base_up, aln=aln)
    else:
        # base matrix + profile mixture, e.g. LG+C20
        prof = spec.other_terms[0]
        base_model = protein.make_protein_model(spec.base)
        model = make_mixture(prof, aln=aln,
                             base_exch=base_model.exch_rates)
        model.name = f"{base_model.name}+{prof}"
    rates = _build_rates(spec, extras)
    # the published C10..C60/CF4 definitions are POISSON+G+FMIX{...}: bare
    # profile-mixture names imply discrete-gamma rates
    prof_name = (base_up if base_up in MIXTURE_NAMES
                 else spec.other_terms[0].upper())
    if not spec.rate_terms and prof_name.startswith(("C1", "C2", "C3",
                                                     "C4", "C5", "C6",
                                                     "CF")):
        rates = RateGamma(4, alpha=1.0)
    if model.fused_rates:
        # LG4M/*G4 or LG4X/*R4: force a matching 4-category rate model
        M = len(model.components)
        has_rate = len(rates.category_rates()) == M
        if not has_rate:
            rates = (RateFree(M) if model.name.upper().startswith("LG4X")
                     else RateGamma(M, alpha=1.0))
    return model, rates, extras
