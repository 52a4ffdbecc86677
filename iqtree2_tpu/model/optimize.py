"""Model-parameter optimization: alternate branch-length optimization with
substitution/rate parameter fitting until the logL gain drops below epsilon.

Reference analog: ModelFactory::optimizeParameters
(model/modelfactory.cpp:1329) — the outer loop alternates
tree->optimizeAllBranches with optimizeParametersOnly (:1054); here the
model/rate parameters are fitted by bounded L-BFGS-B on the host with each
objective evaluation being one jitted device logL call on the fixed topology.
"""

from __future__ import annotations

import numpy as np

from iqtree2_tpu.engine import LikelihoodEngine
from iqtree2_tpu.tree.schedule import build_schedule
from iqtree2_tpu.tree.topology import Tree
from iqtree2_tpu.utils.optimize import brent_minimize, lbfgsb_minimize

DEFAULT_MODEL_EPS = 0.01  # reference: modelEps (utils/tools.cpp:1313)


def optimize_model_parameters(eng: LikelihoodEngine, tree: Tree,
                              fix_model: bool = False,
                              fix_rates: bool = False,
                              epsilon: float = DEFAULT_MODEL_EPS,
                              max_rounds: int = 100,
                              blen_rounds: int = 8,
                              verbose: bool = False,
                              screen_iters: int | None = None) -> float:
    """Optimize (model params, rate params, branch lengths) jointly in place.

    Returns the final log-likelihood.
    """
    # fast path: one-dispatch joint device fit with exact gradients
    # (float64 whenever x64 is enabled — closes the float32 stall of the
    # finite-difference host loop below; see model/jaxfit.py)
    from iqtree2_tpu.model import jaxfit
    fitted = jaxfit.try_fit(eng, tree, fix_model=fix_model,
                            fix_rates=fix_rates, epsilon=epsilon,
                            max_iters=screen_iters)
    if fitted is not None:
        if verbose:
            print(f"  [model-opt] device L-BFGS fit: logL {fitted:.4f}")
        return fitted

    model, rates = eng.model, eng.rates
    logL = eng.optimize_branches(tree, n_rounds=blen_rounds)
    for rnd in range(max_rounds):
        prev = logL

        # ---- substitution + rate parameters via bounded L-BFGS-B ---------
        x_model = model.get_params() if not fix_model else np.zeros(0)
        x_rates = rates.get_params() if not fix_rates else np.zeros(0)
        nm = len(x_model)
        x0 = np.concatenate([x_model, x_rates])
        if len(x0):
            sched = build_schedule(tree)
            lo_m, hi_m = (model.param_bounds() if nm else
                          (np.zeros(0), np.zeros(0)))
            lo_r, hi_r = (rates.param_bounds() if len(x_rates) else
                          (np.zeros(0), np.zeros(0)))
            lo = np.concatenate([lo_m, lo_r])
            hi = np.concatenate([hi_m, hi_r])

            def obj(x):
                if nm:
                    model.set_params(x[:nm])
                if len(x) > nm:
                    rates.set_params(x[nm:])
                eng.refresh_model()
                return -eng.loglik_sched(sched)

            x_best, neg = lbfgsb_minimize(obj, np.clip(x0, lo, hi), lo, hi)
            # ensure the best point is applied
            obj(x_best)
            logL = -neg

        # ---- branch lengths ---------------------------------------------
        logL = eng.optimize_branches(tree, n_rounds=blen_rounds)
        if verbose:
            print(f"  [model-opt] round {rnd + 1}: logL {logL:.4f}")
        if logL - prev < epsilon:
            break
    return logL


def optimize_rate_scalar(eng: LikelihoodEngine, tree: Tree, getter, setter,
                         lo: float, hi: float) -> float:
    """Brent 1-D on a single rate parameter (e.g. alpha or p_invar).

    Reference analog: RateGamma::optimizeParameters via Brent
    (utils/optimization.cpp:322)."""
    sched = build_schedule(tree)

    def obj(v):
        setter(float(v))
        eng.refresh_model()
        return -eng.loglik_sched(sched)

    x, fx = brent_minimize(obj, lo, hi, guess=getter())
    setter(float(x))
    eng.refresh_model()
    return -fx
