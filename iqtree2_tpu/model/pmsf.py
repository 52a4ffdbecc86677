"""PMSF: posterior mean site frequency two-pass approximation for profile
mixture models (reference: computeSiteFrequencyModel,
main/phyloanalysis.cpp:3744; Wang et al. 2018).

Pass 1: fit the full mixture model (e.g. LG+C20+F+G) on a guide tree and
compute, per site pattern, the posterior mixture-class weights; the PMSF
profile is the posterior-mean of the class frequency vectors.
Pass 2: replace the mixture with a site-specific-frequency model (one
reversible Q per pattern, shared exchangeabilities) — the ops/sitespecific
engine — and re-optimize branch lengths (+ alpha). 10-50x cheaper per
likelihood than the full mixture while closely tracking its fit.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from iqtree2_tpu.ops import sitespecific as ssf
from iqtree2_tpu.ops import pruning
from iqtree2_tpu.tree.schedule import build_schedule, write_blens_to_tree


def _exch_full(exch, S: int) -> np.ndarray:
    """Full symmetric exchangeability matrix from either a full matrix or
    a row-major upper-triangle vector (the mixture component storage)."""
    exch = np.asarray(exch, dtype=np.float64)
    if exch.ndim == 2:
        return exch
    M = np.zeros((S, S))
    M[np.triu_indices(S, 1)] = exch
    return M + M.T


def site_frequency_profile(eng, tree) -> np.ndarray:
    """Posterior-mean site frequencies [num_patterns, S] from a fitted
    mixture engine on a guide tree (PMSF pass 1)."""
    _, cat_post = eng.site_rate_posterior(tree)        # [C, P]
    pk = eng.pack_np
    cat_mix = np.asarray(pk.cat_mix)
    M = int(cat_mix.max()) + 1
    class_post = np.zeros((M, cat_post.shape[1]))
    for c in range(cat_post.shape[0]):
        class_post[cat_mix[c]] += cat_post[c]
    class_post /= np.maximum(class_post.sum(0, keepdims=True), 1e-30)
    class_freqs = np.stack([comp[1] for comp in eng.model.components])
    prof = class_post.T @ class_freqs                  # [P, S]
    return prof / prof.sum(1, keepdims=True)


class SSFEngine:
    """Fixed-topology engine over a site-specific-frequency model.

    Covers PMSF pass 2 and the reference's ModelSet/site-specific models
    (tree/phylokernelsitemodel.h)."""

    def __init__(self, aln, exch: np.ndarray, site_freqs: np.ndarray,
                 rates, dtype=jnp.float32, pattern_pad: int = 128,
                 min_freq: float = 1e-4):
        self.aln = aln
        self.exch = exch
        self.rates = rates
        self.dtype = jnp.dtype(dtype)
        P = aln.num_patterns
        self.Pp = -(-max(P, 1) // pattern_pad) * pattern_pad
        pad = self.Pp - P
        # pad patterns with uniform frequencies
        S = aln.num_states
        sf = np.concatenate(
            [site_freqs, np.full((pad, S), 1.0 / S)], axis=0)
        self.site_freqs = sf
        lam, U, V, f = ssf.build_ssf_eigensystems(
            exch, sf, min_freq=min_freq)
        self._lam, self._U, self._V, self._f = lam, U, V, f

        codes = aln.tip_codes()
        unk = aln.seqtype.unknown_code
        codes = np.pad(codes, ((0, 0), (0, pad)), constant_values=unk)
        tip_table = np.asarray(aln.seqtype.tip_table)
        tipP = tip_table[codes].transpose(0, 2, 1)     # [L, S, Pp]
        self._dev_tipP = jnp.asarray(tipP, self.dtype)
        self._dev_pw = jnp.asarray(
            np.pad(aln.pattern_weights.astype(np.float64), (0, pad)),
            self.dtype)
        self.refresh_rates()

    def refresh_rates(self) -> None:
        d = self.dtype
        r = self.rates.category_rates()
        w = self.rates.category_weights()
        p_inv = self.rates.p_invar
        P = self.aln.num_patterns
        if p_inv > 0:
            const_mask = self.aln.const_state_mask()
            inv = p_inv * np.einsum("ps,ps->p", const_mask,
                                    self._f[:P])
            with np.errstate(divide="ignore"):
                log_inv = np.log(np.maximum(inv, 0.0))
        else:
            log_inv = np.full(P, -np.inf)
        log_inv = np.pad(log_inv, (0, self.Pp - P),
                         constant_values=-np.inf)
        self.pack = ssf.SSFPack(
            lam=jnp.asarray(self._lam, d), U=jnp.asarray(self._U, d),
            V=jnp.asarray(self._V, d), freqs=jnp.asarray(self._f, d),
            cat_rate=jnp.asarray(r, d), cat_weight=jnp.asarray(w, d),
            log_ptn_invar=jnp.asarray(log_inv, d))

    # ------------------------------------------------------------- API
    def schedule_arrays(self, sched) -> dict:
        return {k: jnp.asarray(v) for k, v in
                sched.to_device_arrays().items()}

    def loglik_tree(self, tree) -> float:
        sched = build_schedule(tree)
        logL, _ = _ssf_loglik_jit(
            jnp.asarray(sched.blens, self.dtype), self._dev_tipP,
            self.schedule_arrays(sched), self.pack, self._dev_pw)
        return float(logL)

    def site_lp(self, tree):
        sched = build_schedule(tree)
        logL, lp = _ssf_loglik_jit(
            jnp.asarray(sched.blens, self.dtype), self._dev_tipP,
            self.schedule_arrays(sched), self.pack, self._dev_pw)
        return float(logL), np.asarray(lp)[: self.aln.num_patterns]

    def optimize_branches(self, tree, n_rounds: int = 10,
                          n_newton: int = 4, t_min: float = 1e-6,
                          t_max: float = 10.0) -> float:
        sched = build_schedule(tree)
        blens = jnp.asarray(np.maximum(sched.blens, t_min), self.dtype)
        new_blens, logL = _ssf_optimize_blens_jit(
            blens, self._dev_tipP, self.schedule_arrays(sched),
            self.pack, self._dev_pw, jnp.asarray(t_min, self.dtype),
            jnp.asarray(t_max, self.dtype), n_rounds, n_newton)
        write_blens_to_tree(tree, sched, np.asarray(new_blens, np.float64))
        return float(logL)

    def evaluate_nni_batch(self, sched, cand_arrays, t_min: float = 1e-6,
                           t_max: float = 10.0):
        """Batched NNI1 scoring (lets TreeSearch/nni_optimize run under
        the PMSF model — the reference also searches under PMSF)."""
        blens = jnp.asarray(sched.blens, self.dtype)
        sa = self.schedule_arrays(sched)
        logl, t_opt = _ssf_nni_jit(
            cand_arrays, blens, self._dev_tipP, sa, self.pack,
            self._dev_pw, jnp.asarray(t_min, self.dtype),
            jnp.asarray(t_max, self.dtype))
        return np.asarray(logl), np.asarray(t_opt)

    def optimize_alpha(self, tree, lo: float = 0.05, hi: float = 20.0
                       ) -> float:
        """Brent on the Gamma shape (pass-2 rate refit)."""
        from iqtree2_tpu.utils.optimize import brent_minimize
        sched = build_schedule(tree)
        sa = self.schedule_arrays(sched)
        blens = jnp.asarray(sched.blens, self.dtype)

        def obj(a):
            self.rates.alpha = float(a)
            self.refresh_rates()
            logL, _ = _ssf_loglik_jit(blens, self._dev_tipP, sa,
                                      self.pack, self._dev_pw)
            return -float(logL)

        a_best, _ = brent_minimize(obj, lo, hi)
        obj(a_best)
        return float(a_best)


@jax.jit
def _ssf_loglik_jit(blens, tipP, sched, pack, pw):
    return ssf.ssf_tree_loglik(blens, tipP, sched, pack, pw)


@jax.jit
def _ssf_nni_jit(cand_arrays, blens, tipP, sched, pack, pw, t_min, t_max):
    dp = ssf.ssf_down_pass(blens, tipP, sched, pack)
    up = ssf.ssf_up_pass(blens, dp, tipP, sched, pack)
    return ssf.ssf_evaluate_nnis(cand_arrays, blens, dp, up, sched, pack,
                                 pw, t_min, t_max)


import functools


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_newton"))
def _ssf_optimize_blens_jit(blens, tipP, sched, pack, pw, t_min, t_max,
                            n_rounds: int, n_newton: int):
    def lg(b):
        return ssf.ssf_tree_loglik(b, tipP, sched, pack, pw)[0]

    def one_round(carry, _):
        blens, logL_prev = carry
        dp = ssf.ssf_down_pass(blens, tipP, sched, pack)
        up = ssf.ssf_up_pass(blens, dp, tipP, sched, pack)
        th = ssf.ssf_edge_thetas(up, dp, sched["edge_src"], pack)
        newton = jax.vmap(
            lambda t_e, th_e, sc_e: ssf.ssf_newton_branch_step(
                th_e, sc_e, t_e, pack, pw, t_min, t_max, n_iter=n_newton))
        prop = jnp.clip(newton(blens, th.theta, th.scale), t_min, t_max)

        def body(state):
            cur, _, k = state
            cur = 0.5 * (cur + blens)
            return cur, lg(cur), k + 1

        def cond(state):
            # NaN-safe: a NaN logL must keep backtracking
            return jnp.logical_not(state[1] >= logL_prev - 1e-9) \
                & (state[2] < 4)

        l_prop = lg(prop)
        prop, l_new, _ = jax.lax.while_loop(
            cond, body, (prop, l_prop, jnp.zeros((), jnp.int32)))
        # monotonicity guarantee: if backtracking ran out, keep the old
        # lengths (reference contract: optimizeAllBranches never worsens)
        worse = jnp.logical_not(l_new >= logL_prev - 1e-9)
        prop = jnp.where(worse, blens, prop)
        l_new = jnp.where(worse, logL_prev, l_new)
        return (prop, l_new), l_new

    l0 = lg(blens)
    (blens, logL), _ = jax.lax.scan(one_round, (blens, l0), None,
                                    length=n_rounds)
    return blens, logL


def run_pmsf(aln, mixture_engine, guide_tree, log=print,
             blen_rounds: int = 10, dtype=jnp.float32):
    """Two-pass PMSF. Returns (SSFEngine, tree, logL, profile [P, S]).

    mixture_engine: a LikelihoodEngine over the profile mixture (pass-1
    model parameters already fitted on guide_tree by the caller)."""
    log("PMSF pass 1: posterior mean site frequencies from the mixture...")
    prof = site_frequency_profile(mixture_engine, guide_tree)
    exch = _exch_full(mixture_engine.model.components[0][0],
                      mixture_engine.aln.num_states)
    import copy
    rates = copy.deepcopy(mixture_engine.rates)
    log("PMSF pass 2: site-specific-frequency re-optimization...")
    eng2 = SSFEngine(aln, exch, prof, rates, dtype=dtype)
    tree = guide_tree.copy()
    logL = eng2.optimize_branches(tree, n_rounds=blen_rounds)
    if hasattr(rates, "alpha"):
        eng2.optimize_alpha(tree)
        logL = eng2.optimize_branches(tree, n_rounds=4)
    log(f"PMSF final logL: {logL:.4f}")
    return eng2, tree, logL, prof
