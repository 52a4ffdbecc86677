"""Matmul precision policy for the TPU likelihood kernels.

On TPU an f32 matmul runs on the bf16 MXU: HIGHEST = 6 passes (full f32
fidelity), DEFAULT = 1 pass (raw bf16).  Mosaic does not lower
Precision.HIGH, so the kernels implement the 3-pass bf16x3 scheme
manually ("x3"): operators are split hi/lo into two bf16 arrays at
build time, the streamed partial is split in-kernel, and the product is
hi@hi + hi@lo + lo@hi with f32 accumulation (error ~2^-17 per op vs
2^-8 for raw bf16).  Tip partials are 0/1 ambiguity codes — EXACT in
bf16 — so tip-side messages need only 2 passes (op_hi@tip + op_lo@tip).

Measured on a v5e (tools/exp_precision.py, work-conservation timing):
raw bf16 is 3.3-3.6x faster than HIGHEST end-to-end but drifts ~1e-2
logL per site; x3 keeps ~f32 accuracy at ~2x.

Select with IQTREE2_TPU_MM_PRECISION=highest|high|default ("high" =
x3).  The reference kernel runs full f64/f32 SIMD
(tree/phylokernelnew.h:896) — precision selection is a TPU-specific
design point with no reference analog.
"""

from __future__ import annotations

import os

import jax

# mode names: "f32" (Precision.HIGHEST), "x3" (manual bf16x3),
# "bf16" (Precision.DEFAULT)
_MAP = {"highest": "f32", "high": "x3", "default": "bf16",
        "f32": "f32", "x3": "x3", "bf16": "bf16"}


def _from_env() -> str:
    name = os.environ.get("IQTREE2_TPU_MM_PRECISION", "high").lower()
    return _MAP.get(name, "x3")


MM_MODE = _from_env()


def dot_precision(mode: str):
    """jax precision for the single-dot modes (f32 / bf16)."""
    return (jax.lax.Precision.HIGHEST if mode == "f32"
            else jax.lax.Precision.DEFAULT)


def set_precision(name: str) -> None:
    """Override the kernel matmul precision (clears kernel jit caches)."""
    global MM_MODE
    MM_MODE = _MAP[name.lower()]
    from iqtree2_tpu.ops import pallas_pruning, pallas_pruning2
    pallas_pruning2.MODE = MM_MODE
    pallas_pruning.MODE = MM_MODE
    for f in (pallas_pruning2.stream_pass, pallas_pruning2.stream_up_pass,
              pallas_pruning2.stream_theta_pass,
              pallas_pruning.down_sitelp_pallas,
              pallas_pruning.down_pass_pallas,
              pallas_pruning.up_pass_pallas):
        f.clear_cache()


# ---------------------------------------------------------------- helpers
def split_hilo(x, mode: str):
    """Operator array -> [2, ...] bf16 hi/lo stack (x3), [1, ...] bf16
    (bf16) or [1, ...] f32 (f32).  The leading axis keeps kernel
    BlockSpecs uniform across modes.

    The hi half is produced by MASKING the low 16 mantissa bits (a bf16
    TRUNCATION) rather than jnp-casting: XLA's excess-precision
    simplification folds the naive ``x - f32(bf16(x))`` to ZERO under
    jit (verified on v5e), which silently degrades x3 to raw-bf16
    operator precision.  With the masked hi, ``x = hi + lo`` holds
    exactly before lo's own bf16 rounding (error <= 2^-17 |x|)."""
    import numpy as np
    import jax.numpy as jnp
    if mode == "x3":
        xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hi_f = jax.lax.bitcast_convert_type(
            xi & np.uint32(0xFFFF0000), jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            (xi >> 16).astype(jnp.uint16), jnp.bfloat16)
        lo = (x - hi_f).astype(jnp.bfloat16)
        return jnp.stack([hi, lo])
    if mode == "bf16":
        return x.astype(jnp.bfloat16)[None]
    return x[None]


def tip_dtype(mode: str):
    """Tip streams are 0/1 codes — exact in bf16."""
    import jax.numpy as jnp
    return jnp.float32 if mode == "f32" else jnp.bfloat16


import jax.numpy as jnp  # noqa: E402


def _split_x(x, mode):
    """(hi, lo) bf16 split of an f32 operand for x3 mode; lo is None when
    no split is needed (non-x3 modes, or an operand already exact in
    bf16 — the 0/1 tip streams).  Uses the mantissa-masking split (see
    split_hilo) so neither XLA nor Mosaic can fold the lo term away."""
    import numpy as np
    if mode != "x3" or x.dtype == jnp.bfloat16:
        return (x, None)
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(
        xi & np.uint32(0xFFFF0000), jnp.float32)
    xh = hi_f.astype(jnp.bfloat16)            # exact: already truncated
    xl = (x - hi_f).astype(jnp.bfloat16)      # exact sub, one rounding
    return (xh, xl)


def _mm2(op, xs, mode, transpose=False):
    """Matmul of a hi/lo-stacked operator [K, R, M] with a pre-split
    operand pair.  f32: one HIGHEST dot; bf16: one DEFAULT dot; x3: the
    manual bf16x3 scheme hi@xh + hi@xl + lo@xh with f32 accumulation
    (2 dots when the operand is exact in bf16)."""
    kw = dict(preferred_element_type=jnp.float32,
              precision=dot_precision(mode))
    o0 = op[0].T if transpose else op[0]
    xh, xl = xs
    if mode != "x3":
        return jnp.dot(o0, xh, **kw)
    o1 = op[1].T if transpose else op[1]
    if xl is None:
        return jnp.dot(o0, xh, **kw) + jnp.dot(o1, xh, **kw)
    return (jnp.dot(o0, xh, **kw) + jnp.dot(o0, xl, **kw)
            + jnp.dot(o1, xh, **kw))


def _mm(op, x, mode):
    return _mm2(op, _split_x(x, mode), mode)
