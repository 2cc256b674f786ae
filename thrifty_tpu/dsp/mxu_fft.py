"""MXU-resident FFT: Bailey four-step / DFT-matrix transforms as matmuls.

XLA lowers `jnp.fft` on TPU to butterfly passes on the vector units;
the systolic array (MXU) -- where the chip's FLOPs live -- sits idle.
Reformulating the FFT as matrix products moves it onto the MXU:

- n <= ``_DFT_MAX``: one dense DFT matrix product, out = x @ F with
  F[j, k] = W_n^{jk}.
- larger n divisible by 128 (Bailey's four-step, n = n1 * n2):
  view x as [n1, n2] row-major, transform columns with F_{n1}, apply
  twiddles W_n^{k1 n2}, transform rows with F_{n2}, and read the
  result transposed -- two batched [128 x 128]-class matmuls + one
  elementwise twiddle instead of log2(n) butterfly passes.

Measured on TPU v5e (round 4, scan-slope timing, [256, 16384] c64):
jnp.fft 0.34-0.38 ms, four-step at Precision.HIGHEST 0.19-0.23 ms --
**1.7x faster at f32-grade accuracy** (max relative error 3.5e-7 vs
jnp.fft; Precision.DEFAULT would be 4x faster still but its bf16
passes cost 5e-3 relative error -- too lossy for sub-sample SoA).

``fft``/``ifft`` dispatch per ``impl``:
  'auto'   -- matmul path on TPU backends, jnp.fft elsewhere (CPU
              tests and goldens keep bit-exact jnp/numpy numerics);
  'matmul' -- force the matmul path (falls back to jnp.fft only when
              n has no supported factorization);
  'xla'    -- force jnp.fft.

The transform constants are numpy complex64 embedded at trace time
(same convention as the detector's template FFTs).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Largest n handled by a single dense DFT matrix.  At 2048 the matrix
# is 32 MB complex64 -- fine as a trace-time constant, and small
# blocks only appear in tests/tiny geometries anyway.
_DFT_MAX = 2048
_PRECISION = lax.Precision.HIGHEST


@functools.lru_cache(maxsize=32)
def _dft_matrix(n, inverse):
    sgn = 2j if inverse else -2j
    k = np.arange(n)
    return np.exp(sgn * np.pi * np.outer(k, k) / n).astype(np.complex64)


@functools.lru_cache(maxsize=32)
def _four_step_consts(n1, n2, inverse):
    n = n1 * n2
    sgn = 2j if inverse else -2j
    f1 = np.exp(sgn * np.pi * np.outer(np.arange(n1), np.arange(n1))
                / n1).astype(np.complex64)
    f2 = np.exp(sgn * np.pi * np.outer(np.arange(n2), np.arange(n2))
                / n2).astype(np.complex64)
    tw = np.exp(sgn * np.pi * np.outer(np.arange(n1), np.arange(n2))
                / n).astype(np.complex64)
    return f1, f2, tw


def _split(n):
    """(n1, n2) four-step factorization, or None.

    n1 = 128 keeps the column transform a full-width MXU matmul; n2 is
    whatever remains (itself a single [n2, n2] DFT product, so n2 is
    capped like the dense path).
    """
    if n % 128 == 0 and 128 <= n // 128 <= _DFT_MAX:
        return 128, n // 128
    return None


def _transform(x, inverse, impl):
    if impl not in ("auto", "matmul", "xla"):
        raise ValueError("unknown fft impl {!r}: expected 'auto', "
                         "'matmul' or 'xla'".format(impl))
    use_matmul = (impl == "matmul"
                  or (impl == "auto"
                      and jax.default_backend() not in ("cpu",)))
    n = x.shape[-1]
    if use_matmul:
        if n <= _DFT_MAX:
            f = jnp.asarray(_dft_matrix(n, inverse))
            out = jnp.matmul(x, f, precision=_PRECISION)
            return out / n if inverse else out
        split = _split(n)
        if split is not None:
            n1, n2 = split
            f1, f2, tw = (jnp.asarray(c) for c in
                          _four_step_consts(n1, n2, inverse))
            lead = x.shape[:-1]
            a = x.reshape((-1, n1, n2))
            b = jnp.einsum("ij,bjk->bik", f1, a,
                           precision=_PRECISION)
            d = jnp.einsum("bik,kj->bij", b * tw, f2,
                           precision=_PRECISION)
            out = d.transpose(0, 2, 1).reshape(lead + (n,))
            return out / n if inverse else out
        # No supported factorization: matmul would need a dense
        # [n, n] constant beyond _DFT_MAX -- fall back.
    return jnp.fft.ifft(x) if inverse else jnp.fft.fft(x)


def fft(x, impl="auto"):
    """Batched FFT along the last axis (see module docstring)."""
    return _transform(x, False, impl)


def ifft(x, impl="auto"):
    """Batched inverse FFT along the last axis."""
    return _transform(x, True, impl)
