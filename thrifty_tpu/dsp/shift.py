"""Batched carrier removal (frequency shift).

Two modes, matching the reference's two numerical variants:

- ``fractional``: shift by a fractional number of bins using the shift
  theorem -- multiply the time-domain block by a phase ramp, then FFT
  (reference thrifty/carrier_sync.py:222-238).  Batched: one fused
  elementwise ramp multiply + one batched FFT.

- ``integer``: circular roll of the FFT by the integer peak bin
  (fastdet/corr_detector.cpp:13-17,178-182).  Batched as a gather --
  no second FFT, the fastest mode.
"""

from __future__ import annotations

import jax.numpy as jnp


def fractional_shift_fft(blocks, shift):
    """FFT of blocks shifted by a (fractional) number of bins.

    ``blocks``: [..., N] complex time-domain samples.
    ``shift``: [...] float, number of bins to shift by (positive moves
    energy to higher bins).  Uses ramp exp(2j*pi*shift*(n/N - 0.5)); the
    -0.5 term only contributes a constant phase and keeps parity with the
    reference formula.
    """
    n = blocks.shape[-1]
    pos = jnp.arange(n, dtype=jnp.float32) / n - 0.5
    phase = 2.0 * jnp.pi * shift[..., None] * pos
    ramp = jnp.exp(1j * phase).astype(blocks.dtype)
    return jnp.fft.fft(blocks * ramp)


def integer_roll_fft(fft, shift):
    """Batched circular roll of FFT arrays by per-element integer shifts.

    ``out[..., k] = fft[..., (k - shift) % N]`` -- same as np.roll along
    the last axis with a per-batch shift, implemented as a gather.
    """
    n = fft.shape[-1]
    k = jnp.arange(n, dtype=jnp.int32)
    idx = (k[None, ...] - shift[..., None]) % n
    return jnp.take_along_axis(fft, idx, axis=-1)
