"""Pallas TPU kernels for the detector's hot non-FFT ops.

The batched detector reads each [B, N] FFT/correlation array several
times (magnitude, windowed argmax, peak gather, energy sum, threshold).
:func:`fused_power_peak` does all of it in ONE pass over VMEM tiles:
per row it returns the windowed argmax of |x|^2, the peak power, and
the total power sum -- the exact inputs the carrier and correlation
threshold formulas need (peak_mag = sqrt(peak_power), noise from the
energy sum).  HBM traffic drops from ~4 passes over the array to 1.

TPU Pallas has no complex dtype; two layouts are implemented:

* ``interleaved`` (default): the complex64 array is bitcast in place
  to float32 [B, 2N] (re, im interleaved) -- ZERO extra HBM traffic on
  the way in.  In-kernel, power at even lanes is x^2 + roll(x^2, -1)
  and the window mask lives only on even lanes; the argmax is halved
  on the way out.
* ``planes``: separate jnp.real/jnp.imag float32 planes.  Simple, but
  materializing the planes costs an extra read+2x write pass over the
  array before the kernel runs (measured ~30% slower end-to-end on
  TPU v5e in round 1).

A jnp reference implementation is provided for CPU tests and as
numerical documentation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return (x + m - 1) // m * m


def fused_power_peak_reference(re, im, mask, stats_mask=None):
    """jnp reference: (windowed argmax of power, peak power, total power).

    With ``stats_mask`` ([N] bool: which samples count), two extra
    reductions are returned in the same pass -- the masked power sum
    and the masked MAGNITUDE sum, sufficient statistics for the
    reference's optional ``d*std(mag)^2`` threshold term
    (thrifty/carrier_detect.py:100-115 third coefficient)::

        var(mag) = stat_pow/m - (stat_mag/m)**2,  m = stats_mask.sum()
    """
    power = jnp.square(re) + jnp.square(im)
    masked = jnp.where(mask, power, -1.0)
    idx = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    peak = jnp.take_along_axis(power, idx[..., None], axis=-1)[..., 0]
    total = jnp.sum(power, axis=-1)
    if stats_mask is None:
        return idx, peak, total
    sm = jnp.asarray(stats_mask)
    stat_pow = jnp.sum(jnp.where(sm, power, 0.0), axis=-1)
    stat_mag = jnp.sum(jnp.where(sm, jnp.sqrt(power), 0.0), axis=-1)
    return idx, peak, total, stat_pow, stat_mag


def _merge_chunk(j, out_refs, local_arg, local_max, local_sum,
                 local_stats):
    """Cross-chunk reduction shared by both kernel layouts: initialize
    the output refs on the first chunk, then merge (argmax keeps the
    EARLIEST chunk on ties via strict >; sums accumulate)."""
    idx_ref, peak_ref, sum_ref = out_refs[:3]
    stats_refs = out_refs[3:]

    @pl.when(j == 0)
    def _():
        idx_ref[...] = local_arg[:, None]
        peak_ref[...] = local_max[:, None]
        sum_ref[...] = local_sum[:, None]
        for ref, local in zip(stats_refs, local_stats):
            ref[...] = local[:, None]

    @pl.when(j != 0)
    def _():
        better = local_max > peak_ref[..., 0]
        idx_ref[...] = jnp.where(better, local_arg, idx_ref[..., 0])[:, None]
        peak_ref[...] = jnp.where(
            better, local_max, peak_ref[..., 0])[:, None]
        sum_ref[...] = (sum_ref[..., 0] + local_sum)[:, None]
        for ref, local in zip(stats_refs, local_stats):
            ref[...] = (ref[..., 0] + local)[:, None]


def _kernel(*refs, chunk, want_stats):
    """Single-pass reduction over one row-tile of [TB, N]."""
    if want_stats:
        re_ref, im_ref, mask_ref, smask_ref = refs[:4]
        out_refs = refs[4:]
    else:
        re_ref, im_ref, mask_ref = refs[:3]
        out_refs = refs[3:]
    j = pl.program_id(1)

    re = re_ref[...]
    im = im_ref[...]
    power = re * re + im * im
    masked = jnp.where(mask_ref[...] != 0, power, -1.0)

    local_arg = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    local_max = jnp.max(masked, axis=-1)
    local_sum = jnp.sum(power, axis=-1)
    local_arg = local_arg + j * chunk
    local_stats = ()
    if want_stats:
        sm = smask_ref[...]
        local_stats = (jnp.sum(power * sm, axis=-1),
                       jnp.sum(jnp.sqrt(power) * sm, axis=-1))

    _merge_chunk(j, out_refs, local_arg, local_max, local_sum,
                 local_stats)


@functools.partial(jax.jit,
                   static_argnames=("row_tile", "chunk", "interpret"))
def _fused_call(re, im, mask_f32, smask_f32, row_tile, chunk,
                interpret=False):
    b, n = re.shape
    grid = (b // row_tile, n // chunk)
    want_stats = smask_f32 is not None

    data_spec = pl.BlockSpec(
        (row_tile, chunk), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (1, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (row_tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [data_spec, data_spec, mask_spec]
    inputs = [re, im, mask_f32]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    ]
    if want_stats:
        in_specs.append(mask_spec)
        inputs.append(smask_f32)
        out_shape += [jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 2

    outs = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk,
                          want_stats=want_stats),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return tuple(o[:, 0] for o in outs)


def _kernel_interleaved(*refs, chunk, want_stats):
    """Single-pass reduction over one [TB, chunk] tile of interleaved
    float32 (re, im) data.

    power_k sits at even lane 2k as y^2 + roll(y^2, -1); odd lanes hold
    garbage pair sums and are masked out (the mask is non-zero only on
    even lanes, so pairs never straddle the roll's chunk wrap).  With
    ``want_stats``, the stats mask (also even-lane-only) selects which
    complex samples contribute masked power / magnitude sums.
    """
    if want_stats:
        y_ref, mask_ref, smask_ref = refs[:3]
        out_refs = refs[3:]
    else:
        y_ref, mask_ref = refs[:2]
        out_refs = refs[2:]
    j = pl.program_id(1)

    y = y_ref[...]
    p = y * y
    q = p + pltpu.roll(p, shift=chunk - 1, axis=1)  # == roll(p, -1)
    masked = jnp.where(mask_ref[...] != 0, q, -1.0)

    local_arg = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    local_max = jnp.max(masked, axis=-1)
    local_sum = jnp.sum(p, axis=-1)  # re^2 + im^2 across the two lanes
    local_arg = local_arg + j * chunk
    local_stats = ()
    if want_stats:
        sm = smask_ref[...]
        local_stats = (jnp.sum(q * sm, axis=-1),
                       jnp.sum(jnp.sqrt(q) * sm, axis=-1))

    _merge_chunk(j, out_refs, local_arg, local_max, local_sum,
                 local_stats)


@functools.partial(jax.jit,
                   static_argnames=("row_tile", "chunk", "interpret"))
def _fused_call_interleaved(y, mask_f32, smask_f32, row_tile, chunk,
                            interpret=False):
    b, n2 = y.shape
    grid = (b // row_tile, n2 // chunk)
    want_stats = smask_f32 is not None

    data_spec = pl.BlockSpec(
        (row_tile, chunk), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (1, chunk), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (row_tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [data_spec, mask_spec]
    inputs = [y, mask_f32]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
    ]
    if want_stats:
        in_specs.append(mask_spec)
        inputs.append(smask_f32)
        out_shape += [jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 2

    outs = pl.pallas_call(
        functools.partial(_kernel_interleaved, chunk=chunk,
                          want_stats=want_stats),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    # The argmax lives on even interleaved lanes: halve to sample index.
    return (jnp.right_shift(outs[0][:, 0], 1),) + tuple(
        o[:, 0] for o in outs[1:])


def fused_power_peak(x, mask, row_tile=8, chunk=2048, interpret=None,
                     layout="interleaved", stats_mask=None):
    """One-pass windowed power argmax + peak + energy over [B, N] complex.

    Parameters
    ----------
    x : [B, N] complex array (device)
    mask : [N] bool numpy array (window; True = searchable)
    layout : 'interleaved' (bitcast in place, default) or 'planes'
        (separate re/im float32 arrays; costs an extra HBM pass).
    stats_mask : optional [N] bool numpy array; when given, the same
        pass also reduces the masked power sum and masked magnitude
        sum (the sufficient statistics for the reference's optional
        ``d*std(mag)^2`` threshold term) and the return grows to
        ``(idx, peak, total, stat_pow, stat_mag)``.

    Returns (peak_idx int32 [B], peak_power f32 [B], total_power f32 [B]
    [, stat_pow f32 [B], stat_mag f32 [B]]).

    Falls back to the jnp reference when shapes do not tile cleanly.
    """
    b, n = x.shape
    mask = np.asarray(mask)
    if not mask.any():
        # An empty search window is a config error.  Refuse it here so
        # both paths fail identically: the kernels' -1.0 sentinel would
        # otherwise surface as peak_power=-1 (NaN magnitude) while the
        # jnp reference reports power[argmax of all-(-1)] = power[0].
        raise ValueError("search mask has no True entries "
                         "(empty carrier/correlation window)")
    if stats_mask is not None:
        stats_mask = np.asarray(stats_mask)

    def reference(re, im):
        return fused_power_peak_reference(
            re, im, jnp.asarray(mask),
            None if stats_mask is None else jnp.asarray(stats_mask))

    if interpret is None:
        if jax.devices()[0].platform == "cpu":
            # Compiled CPU path: interpreter is slow; use the reference.
            return reference(jnp.real(x).astype(jnp.float32),
                             jnp.imag(x).astype(jnp.float32))
        interpret = False

    if layout == "interleaved" and x.dtype == jnp.complex64 \
            and (2 * n) % chunk == 0 and b % row_tile == 0 \
            and chunk % LANE == 0:
        y = jnp.asarray(x).view(jnp.float32)  # [B, 2N], zero-copy view
        mask_ilv = np.zeros(2 * n, dtype=np.float32)
        mask_ilv[0::2] = mask
        smask_ilv = None
        if stats_mask is not None:
            sm = np.zeros(2 * n, dtype=np.float32)
            sm[0::2] = stats_mask
            smask_ilv = jnp.asarray(sm)[None, :]
        return _fused_call_interleaved(
            y, jnp.asarray(mask_ilv)[None, :], smask_ilv, row_tile, chunk,
            interpret=interpret)

    re = jnp.real(x).astype(jnp.float32)
    im = jnp.imag(x).astype(jnp.float32)
    usable = (
        n % chunk == 0 and b % row_tile == 0 and chunk % LANE == 0
    )
    if not usable:
        return reference(re, im)
    mask_f32 = jnp.asarray(mask.astype(np.float32))[None, :]
    smask_f32 = None if stats_mask is None \
        else jnp.asarray(stats_mask.astype(np.float32))[None, :]
    return _fused_call(re, im, mask_f32, smask_f32, row_tile, chunk,
                       interpret=interpret)
