"""In-process full pipeline: detect everything, then identify -> match ->
tdoa -> pos (reference thrifty/kitchen_sink.py:42-87).

Every stage is injectable for experimentation; defaults are the standard
implementations.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from thrifty_tpu.dsp.detector import BatchDetector
from thrifty_tpu.io import card, toad
from thrifty_tpu.pipeline import identify as identify_mod
from thrifty_tpu.pipeline import matchmaker as matchmaker_mod
from thrifty_tpu.pipeline import pos as pos_mod
from thrifty_tpu.pipeline import tdoa as tdoa_mod


@dataclasses.dataclass
class PostdetectSettings:
    freqmap: Optional[dict]
    match_window: float
    tdoa_est_window: float
    rx_pos: dict
    beacon_pos: dict
    sample_rate: float
    # txids already assigned upstream (detect_all's
    # txid_from_template, i.e. a code-division template bank): keep
    # them and dedup across codes.  Without this the default
    # integrator would silently RE-classify by carrier bin, lumping
    # every shared-carrier transmitter into one txid.
    keep_txid: bool = False


@dataclasses.dataclass
class PostdetectResult:
    toads: np.ndarray
    matches: list
    tdoas: list
    pos: np.ndarray


def detect_all(cards, detector: BatchDetector, batch_size: int = 256,
               txid_from_template: bool = False):
    """Detect on multiple receivers' captures.

    ``cards``: {rxid: .card path | (timestamps, indices, blocks)}.
    Returns a merged detection array; txids are unassigned unless
    ``txid_from_template`` maps the winning bank template to the txid.
    """
    parts = []

    def drain(entry):
        ts_c, idx_c, n, dev_out, rx = entry
        out = {k: np.asarray(v)[:n] for k, v in dev_out.items()}
        soa = detector.soa(idx_c, out["corr_sample"], out["corr_offset"])
        return toad.from_detector_output(
            ts_c, idx_c, soa, out, rxid=rx,
            txid_from_template=txid_from_template)

    pending = None
    for rxid, capture in cards.items():
        if isinstance(capture, str):
            ts, idx, blocks = card.read_card_blocks(capture)
        else:
            ts, idx, blocks = capture
        blocks = np.asarray(blocks, dtype=np.complex64)
        # Feed complex blocks directly (no lossy 8-bit round trip) in
        # static-shape batches, padding the tail with silence; one batch
        # stays in flight so host prep overlaps device compute.
        for i in range(0, len(ts), batch_size):
            chunk = blocks[i:i + batch_size]
            n = len(chunk)
            if n < batch_size:
                chunk = np.concatenate([
                    chunk, np.zeros((batch_size - n, blocks.shape[1]),
                                    np.complex64)])
            dev_out = detector(chunk)  # async dispatch
            if pending is not None:
                parts.append(drain(pending))
            pending = (ts[i:i + n], idx[i:i + n], n, dev_out, rxid)
    if pending is not None:
        parts.append(drain(pending))
    if not parts:
        return toad.empty(0)
    return np.concatenate(parts)


def postdetect(
    detections,
    settings: PostdetectSettings,
    integrator: Callable = identify_mod.integrate,
    matcher: Callable = matchmaker_mod.match_detections,
    tdoa_estimator: Callable = tdoa_mod.estimate_tdoas,
    pos_estimator: Callable = pos_mod.solve,
):
    """Identify, match, estimate TDOAs, estimate positions."""
    if settings.keep_txid \
            and integrator is identify_mod.integrate:
        toads = integrator(detections, settings.freqmap,
                           keep_txid=True, dedup_any_tx=True)
    else:
        toads = integrator(detections, settings.freqmap)
    matches, _, _ = matcher(toads, settings.match_window)
    tdoas, _ = tdoa_estimator(
        toads, matches, settings.tdoa_est_window,
        settings.beacon_pos, settings.rx_pos, settings.sample_rate)
    positions = pos_estimator(tdoas, settings.rx_pos)
    return PostdetectResult(
        toads=toads, matches=matches, tdoas=tdoas, pos=positions)
