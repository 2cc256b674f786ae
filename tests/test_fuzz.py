"""Property/robustness tests: parsers must never crash on hostile input."""

import io

import numpy as np
import pytest

from thrifty_tpu.config import parsers, settings as settings_mod
from thrifty_tpu.io import card, toad


def random_bytes_lines(rng, n=200):
    out = []
    for _ in range(n):
        length = int(rng.integers(0, 80))
        out.append(bytes(rng.integers(0, 256, length, dtype=np.uint8)))
    return b"\n".join(out)


class TestCardRobustness:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_garbage_never_crashes(self, seed):
        rng = np.random.default_rng(seed)
        blob = random_bytes_lines(rng)
        ts, idx, raw = card.read_card(io.BytesIO(blob), native=False)
        assert len(ts) == len(idx) == len(raw)

    @pytest.mark.parametrize("seed", range(5))
    def test_random_garbage_native(self, seed):
        native = pytest.importorskip("thrifty_tpu.native")
        rng = np.random.default_rng(seed)
        blob = random_bytes_lines(rng)
        try:
            ts, idx, raw = native.parse_card_bytes(blob)
            assert len(ts) == len(idx)
        except ValueError:
            pass  # inconsistent/invalid payloads may be rejected

    def test_mixed_valid_invalid_lines(self):
        import base64
        enc = base64.b64encode(bytes(range(32))).decode()
        blob = ("junk\n# comment\n1.5 0 {e}\nnot a line\n"
                "2.5 1 {e}\n".format(e=enc)).encode()
        ts, idx, raw = card.read_card(io.BytesIO(blob))
        assert idx.tolist() == [0, 1]


class TestToadRobustness:
    @pytest.mark.parametrize("seed", range(3))
    def test_random_text_never_crashes(self, seed):
        rng = np.random.default_rng(seed)
        lines = []
        for _ in range(100):
            n = int(rng.integers(0, 20))
            lines.append(" ".join(
                str(rng.normal()) for _ in range(n)))
        det = toad.load_toads(io.StringIO("\n".join(lines)))
        assert det.dtype == toad.DETECTION_DTYPE

    def test_truncated_line_skipped(self):
        det = toad.load_toad(io.StringIO("0 1.5 3 100.0\n"))
        assert len(det) == 0


class TestParserRobustness:
    @pytest.mark.parametrize("seed", range(3))
    def test_threshold_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        chars = "0123456789.+*csd snrtdev"
        for _ in range(200):
            s = "".join(rng.choice(list(chars),
                                   size=int(rng.integers(1, 15))))
            try:
                c, sn, d = parsers.threshold(s)
                assert np.isfinite([c, sn, d]).all()
            except ValueError:
                pass

    @pytest.mark.parametrize("seed", range(3))
    def test_freq_range_fuzz(self, seed):
        rng = np.random.default_rng(seed)
        chars = "0123456789.-+ kMhzHZ"
        for _ in range(200):
            s = "".join(rng.choice(list(chars),
                                   size=int(rng.integers(1, 15))))
            try:
                start, stop, hz = parsers.freq_range(s)
                assert np.isfinite([start, stop]).all()
            except ValueError:
                pass

    def test_config_fuzz(self):
        rng = np.random.default_rng(0)
        printable = [chr(c) for c in range(32, 127)]
        for _ in range(100):
            text = "".join(rng.choice(printable,
                                      size=int(rng.integers(0, 200))))
            try:
                settings_mod.parse_kv_config(io.StringIO(text))
            except settings_mod.ConfigError:
                pass


class TestRandomGeometryDifferential:
    """Random-geometry DIFFERENTIAL fuzz: the f32 batched detector vs
    the float64 oracle on identical blocks.  Stronger than the
    self-consistency fuzz below: any divergence from the reference
    equations -- shape/window bugs, wrap handling, interpolation
    clipping, filter transients -- shows up as a field mismatch, at
    geometries, signed/wrap-crossing carrier windows, sync modes, and
    filter settings the fixed-geometry oracle tests never visit."""

    def test_differential_random_geometries(self):
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import dirichlet
        from thrifty_tpu.dsp import template as template_mod, xcorr
        from thrifty_tpu.dsp.detector import BatchDetector, \
            DetectorConfig
        from thrifty_tpu.oracle.numpy_ref import (FastdetOracleDetector,
                                                  OracleDetector)

        rng = np.random.default_rng(20260818)
        trials = 0
        while trials < 6:
            bits = int(rng.integers(5, 8))
            tpl = template_mod.generate(bits, 0, float(rng.uniform(1.6, 2.6)))
            tlen = len(tpl)
            block = int(2 ** rng.integers(9, 13))
            lo, hi = tlen + 1, block // 2
            if lo >= hi:
                continue
            trials += 1
            hist = int(rng.integers(lo, hi))
            new = block - hist
            num_blocks = int(rng.integers(4, 8))
            wstart, wstop = xcorr.corr_window(block, hist, tlen)
            half = block // 20
            kind = ("pos", "neg", "wrap")[trials % 3]
            if kind == "pos":
                window = (3, half)
                cbin = int(rng.integers(5, half - 1))
            elif kind == "neg":
                window = (-half, -3)
                cbin = -int(rng.integers(5, half - 1))
            else:
                window = (-half, half)
                cbin = int(rng.integers(3, half - 1)) * \
                    (1 if rng.integers(2) else -1)
            sync_mode = ["fractional", "integer"][trials % 2]
            flen = int(rng.choice([0, 5]))
            bursts, planted = [], []
            for b in range(1, num_blocks - 1):
                lag = int(rng.integers(wstart, wstop))
                bursts.append({"position": b * new + lag - hist,
                               "carrier_bin": cbin,
                               "amplitude": 0.7,
                               "phase": float(rng.uniform(0, 6.28))})
                planted.append((b, lag))
            stream = sim.synth_stream(num_blocks * new, bursts, tpl,
                                      block, noise_std=0.02, seed=trials)
            blocks = sim.stream_to_blocks(stream, block, hist)

            det = BatchDetector(tpl, DetectorConfig(
                block_len=block, history_len=hist,
                carrier_window=window, sync_mode=sync_mode,
                peak_filter_len=flen))
            out = {k: np.asarray(v) for k, v in det(blocks).items()}

            weights = dirichlet.dirichlet_weights(flen, block, tlen) \
                if flen else None
            oracle_cls = (OracleDetector if sync_mode == "fractional"
                          else FastdetOracleDetector)
            oracle = oracle_cls(tpl, block_len=block, history_len=hist,
                                carrier_window=window,
                                peak_filter=weights)
            geom = "trial=%d bits=%d block=%d hist=%d win=%s sync=%s " \
                "flen=%d cbin=%d" % (trials, bits, block, hist, window,
                                     sync_mode, flen, cbin)
            for b, lag in planted:
                ref = oracle.detect_block(blocks[b])
                # AGREEMENT asserts: both paths must make the same
                # decisions (a marginal geometry may legitimately not
                # detect -- then both must agree on that too).
                assert bool(out["carrier_detect"][b]) \
                    == ref.carrier_detect, geom
                if not ref.carrier_detect:
                    continue
                assert int(out["carrier_bin"][b]) == ref.carrier_bin, \
                    geom
                # Ground truth: when detected, the device path must
                # recover the PLANTED lag exactly.
                if bool(out["detected"][b]):
                    assert int(out["corr_sample"][b]) == lag, geom
                if abs(ref.carrier_offset) > 1.0:
                    # The oracle's unbounded curve_fit left its own bin
                    # (tiny template -> wide carrier lobe); our GN
                    # clamps to +-1 by design and recovers the planted
                    # lag while the reference mis-times (documented in
                    # docs/golden_validation.md).  No oracle left to
                    # compare against.
                    continue
                assert bool(out["detected"][b]) == ref.detected, geom
                if not ref.detected:
                    continue
                assert int(out["corr_sample"][b]) == ref.corr_sample, \
                    geom
                soa_dev = float(out["corr_sample"][b]
                                + out["corr_offset"][b])
                soa_ref = ref.corr_sample + ref.corr_offset
                # Bound: f32 interpolation noise grows as templates
                # shrink (31-chip codes measured ~5e-3; production
                # 4914-sample ~1e-7..1e-4).  Real wrap/shift/window
                # bugs produce O(0.1+) errors or bin/verdict
                # mismatches, well outside this.
                assert abs(soa_dev - soa_ref) < 1e-2, \
                    "%s: SoA diff %.2e" % (geom, soa_dev - soa_ref)


class TestRandomGeometryBank:
    """Random-geometry template-bank fuzz: bursts planted with a
    random code from a 3-code Gold bank (all on one shared carrier)
    must be detected in the right block with the right template_idx
    and the planted lag, across all three sync modes -- bank
    classification has no float64 oracle, so ground truth is the
    planted identity (fixed-geometry coverage: test_code_division)."""

    def test_bank_random_geometries(self):
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod, xcorr
        from thrifty_tpu.dsp.detector import BatchDetector, \
            DetectorConfig

        rng = np.random.default_rng(20260819)
        trials = 0
        while trials < 6:
            bits = int(rng.integers(5, 8))
            bank = template_mod.generate_bank(
                bits, [0, 1, 2], float(rng.uniform(1.8, 2.4)))
            tlen = bank.shape[1]
            block = int(2 ** rng.integers(9, 13))
            lo, hi = tlen + 1, block // 2
            if lo >= hi:
                continue
            trials += 1
            hist = int(rng.integers(lo, hi))
            new = block - hist
            num_blocks = int(rng.integers(4, 8))
            wstart, wstop = xcorr.corr_window(block, hist, tlen)
            cbin = int(rng.integers(7, block // 40))
            sync = ("fractional", "integer", "preshift")[trials % 3]
            bursts, planted = [], []
            for b in range(1, num_blocks - 1):
                lag = int(rng.integers(wstart, wstop))
                code = int(rng.integers(0, 3))
                bursts.append({"position": b * new + lag - hist,
                               "carrier_bin": cbin,
                               "amplitude": 0.7,
                               "phase": float(rng.uniform(0, 6.28)),
                               "template": bank[code]})
                planted.append((b, lag, code))
            stream = sim.synth_stream(num_blocks * new, bursts, bank[0],
                                      block, noise_std=0.02, seed=trials)
            blocks = sim.stream_to_blocks(stream, block, hist)
            det = BatchDetector(bank, DetectorConfig(
                block_len=block, history_len=hist, sync_mode=sync,
                carrier_window=(3, block // 20)))
            out = {k: np.asarray(v) for k, v in det(blocks).items()}
            geom = "trial=%d bits=%d block=%d hist=%d sync=%s" % (
                trials, bits, block, hist, sync)
            for b, lag, code in planted:
                assert bool(out["detected"][b]), "%s block=%d" % (geom, b)
                assert int(out["template_idx"][b]) == code, \
                    "%s block=%d: idx %d != planted %d" % (
                        geom, b, int(out["template_idx"][b]), code)
                assert int(out["corr_sample"][b]) == lag, \
                    "%s block=%d" % (geom, b)


class TestRandomGeometry:
    """Randomized (block, history, template, batch) geometry fuzz:
    for any valid overlap-save geometry, a burst planted at a known
    position must be detected in the predicted block with sub-sample
    SoA accuracy.  Catches latent shape/window bugs outside the
    default 16384/4920/4914 production geometry."""

    def test_random_geometries_detect_planted_burst(self):
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod, xcorr
        from thrifty_tpu.dsp.detector import BatchDetector, \
            DetectorConfig

        rng = np.random.default_rng(20260817)
        for trial in range(6):
            bits = int(rng.integers(5, 8))  # template 31..127 chips
            tpl = template_mod.generate(bits, 0, 2.0)
            tlen = len(tpl)
            block = int(2 ** rng.integers(9, 13))  # 512..4096
            # history: enough for the template, less than the block
            lo, hi = tlen + 1, block // 2
            if lo >= hi:
                continue
            hist = int(rng.integers(lo, hi))
            new = block - hist
            num_blocks = int(rng.integers(4, 10))
            wstart, wstop = xcorr.corr_window(block, hist, tlen)
            # One burst per block in its unique window, all on one
            # carrier (one TX, the reference's model -- a block's
            # history can show the neighbouring burst, and carrier
            # sync must still lock onto the shared bin).
            cbin = int(rng.integers(7, block // 40))
            bursts, expect = [], []
            for b in range(1, num_blocks - 1):
                lag = int(rng.integers(wstart, wstop))
                soa = b * new + lag
                bursts.append({"position": soa - hist,
                               "carrier_bin": cbin,
                               "amplitude": 0.7,
                               "phase": float(rng.uniform(0, 6.28))})
                expect.append((b, float(soa)))
            stream = sim.synth_stream(
                num_blocks * new, bursts, tpl, block,
                noise_std=0.02, seed=trial)
            blocks = sim.stream_to_blocks(stream, block, hist)
            det = BatchDetector(tpl, DetectorConfig(
                block_len=block, history_len=hist,
                carrier_window=(3, block // 20)))
            out = {k: np.asarray(v) for k, v in det(blocks).items()}
            soa = det.soa(np.arange(num_blocks),
                          out["corr_sample"], out["corr_offset"])
            geom = "bits=%d block=%d hist=%d" % (bits, block, hist)
            for b, want in expect:
                assert out["detected"][b], \
                    "%s: no detection in block %d" % (geom, b)
                err = abs(float(soa[b]) - want)
                assert err < 0.3, \
                    "%s: SoA err %.3f in block %d" % (geom, err, b)
