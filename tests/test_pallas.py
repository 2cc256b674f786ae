"""Pallas fused peak/energy kernel vs the jnp reference (interpret mode)."""

import numpy as np
import pytest

from thrifty_tpu.dsp import pallas_kernels as pk


def make_data(b=16, n=4096, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(b, n)) + 1j * rng.normal(size=(b, n))
         ).astype(np.complex64)
    # Plant distinct peaks inside and outside the window.
    for i in range(b):
        x[i, 100 + i] = 50.0 + 0j        # inside window
        x[i, n - 10] = 80.0 + 0j         # outside window (must be ignored)
    mask = np.zeros(n, dtype=bool)
    mask[50:2000] = True
    return x, mask


class TestFusedPowerPeak:
    def test_matches_reference_interpret(self):
        x, mask = make_data()
        import jax.numpy as jnp
        ref = pk.fused_power_peak_reference(
            jnp.real(x), jnp.imag(x), jnp.asarray(mask))
        got = pk.fused_power_peak(x, mask, row_tile=8, chunk=512,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                                   rtol=1e-5)

    def test_peak_positions(self):
        x, mask = make_data()
        idx, peak, total = pk.fused_power_peak(
            x, mask, row_tile=8, chunk=512, interpret=True)
        for i in range(len(x)):
            assert int(np.asarray(idx)[i]) == 100 + i
        np.testing.assert_allclose(np.asarray(peak), 2500.0, rtol=1e-5)

    def test_peak_in_last_chunk(self):
        rng = np.random.default_rng(1)
        x = (0.01 * rng.normal(size=(8, 1024))).astype(np.complex64)
        x[:, 1000] = 9.0
        mask = np.ones(1024, dtype=bool)
        idx, peak, _ = pk.fused_power_peak(
            x, mask, row_tile=8, chunk=256, interpret=True)
        assert np.all(np.asarray(idx) == 1000)

    @pytest.mark.parametrize("layout", ["interleaved", "planes"])
    def test_layouts_match_reference(self, layout):
        """Both kernel layouts reproduce the reference exactly."""
        x, mask = make_data(seed=7)
        import jax.numpy as jnp
        ref = pk.fused_power_peak_reference(
            jnp.real(x), jnp.imag(x), jnp.asarray(mask))
        got = pk.fused_power_peak(x, mask, row_tile=8, chunk=512,
                                  interpret=True, layout=layout)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                                   rtol=1e-5)

    def test_interleaved_peak_at_chunk_edges(self):
        """Pairs at chunk boundaries: the roll wraps within a chunk but
        only garbage odd lanes are affected; peaks at the first/last
        complex sample of a chunk must survive."""
        b, n, chunk = 8, 2048, 512
        for peak_pos in (0, chunk // 2 - 1, chunk // 2,
                         n - chunk // 2, n - 1):
            x = np.full((b, n), 0.01 + 0.01j, dtype=np.complex64)
            x[:, peak_pos] = 7.0 - 2.0j
            mask = np.ones(n, dtype=bool)
            idx, peak, total = pk.fused_power_peak(
                x, mask, row_tile=8, chunk=chunk, interpret=True,
                layout="interleaved")
            assert np.all(np.asarray(idx) == peak_pos), peak_pos
            np.testing.assert_allclose(np.asarray(peak), 53.0, rtol=1e-6)

    @pytest.mark.parametrize("layout", ["interleaved", "planes"])
    def test_stats_outputs_match_reference(self, layout):
        """Masked power/magnitude sums (stddev-term statistics)."""
        x, mask = make_data(seed=11)
        import jax.numpy as jnp
        stats_mask = np.zeros(x.shape[-1], dtype=bool)
        stats_mask[:3000] = True
        ref = pk.fused_power_peak_reference(
            jnp.real(x), jnp.imag(x), jnp.asarray(mask),
            jnp.asarray(stats_mask))
        got = pk.fused_power_peak(x, mask, row_tile=8, chunk=512,
                                  interpret=True, layout=layout,
                                  stats_mask=stats_mask)
        assert len(got) == 5
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(ref[0]))
        for g, r, tol in zip(got[1:], ref[1:], (1e-6, 1e-5, 1e-5, 1e-5)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=tol)

    def test_unaligned_shapes_fall_back(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 1000)).astype(np.complex64)  # unaligned
        mask = np.ones(1000, dtype=bool)
        idx, peak, total = pk.fused_power_peak(x, mask)
        ref_idx = np.argmax(np.abs(x) ** 2, axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)


class TestDetectorPallasPath:
    def test_pallas_path_matches_standard(self):
        """Full detector: pallas program == standard program (interpret)."""
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod
        from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
        import thrifty_tpu.dsp.pallas_kernels as pkmod

        tpl = template_mod.generate(5, 0, 2.0)
        cap = sim.synth_capture(
            num_blocks=8, bursts_every=2, template=tpl, block_len=2048,
            history_len=256, carrier_bin=40.25, amplitude=0.8,
            noise_std=0.05, seed=3, quantize=False)

        std = BatchDetector(tpl, DetectorConfig(
            block_len=2048, history_len=256, carrier_window=(7, 110),
            use_pallas="off"))
        out_std = {k: np.asarray(v) for k, v in std(cap.blocks).items()}

        # Run the pallas program with the kernel in interpret mode.
        import unittest.mock as mock
        orig = pkmod.fused_power_peak

        def interpreted(x, mask, **kw):
            kw["interpret"] = True
            return orig(x, mask, **kw)

        with mock.patch.object(pkmod, "fused_power_peak", interpreted):
            pal = BatchDetector(tpl, DetectorConfig(
                block_len=2048, history_len=256, carrier_window=(7, 110),
                use_pallas="on"))
            out_pal = {k: np.asarray(v)
                       for k, v in pal._detect_batch(
                           np.asarray(cap.blocks)).items()}

        np.testing.assert_array_equal(
            out_pal["detected"], out_std["detected"])
        np.testing.assert_array_equal(
            out_pal["carrier_bin"], out_std["carrier_bin"])
        np.testing.assert_array_equal(
            out_pal["corr_sample"], out_std["corr_sample"])
        np.testing.assert_allclose(
            out_pal["carrier_offset"], out_std["carrier_offset"], atol=1e-5)
        np.testing.assert_allclose(
            out_pal["corr_offset"], out_std["corr_offset"], atol=1e-5)
        np.testing.assert_allclose(
            out_pal["corr_energy"], out_std["corr_energy"], rtol=1e-5)
        np.testing.assert_allclose(
            out_pal["corr_noise"], out_std["corr_noise"], rtol=1e-4)


class TestPallasPathExtras:
    """Kernel-path configs beyond the default matrix: stddev threshold
    terms (one-pass masked statistics) and template-bank mode with the
    neighborhood/spectrum interpolators (the reshape-sensitive path)."""

    def _compare(self, tpl, blocks, kw, atol=1e-5):
        import unittest.mock as mock

        from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
        import thrifty_tpu.dsp.pallas_kernels as pkmod

        orig = pkmod.fused_power_peak

        def interpreted(x, m, **k):
            k["interpret"] = True
            return orig(x, m, **k)

        std = BatchDetector(tpl, DetectorConfig(use_pallas="off", **kw))
        out_std = {k: np.asarray(v)
                   for k, v in std._detect_batch(blocks).items()}
        det = BatchDetector(tpl, DetectorConfig(use_pallas="on", **kw))
        assert det._pallas_enabled(len(blocks))
        with mock.patch.object(pkmod, "fused_power_peak", interpreted):
            out_pal = {k: np.asarray(v)
                       for k, v in det._detect_batch(blocks).items()}
        msg = str(kw)
        for field in ("detected", "carrier_bin", "corr_sample",
                      "template_idx"):
            np.testing.assert_array_equal(out_pal[field], out_std[field],
                                          err_msg=msg)
        for field in ("carrier_offset", "corr_offset"):
            np.testing.assert_allclose(out_pal[field], out_std[field],
                                       atol=atol, err_msg=msg)
        np.testing.assert_allclose(out_pal["corr_energy"],
                                   out_std["corr_energy"], rtol=1e-5,
                                   err_msg=msg)
        return out_std

    def test_stddev_threshold_terms(self):
        """d != 0: the kernel's one-pass var matches XLA's jnp.var to
        f32 reassociation and decisions agree on planted bursts."""
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod

        tpl = template_mod.generate(5, 0, 2.0)
        cap = sim.synth_capture(
            num_blocks=8, bursts_every=2, template=tpl, block_len=2048,
            history_len=256, carrier_bin=40.25, amplitude=0.8,
            noise_std=0.05, seed=3, quantize=False)
        out = self._compare(tpl, np.asarray(cap.blocks), dict(
            block_len=2048, history_len=256, carrier_window=(7, 110),
            carrier_thresh=(0.0, 15.0, 0.5),
            corr_thresh=(0.0, 15.0, 0.5)))
        assert out["detected"].any()  # planted bursts still detected

    def test_stddev_var_never_negative(self):
        """A near-constant magnitude surface (time-domain impulses give
        exactly flat |FFT|) cancels E[x^2]-E[x]^2 to -epsilon in f32;
        the clamped kernel-path variance must not NaN the threshold."""
        import unittest.mock as mock

        from thrifty_tpu.dsp import template as template_mod
        from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
        import thrifty_tpu.dsp.pallas_kernels as pkmod

        tpl = template_mod.generate(5, 0, 2.0)
        blocks = np.zeros((8, 2048), dtype=np.complex64)
        blocks[:, 100] = 3.0 + 0j  # impulse -> |FFT| constant
        kw = dict(block_len=2048, history_len=256,
                  carrier_window=(7, 110),
                  carrier_thresh=(0.0, 0.0, 2.0),  # pure stddev term
                  corr_thresh=(0.0, 0.0, 2.0))
        std = BatchDetector(tpl, DetectorConfig(use_pallas="off", **kw))
        out_std = {k: np.asarray(v)
                   for k, v in std._detect_batch(blocks).items()}
        orig = pkmod.fused_power_peak

        def interpreted(x, m, **k):
            k["interpret"] = True
            return orig(x, m, **k)

        det = BatchDetector(tpl, DetectorConfig(use_pallas="on", **kw))
        with mock.patch.object(pkmod, "fused_power_peak", interpreted):
            out_pal = {k: np.asarray(v)
                       for k, v in det._detect_batch(blocks).items()}
        np.testing.assert_array_equal(out_pal["detected"],
                                      out_std["detected"])
        np.testing.assert_array_equal(out_pal["carrier_detect"],
                                      out_std["carrier_detect"])
        # Flat spectrum, zero variance: the carrier threshold is 0 and
        # the constant |FFT| peak must be detected on BOTH paths (a
        # NaN threshold would make every comparison False).
        assert out_std["carrier_detect"].all()
        assert out_pal["carrier_detect"].all()

    def test_bank_mode_interpolators(self):
        """Template bank on the kernel path: autocorr (per-template
        shape tables) and maximise (spectrum) need the bank reshape."""
        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod

        bank = np.stack([template_mod.generate(5, c, 2.0)
                         for c in range(2)])
        cap = sim.synth_capture(
            num_blocks=8, bursts_every=2, template=bank[1],
            block_len=2048, history_len=256, carrier_bin=40.25,
            amplitude=0.8, noise_std=0.05, seed=5, quantize=False)
        blocks = np.asarray(cap.blocks)
        base = dict(block_len=2048, history_len=256,
                    carrier_window=(7, 110))
        for corr in ("autocorr", "maximise", "parabolic"):
            out = self._compare(bank, blocks, dict(base, corr_interp=corr),
                                atol=2e-3 if corr == "maximise" else 1e-5)
            assert (out["template_idx"][out["detected"]] == 1).all()
        # Bank + stddev term together.
        self._compare(bank, blocks, dict(
            base, corr_thresh=(0.0, 15.0, 0.5)))


class TestGateOptionMatrix:
    """The kernel gate must never silently bifurcate numerics.

    As detector options grow, a combination could slip through
    _pallas_enabled while the fused kernel computes something subtly
    different from the XLA program.  Sweep the full option matrix: for
    every (sync_mode, corr_interp, carrier_interp, peak_filter) combo,
    use_pallas='on' must either REFUSE (ValueError -- so 'auto' gates
    off for the same reason) or produce output matching the XLA
    program on the same input (kernel in interpret mode).
    """

    SYNC = ("fractional", "integer", "preshift")
    CORR = ("gaussian", "parabolic", "cosine", "autocorr", "none",
            "maximise")
    CARRIER = ("auto", "dirichlet", "parabolic", "polyfit", "gaussian",
               "cosine", "none")

    def test_every_combo_gates_or_matches(self):
        import unittest.mock as mock

        from thrifty_tpu import sim
        from thrifty_tpu.dsp import template as template_mod
        from thrifty_tpu.dsp.detector import BatchDetector, DetectorConfig
        import thrifty_tpu.dsp.pallas_kernels as pkmod

        tpl = template_mod.generate(5, 0, 2.0)
        cap = sim.synth_capture(
            num_blocks=8, bursts_every=2, template=tpl, block_len=2048,
            history_len=256, carrier_bin=40.25, amplitude=0.8,
            noise_std=0.05, seed=3, quantize=False)
        blocks = np.asarray(cap.blocks)

        orig = pkmod.fused_power_peak

        def interpreted(x, m, **kw):
            kw["interpret"] = True
            return orig(x, m, **kw)

        engaged = []
        for sync in self.SYNC:
            for corr in self.CORR:
                for carrier in self.CARRIER:
                    for pf in (0, 7):
                        kw = dict(block_len=2048, history_len=256,
                                  carrier_window=(7, 110),
                                  sync_mode=sync, corr_interp=corr,
                                  carrier_interp=carrier,
                                  peak_filter_len=pf)
                        det = BatchDetector(
                            tpl, DetectorConfig(use_pallas="on", **kw))
                        try:
                            assert det._pallas_enabled(8)
                        except ValueError:
                            continue  # refused: no bifurcation possible
                        engaged.append((sync, corr, carrier, pf))
                        std = BatchDetector(
                            tpl, DetectorConfig(use_pallas="off", **kw))
                        out_std = {k: np.asarray(v) for k, v in
                                   std._detect_batch(blocks).items()}
                        with mock.patch.object(
                                pkmod, "fused_power_peak", interpreted):
                            out_pal = {k: np.asarray(v) for k, v in
                                       det._detect_batch(blocks).items()}
                        msg = str(kw)
                        np.testing.assert_array_equal(
                            out_pal["detected"], out_std["detected"],
                            err_msg=msg)
                        np.testing.assert_array_equal(
                            out_pal["carrier_bin"], out_std["carrier_bin"],
                            err_msg=msg)
                        np.testing.assert_array_equal(
                            out_pal["corr_sample"], out_std["corr_sample"],
                            err_msg=msg)
                        np.testing.assert_allclose(
                            out_pal["carrier_offset"],
                            out_std["carrier_offset"], atol=1e-5,
                            err_msg=msg)
                        # 'maximise' runs a golden-section search whose
                        # bracket decisions amplify f32 reassociation
                        # noise between differently-fused programs near
                        # the flat |corr| peak; both results maximize
                        # the objective to within its conditioning.
                        np.testing.assert_allclose(
                            out_pal["corr_offset"], out_std["corr_offset"],
                            atol=2e-3 if corr == "maximise" else 1e-5,
                            err_msg=msg)
                        np.testing.assert_allclose(
                            out_pal["corr_energy"], out_std["corr_energy"],
                            rtol=1e-5, err_msg=msg)
        # Every interpolator combo engages on the kernel path now; only
        # the magnitude-domain peak filter still gates to XLA.
        assert engaged, "gate refused every combo -- kernel dead?"
        for sync, corr, carrier, pf in engaged:
            assert pf == 0
        n_engaged = len(self.SYNC) * len(self.CORR) * len(self.CARRIER)
        assert len(engaged) == n_engaged


def test_all_false_mask_rejected():
    """An empty search window must fail loudly and identically on every
    path: the kernels' -1.0 init sentinel would otherwise report
    peak_power=-1 (NaN magnitude downstream) while the jnp reference
    returns power[0]."""
    x, _ = make_data(b=8, n=2048)
    empty = np.zeros(2048, dtype=bool)
    with pytest.raises(ValueError, match="no True"):
        pk.fused_power_peak(x, empty)
    with pytest.raises(ValueError, match="no True"):
        pk.fused_power_peak(x, empty, interpret=True, layout="planes")
