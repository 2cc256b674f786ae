"""Golden cross-validation of the EXPERIMENTAL surfaces against the
actual reference implementation.

``tests/golden/interp/`` holds .toad outputs of the reference's
experimental CLI drivers (run via the same mechanical py2->py3 shim as
the scenario-1 goldens, scripts/make_reference_goldens.sh) on
``tests/golden/input/rx0.card``:

    thrifty.experimental.detect_xcorr_interpol --method M
        (M in parabolic cosine autocorr maximise none)
    thrifty.experimental.detect_carrier_interpol --method M
        (M in parabolic gaussian cosine none)
    thrifty.experimental.detect_preshift
        (pre-shifted template bank, 21 shifts, parabolic carrier
         interpolation -- detect_preshift.py:49)

thrifty-tpu promotes every one of these to a first-class batched option
(``detect --corr-interp / --carrier-interp / --sync-mode preshift``);
this test pins their numerics to the reference, not just to this
repo's own float64 oracles.

Tolerances (measured headroom ~3-10x, docs/golden_validation.md):

* Closed-form interpolators (parabolic/gaussian/cosine/none) and the
  preshift bank are the same formulas evaluated batched in float32:
  detection decisions and integer columns IDENTICAL, offsets within
  1e-4 samples (measured <1e-5).
* 'maximise' and 'autocorr' replace per-detection scipy optimizers
  (scipy.optimize.minimize over a re-FFT'd peak segment,
  xcorr_interpolators.py:94-111; weighted curve_fit of the shifted
  measurement against the template autocorrelation, :60-92) with
  fixed-iteration batched solvers over a different but equivalent
  objective (band-limited evaluation of the full-block correlation
  spectrum; Gauss-Newton fit of the oversampled autocorrelation
  shape).  Above 20 dB correlation SNR the estimates coincide
  (measured <= 3.4e-3 samples); below, both objectives are
  noise-flat and the optimizers settle on different sub-sample
  solutions -- at 12 dB SNR the CRLB noise on the offset itself is
  ~0.1 samples, so the divergence is physically meaningless.  The
  test asserts the tight high-SNR bound, the overall median, and a
  worst-case cap.
"""

import os

import numpy as np
import pytest

from thrifty_tpu.cli import main

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
INPUT = os.path.join(GOLDEN, "input")
INTERP = os.path.join(GOLDEN, "interp")


def test_template_generate_matches_reference(tmp_path):
    """Integer-sampler Gold template vs the reference's
    template_generate (template_generate.py:19-46): bit-identical."""
    out = tmp_path / "gen.npy"
    assert main(["template_generate", "11", "0", "-o", str(out),
                 "--sample-rate", "2.4M",
                 "--chip-rate", "0.999707M"]) == 0
    ref = np.load(os.path.join(GOLDEN, "tools", "template_generated.npy"))
    np.testing.assert_array_equal(np.load(str(out)), ref)


def test_template_extract_matches_reference(tmp_path):
    """Best-detection OOK template cut vs the reference's
    template_extract (template_extract.py:36-70) on the scenario-1
    capture: same winning block, float64-rounding agreement
    (measured < 2e-15)."""
    out = tmp_path / "ext.npy"
    assert main(["template_extract",
                 os.path.join(INPUT, "rx0.card"), "-o", str(out),
                 "--carrier-window", "7-110",
                 "--template", os.path.join(INPUT, "template.npy")]) == 0
    ref = np.load(os.path.join(GOLDEN, "tools", "template_extracted.npy"))
    got = np.load(str(out))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("model", ["nearest", "linear", "weighted-poly"])
def test_clock_model_matches_reference(model, tmp_path):
    """The alternative beacon clock models (tdoa --model) against the
    reference's own build_model_nearest/linear/weighted_poly run on the
    scenario-1 toads/match (goldened by make_reference_goldens.sh; the
    reference CLI itself hardwires build_model_poly, tdoa_est.py:226).
    Inputs are the GOLDEN rx.toads/rx.match so the comparison isolates
    the clock model from detect-stage float32 deltas; agreement is at
    float64 rounding level (measured < 1e-15 s)."""
    out = tmp_path / ("data_%s.tdoa" % model)
    assert main(["tdoa", os.path.join(GOLDEN, "rx.toads"),
                 os.path.join(GOLDEN, "rx.match"), "-o", str(out),
                 "-r", os.path.join(INPUT, "pos-rx.cfg"),
                 "-b", os.path.join(INPUT, "pos-beacon.cfg"),
                 "--model", model]) == 0
    ref = np.atleast_2d(np.loadtxt(
        os.path.join(INTERP, "data_%s.tdoa" % model)))
    got = np.atleast_2d(np.loadtxt(str(out)))
    assert got.shape == ref.shape, "different TDOA group structure"
    for col in (0, 2, 3, 4, 8, 9):  # group, txid, rx ids, det indices
        np.testing.assert_array_equal(got[:, col], ref[:, col],
                                      err_msg="tdoa col %d" % col)
    np.testing.assert_allclose(got[:, 1], ref[:, 1], atol=1e-9)
    # col 5 = TDOA in ns; 1e-4 ns = 0.03 mm of range.
    np.testing.assert_allclose(got[:, 5], ref[:, 5], atol=1e-4,
                               err_msg="TDOA [ns]")
    np.testing.assert_allclose(got[:, 6], ref[:, 6], rtol=1e-9,
                               err_msg="snr")
    np.testing.assert_allclose(got[:, 7], ref[:, 7], rtol=1e-6,
                               atol=1e-9, err_msg="model quality")

# .toad columns: 0 rxid, 1 timestamp, 2 block, 3 soa, 4 peak_idx,
# 5 corr_offset, 6 corr_ampl, 7 corr_noise, 8 carrier_bin,
# 9 carrier_offset, 10 carrier_ampl, 11 carrier_noise
INT_COLS = (0, 2, 4, 8)

CASES = {
    # name -> (extra CLI args, corr_offset tolerance spec)
    "corr_parabolic": (["--corr-interp", "parabolic"], "tight"),
    "corr_cosine": (["--corr-interp", "cosine"], "tight"),
    "corr_none": (["--corr-interp", "none"], "tight"),
    "corr_autocorr": (["--corr-interp", "autocorr"],
                      dict(hi=1e-2, median=1e-2, max=0.5)),
    "corr_maximise": (["--corr-interp", "maximise"],
                      dict(hi=3e-3, median=2e-3, max=0.05)),
    "carrier_parabolic": (["--carrier-interp", "parabolic"], "tight"),
    "carrier_gaussian": (["--carrier-interp", "gaussian"], "tight"),
    "carrier_cosine": (["--carrier-interp", "cosine"], "tight"),
    "carrier_none": (["--carrier-interp", "none"], "tight"),
    "preshift": (["--sync-mode", "preshift",
                  "--carrier-interp", "parabolic"], "tight"),
}


@pytest.fixture(scope="module")
def rerun(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_interp")
    common = ["--carrier-window", "7-110", "--quiet", "--rxid", "0",
              "--template", os.path.join(INPUT, "template.npy")]
    for name, (extra, _) in CASES.items():
        assert main(["detect", os.path.join(INPUT, "rx0.card"),
                     "-o", str(d / (name + ".toad"))]
                    + common + extra) == 0, name
    return d


@pytest.mark.parametrize("name", sorted(CASES))
def test_experimental_surface_matches_reference(rerun, name):
    ref = np.atleast_2d(np.loadtxt(
        os.path.join(INTERP, "rx0_%s.toad" % name)))
    got = np.atleast_2d(np.loadtxt(str(rerun / (name + ".toad"))))
    assert got.shape == ref.shape, "different detection count"
    for col in INT_COLS:
        np.testing.assert_array_equal(got[:, col], ref[:, col],
                                      err_msg="toad col %d" % col)
    # Carrier-side columns are closed-form in every case here.
    np.testing.assert_allclose(got[:, 9], ref[:, 9], atol=1e-4,
                               err_msg="carrier_offset")
    np.testing.assert_allclose(got[:, 10], ref[:, 10], rtol=1e-3,
                               err_msg="carrier_ampl")
    np.testing.assert_allclose(got[:, 11], ref[:, 11], rtol=1e-2,
                               err_msg="carrier_noise")
    np.testing.assert_allclose(got[:, 6], ref[:, 6], rtol=1e-3,
                               atol=1e-3, err_msg="corr_ampl")
    np.testing.assert_allclose(got[:, 7], ref[:, 7], rtol=1e-2,
                               atol=1e-3, err_msg="corr_noise")

    spec = CASES[name][1]
    d = np.abs(got[:, 5] - ref[:, 5])
    if spec == "tight":
        assert d.max() < 1e-4, "corr_offset (max %.2e)" % d.max()
        np.testing.assert_allclose(got[:, 3], ref[:, 3], atol=1e-3,
                                   err_msg="soa")
    else:
        snr = ref[:, 6] / np.maximum(ref[:, 7], 1e-12)
        hi = snr > 10.0  # 20 dB
        assert hi.any() and (~hi).any(), "capture must span SNR regimes"
        assert d[hi].max() < spec["hi"], \
            "high-SNR corr_offset (max %.2e)" % d[hi].max()
        assert np.median(d) < spec["median"], \
            "median corr_offset (%.2e)" % np.median(d)
        assert d.max() < spec["max"], \
            "worst-case corr_offset (%.2e)" % d.max()
