import os

import numpy as np
import pytest

from thrifty_tpu.dsp import gold, template


def test_gold_sequences_match_reference_golden():
    """Bit-for-bit against the ACTUAL reference generator: 42 (bits,
    index) cases across every supported register length, produced by
    running the reference's gold.py through the py2->py3 shim
    (scripts/make_reference_goldens.sh) and committed as
    tests/golden/gold_sequences.txt."""
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "gold_sequences.txt")
    n_cases = 0
    for line in open(path):
        bits_s, idx_s, seq_s = line.split()
        got = gold.gold(int(bits_s), int(idx_s))
        want = np.array([c == "1" for c in seq_s])
        np.testing.assert_array_equal(
            got, want, err_msg="gold(%s, %s)" % (bits_s, idx_s))
        n_cases += 1
    assert n_cases == 42


class TestLfsr:
    def test_maximal_length(self):
        # An m-sequence visits every nonzero state exactly once.
        for bits in [5, 6, 7]:
            taps_a, _ = gold.PREFERRED_TAPS[bits]
            seq = gold.lfsr(taps_a, bits)
            assert len(seq) == 2**bits - 1
            # Balance property: ones = 2^(n-1), zeros = 2^(n-1) - 1.
            assert np.sum(seq) == 2 ** (bits - 1)

    def test_msequence_autocorrelation(self):
        # Ideal two-valued autocorrelation: N at 0 lag, -1 elsewhere.
        seq = gold.lfsr(gold.PREFERRED_TAPS[7][0], 7)
        bp = gold.bipolar(seq)
        spec = np.fft.fft(bp)
        acorr = np.round(np.real(np.fft.ifft(spec * np.conj(spec))))
        assert acorr[0] == len(seq)
        assert np.all(acorr[1:] == -1)


class TestGold:
    def test_family_size_and_length(self):
        for bits in [5, 11]:
            assert gold.num_codes(bits) == 2**bits + 1
            assert len(gold.gold(bits, 2)) == 2**bits - 1

    def test_codes_distinct(self):
        codes = [tuple(gold.gold(5, i)) for i in range(gold.num_codes(5))]
        assert len(set(codes)) == len(codes)

    @pytest.mark.parametrize("bits,bound", [(5, 9), (7, 17), (9, 33)])
    def test_crosscorrelation_bound(self, bits, bound):
        # Gold codes (n odd): cross-correlation bounded by t(n)=2^((n+1)/2)+1.
        a = gold.bipolar(gold.gold(bits, 2))
        b = gold.bipolar(gold.gold(bits, 3))
        fa, fb = np.fft.fft(a), np.fft.fft(b)
        xcorr = np.round(np.real(np.fft.ifft(fa * np.conj(fb))))
        assert np.max(np.abs(xcorr)) <= bound

    @pytest.mark.parametrize("bits,bound", [(5, 9), (7, 17)])
    def test_autocorrelation_sidelobe_bound(self, bits, bound):
        stats = gold.autocorr_stats(gold.gold(bits, 4))
        assert stats["peak"] == 2**bits - 1
        assert stats["max_sidelobe"] <= bound

    def test_invalid_args(self):
        with pytest.raises(ValueError):
            gold.gold(12, 0)
        with pytest.raises(ValueError):
            gold.gold(5, 99)


class TestTemplate:
    def test_example_template_geometry(self):
        # The example config's template: 11-bit code @ 2.4/0.999707 Msps
        # -> 4914 samples (reference example/template.tpl header).
        tpl = template.generate(11, 0, 2.4e6 / 0.999707e6)
        assert len(tpl) == 4914
        assert set(np.unique(tpl)) == {-1.0, 1.0}

    def test_integer_sampler_chip_boundaries(self):
        code = np.array([True, False, True])
        tpl = template.sample_code(code, 2.0)
        np.testing.assert_array_equal(tpl, [1, 1, -1, -1, 1, 1])

    def test_bank_shape(self):
        bank = template.generate_bank(5, [0, 1, 2, 3], 2.0)
        assert bank.shape == (4, 62)
