#!/bin/bash
# Regenerate tests/golden/ by running the ACTUAL reference implementation
# (/root/reference, swkrueger/Thrifty, Python 2) on the repo's example
# capture, via a minimal mechanical py2->py3 shim applied to a throwaway
# copy under /tmp.  The shim is kept out of the package on purpose: it
# only mechanically renames removed py2 builtins / numpy aliases and
# fixes lazy-iterator reuse; it does not alter any numerics.
#
# Shimmed constructs (mechanical, semantics-preserving):
#   .iteritems() -> .items(), xrange -> range, basestring -> str,
#   izip -> zip, np.fromstring -> np.frombuffer, np.bool -> bool,
#   list.sort(cmp=<bool-returning comparator>) -> removed: under py2
#     those sorts were NO-OPS (cmp must return <0 to reorder; a bool is
#     never <0), so removal is the faithful translation -- goldens
#     verified identical either way,
#   binary argparse.FileType for text files -> text mode,
#   bytes line decode in card_reader, list() around reused map/zip
#   iterators and dict views (py2 returned lists).
#
# Inputs: tests/golden/input/*.card (committed; originally produced by
# example/simulate.py seed 20 -> `capture --raw-in --t0 1500000000 -k 0`,
# verified bit-identical to that regeneration at the time.  Round 4
# corrected synth_rx_captures to stamp blocks with the receiver's
# DRIFTED sample clock, so re-running simulate.py now yields
# microsecond-different timestamps on the drifting receivers; the
# committed inputs remain the fixed test vector, and regenerating
# tests/golden/ from them with this script stays byte-identical.)
#
# Usage: scripts/make_reference_goldens.sh [REFERENCE_DIR] [OUT_DIR]
set -euo pipefail

REF=${1:-/root/reference}
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${2:-$REPO/tests/golden}
WORK=$(mktemp -d /tmp/refgolden.XXXXXX)
trap 'rm -rf "$WORK"' EXIT

cp -r "$REF/thrifty" "$WORK/thrifty"
cd "$WORK"

# --- mechanical py2 -> py3 renames (removed builtins / aliases) ---
find thrifty -name '*.py' -print0 | xargs -0 sed -i \
    's/\.iteritems()/\.items()/g; s/\bxrange\b/range/g; s/\bbasestring\b/str/g; s/\bizip\b/zip/g'
sed -i 's/np\.fromstring(/np.frombuffer(/' thrifty/block_data.py
sed -i 's/dtype=np\.bool)/dtype=bool)/' thrifty/beacon_analysis.py

# --- text files opened in binary mode (py2 str == bytes) ---
sed -i "s/FileType('wb')/FileType('w')/g; s/FileType('ab')/FileType('a')/g" \
    thrifty/detect.py thrifty/identify.py thrifty/matchmaker.py
python3 - <<'EOF'
p = 'thrifty/block_data.py'
s = open(p).read()
s = s.replace(
    "        line = stream.readline()\n        if len(line) == 0:",
    "        line = stream.readline()\n"
    "        if isinstance(line, bytes):\n"
    "            line = line.decode('ascii', 'replace')\n"
    "        if len(line) == 0:")
open(p, 'w').write(s)
EOF

# --- py2 sort(cmp=...) and reusable-iterator assumptions ---
# The reference's two cmp-sorts pass a BOOL comparator; py2's timsort
# tests cmp(a,b) < 0, which a bool never satisfies, so both sorts were
# NO-OPS in the authentic py2 run.  The faithful shim removes them
# (verified: on the committed input the outputs are byte-identical
# with or without an actual timestamp sort, since identify already
# emits time-sorted toads).
sed -i 's/toads\.sort(cmp=lambda x, y: x\.timestamp < y\.timestamp)/pass  # py2 bool-cmp sort was a no-op/' \
    thrifty/matchmaker.py
sed -i 's/match = map(int, line\.split())/match = list(map(int, line.split()))/' \
    thrifty/matchmaker.py
sed -i 's/detections\.sort(cmp=lambda x, y: x\[0\]\.timestamp < y\[0\]\.timestamp)/pass  # py2 bool-cmp sort was a no-op/' \
    thrifty/tdoa_est.py
# Same bool-cmp no-op in sorted() form inside build_model_nearest /
# build_model_linear (tdoa_est.py:171,191): py2's sort wrapper tests
# cmp(a,b) < 0, which a bool never satisfies, so every element compares
# "equal" and the stable sort preserves the input order.
python3 - <<'EOF'
p = 'thrifty/tdoa_est.py'
s = open(p).read()
s = s.replace(
    "    pairs = sorted(detection_pairs,\n"
    "                   cmp=lambda x, y: x[0].timestamp < y[0].timestamp)",
    "    pairs = list(detection_pairs)  # py2 bool-cmp sorted was a no-op")
assert 'cmp=' not in s, 'unshimmed cmp= remains in tdoa_est.py'
open(p, 'w').write(s)
EOF
sed -i 's/rx_pos\[rx_pos\.keys()\[0\]\]/rx_pos[next(iter(rx_pos))]/' thrifty/pos_est.py
sed -i 's/rx_coords = np\.array(rx_pos\.values())/rx_coords = np.array(list(rx_pos.values()))/' \
    thrifty/pos_est.py
sed -i "s/rx_pairs = zip(tdoas\['rx0'\], tdoas\['rx1'\])/rx_pairs = list(zip(tdoas['rx0'], tdoas['rx1']))/" \
    thrifty/pos_est.py

# --- run the reference chain on the example capture ---
mkdir -p run && cd run
IN="$REPO/tests/golden/input"
cp "$IN/detector.cfg" "$IN/template.npy" "$IN/freq-map.cfg" \
   "$IN/pos-rx.cfg" "$IN/pos-beacon.cfg" .

export PYTHONPATH="$WORK"
for i in 0 1 2; do
    python3 -m thrifty.cli detect "$IN/rx$i.card" \
        -o "rx$i.toad" --rxid "$i"
done
python3 -m thrifty.cli identify rx0.toad rx1.toad rx2.toad \
    -m freq-map.cfg -o rx.toads
python3 -m thrifty.cli match rx.toads -o rx.match -w 0.02
python3 -m thrifty.cli tdoa rx.toads rx.match -o data.tdoa \
    -r pos-rx.cfg -b pos-beacon.cfg
python3 -m thrifty.cli pos data.tdoa -o data.pos -r pos-rx.cfg

mkdir -p "$OUT"
cp rx0.toad rx1.toad rx2.toad rx.toads rx.match data.tdoa data.pos "$OUT/"

# --- scenario 2: collision / miss semantics (identify + match only) ---
# Inputs: tests/golden/scenario2/input/*.card -- same network, but two
# same-TX transmissions 10 ms apart (match-window collisions resolved
# by the higher-energy rule) and rx1/rx2 captures that stop before the
# last transmission (an rx0-only miss).  The tdoa/pos stages are not
# goldened here: with a single surviving group the reference's own
# load_tdoa_groups crashes on np.loadtxt's 0-d squeeze (a genuine
# upstream bug), and those stages are already goldened by scenario 1.
mkdir -p run2 && cd run2
IN2="$REPO/tests/golden/scenario2/input"
cp "$IN/detector.cfg" "$IN/template.npy" "$IN/freq-map.cfg" .
for i in 0 1 2; do
    python3 -m thrifty.cli detect "$IN2/rx$i.card" \
        -o "rx$i.toad" --rxid "$i"
done
python3 -m thrifty.cli identify rx0.toad rx1.toad rx2.toad \
    -m freq-map.cfg -o rx.toads
python3 -m thrifty.cli match rx.toads -o rx.match -w 0.05
mkdir -p "$OUT/scenario2"
cp rx0.toad rx1.toad rx2.toad rx.toads rx.match "$OUT/scenario2/"

# --- experimental surfaces: interpolators + preshift sync -------------------
# The reference ships CLI drivers for its experimental sub-sample
# interpolators (thrifty/experimental/detect_xcorr_interpol.py,
# detect_carrier_interpol.py) and the pre-shifted-template-bank sync
# (detect_preshift.py).  thrifty-tpu promotes all of these to
# first-class batched options (detect --corr-interp/--carrier-interp/
# --sync-mode preshift); golden .toads from the actual reference pin
# their numerics too, not just the default chain's.  gaussian corr /
# dirichlet carrier are the defaults already covered by scenario 1.
cd "$WORK/run"
mkdir -p "$OUT/interp"
for m in parabolic cosine autocorr maximise none; do
    python3 -m thrifty.experimental.detect_xcorr_interpol \
        --method "$m" "$IN/rx0.card" -o "rx0_corr_$m.toad" --rxid 0
    cp "rx0_corr_$m.toad" "$OUT/interp/"
done
for m in parabolic gaussian cosine none; do
    python3 -m thrifty.experimental.detect_carrier_interpol \
        --method "$m" "$IN/rx0.card" -o "rx0_carrier_$m.toad" --rxid 0
    cp "rx0_carrier_$m.toad" "$OUT/interp/"
done
python3 -m thrifty.experimental.detect_preshift \
    "$IN/rx0.card" -o rx0_preshift.toad --rxid 0
cp rx0_preshift.toad "$OUT/interp/"

# --- alternative beacon clock models ----------------------------------------
# The reference's tdoa CLI hardwires build_model_poly (tdoa_est.py:226),
# but ships three more model builders (nearest :166, linear :186,
# weighted_poly :108) that thrifty-tpu exposes as `tdoa --model`.
# Golden each by calling the reference's own estimate_tdoas with the
# alternative builder on the scenario-1 toads/match (same inputs and
# serialization as the CLI run above).
cd "$WORK/run"
for model in nearest linear weighted-poly; do
    python3 - "$model" <<'PYEOF'
import sys
from thrifty import toads_data, matchmaker, tdoa_est

model = sys.argv[1]
builder = {"nearest": tdoa_est.build_model_nearest,
           "linear": tdoa_est.build_model_linear,
           "weighted-poly": tdoa_est.build_model_weighted_poly}[model]
toads = toads_data.load_toads(open("rx.toads"))
matches = matchmaker.load_matches(open("rx.match"))
rx_pos = tdoa_est.load_pos_config(open("pos-rx.cfg"))
beacon_pos = tdoa_est.load_pos_config(open("pos-beacon.cfg"))
groups, failures = tdoa_est.estimate_tdoas(
    toads, matches, 8, beacon_pos, rx_pos, 2.4e6, model_builder=builder)
print(model, "groups:", len(groups), "failures:", len(failures))
tdoa_est.save_tdoa_groups("data_%s.tdoa" % model, groups)
PYEOF
    cp "data_$model.tdoa" "$OUT/interp/"
done

# --- template tooling -------------------------------------------------------
# template_generate (integer sampler over the Gold code, template_
# generate.py:19-46) and template_extract (best-detection OOK cut,
# template_extract.py:36-70) on the scenario-1 inputs.
mkdir -p "$OUT/tools"
python3 -m thrifty.template_generate 11 0 -o template_generated.npy
python3 -m thrifty.template_extract "$IN/rx0.card" -o template_extracted.npy
cp template_generated.npy template_extracted.npy "$OUT/tools/"

# --- Gold code sequences ----------------------------------------------------
# Pin the Gold-code generator bit-for-bit to the reference (gold.py:
# 26-60, preferred-pair registry + LFSR).  One line per case:
# "<bits> <index> <bitstring>".
python3 - <<'PYEOF'
from thrifty import gold

rows = []
for bits in (5, 6, 7, 9, 10, 11):
    n = 2 ** bits + 1  # family size: 2^n + 1 codes
    for idx in sorted({0, 1, 2, n // 3, n // 2, n - 2, n - 1}):
        seq = gold.gold(bits, idx)
        rows.append("%d %d %s" % (bits, idx,
                                  "".join(str(int(b)) for b in seq)))
open("gold_sequences.txt", "w").write("\n".join(rows) + "\n")
print("gold sequences:", len(rows))
PYEOF
cp gold_sequences.txt "$OUT/"

echo "goldens written to $OUT (+ scenario2, interp, gold_sequences)"
