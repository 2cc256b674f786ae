#!/bin/bash
# (bash, not sh: `wait -n` below is a bashism)
# Streaming detect supervisor for a receiver node / TPU host.
#
# Mirrors the reference's rpi/detect.sh: wait for NTP coarse time sync,
# create a FIFO between the capture process and the detector so neither
# blocks the other, and kill the whole job group if any stage dies.

set -e

CONFIG=${CONFIG:-/etc/thrifty-tpu/detector.cfg}
OUTPUT=${OUTPUT:-/var/lib/thrifty-tpu/rx.toad}
FIFO=${FIFO:-/tmp/thrifty-tpu-capture.fifo}

# The output directory must exist (systemd's StateDirectory covers the
# default; this covers custom OUTPUT paths and standalone runs).
mkdir -p "$(dirname "$OUTPUT")"
CAPTURE_CMD=${CAPTURE_CMD:-"rtl_sdr -f 433.83M -s 2.4M -g 29 -"}

# Wait for NTP synchronisation: the matchmaker needs wall clocks aligned
# to well under its 0.2 s window.
if command -v chronyc >/dev/null 2>&1; then
    until chronyc waitsync 1 0.1 >/dev/null 2>&1; do
        echo "waiting for NTP sync..." >&2
        sleep 5
    done
elif command -v ntp-wait >/dev/null 2>&1; then
    ntp-wait -v || true
fi

# Networked SDR mode: with RTL_TCP=host:port set, skip the FIFO/capture
# subprocess entirely -- detect pulls the live stream itself and
# survives radio-server restarts.
# DEVICE_UNFOLD=1: overlap-save on the chip (1.43x less host->device
# traffic, no host unfold); incompatible with CARD_OUT (needs host
# rows), so only applied when no card tee is requested.
UNFOLD=()
if [ -n "$DEVICE_UNFOLD" ] && [ -z "$CARD_OUT" ]; then
    UNFOLD=(--device-unfold)
fi

if [ -n "$RTL_TCP" ]; then
    exec python -m thrifty_tpu.cli detect --rtl-tcp "$RTL_TCP" \
        --reconnect "${RECONNECT:-10}" -a "$OUTPUT" -c "$CONFIG" --quiet \
        "${UNFOLD[@]}" ${CARD_OUT:+--card-out "$CARD_OUT"}
fi

rm -f "$FIFO"
mkfifo "$FIFO"

cleanup() {
    # `kill 0` signals the whole process group INCLUDING this shell:
    # ignore the re-delivered INT/TERM (re-entering cleanup would
    # livelock the shutdown until systemd's TimeoutStopSec SIGKILL;
    # defaulting it would kill the shell before the FIFO is removed).
    trap '' INT TERM
    trap - EXIT
    kill 0 2>/dev/null || true
    rm -f "$FIFO"
}
trap cleanup EXIT INT TERM

# capture -> FIFO -> detect (append mode: restartable mid-capture).
# CARD_OUT (optional): also archive corr-detected blocks as a sparse
# .card capture for later re-analysis (fastdet's tee).
EXTRA=()
if [ -n "$CARD_OUT" ]; then
    EXTRA=(--card-out "$CARD_OUT")
fi
$CAPTURE_CMD > "$FIFO" &
python -m thrifty_tpu.cli detect "$FIFO" --raw -a "$OUTPUT" \
    -c "$CONFIG" --quiet "${UNFOLD[@]}" "${EXTRA[@]}" &

wait -n
echo "pipeline stage exited; shutting down" >&2
