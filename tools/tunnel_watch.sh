#!/bin/bash
# Polls the axon relay port (the round-2 outage signature is 8082/8083
# refusing connections); when it accepts, double-checks with a real
# jax.devices() probe and launches the round-3 measurement queue.
# Logs to tools/tunnel_watch.log. Touch /tmp/no_tpu_auto to suppress the
# auto-launch (e.g. while pytest owns the CPUs).
cd "$(dirname "$0")/.." || exit 1
LOG=tools/tunnel_watch.log

while true; do
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
        echo "$(date -u +%FT%TZ) port 8082 open" >> "$LOG"
        touch /tmp/tunnel_up
        if timeout 300 python3 -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
            echo "$(date -u +%FT%TZ) jax probe OK" >> "$LOG"
            if [ ! -e /tmp/no_tpu_auto ]; then
                echo "$(date -u +%FT%TZ) starting hw_round3.sh" >> "$LOG"
                bash tools/hw_round3.sh >> "$LOG" 2>&1
                echo "$(date -u +%FT%TZ) hw_round3.sh exited rc=$?" >> "$LOG"
                touch /tmp/hw_round3_done
                exit 0
            fi
            echo "$(date -u +%FT%TZ) auto-launch suppressed" >> "$LOG"
        else
            echo "$(date -u +%FT%TZ) port open but jax probe failed/hung" >> "$LOG"
            rm -f /tmp/tunnel_up
        fi
    fi
    sleep 60
done
