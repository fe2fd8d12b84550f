#!/bin/bash
# DP percam A/B launcher: serial legs, PID file for clean termination
# (never kill by pattern — use: kill $(cat /tmp/dp_ab.pid))
echo $$ > /tmp/dp_ab.pid
cd "$(dirname "$0")/.."
S3G_LOG_EVERY=10 timeout 9000 python scripts/ab_dp_percam.py --leg dpp \
    > /tmp/dp_ab_dpp.log 2>&1
S3G_LOG_EVERY=10 timeout 9000 python scripts/ab_dp_percam.py --leg dpn \
    > /tmp/dp_ab_dpn.log 2>&1
echo DONE > /tmp/dp_ab.done
