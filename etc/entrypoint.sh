#!/bin/sh
# HyP3 container entrypoint (capability parity: reference tools/RAiDER/etc/entrypoint.sh)
set -e
python -m raider_tpu.cli ++process calcDelaysGUNW "$@"
