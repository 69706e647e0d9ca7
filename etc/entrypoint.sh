#!/bin/sh
# Container entrypoint (capability parity: reference tools/RAiDER/etc/entrypoint.sh):
# pass everything to the ++process dispatcher, like upstream's
# `exec python -um RAiDER.cli "$@"`.
set -e
exec python -um raider_tpu.cli "$@"
