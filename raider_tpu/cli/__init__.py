"""Command-line interface (capability parity: reference tools/RAiDER/cli/)."""
