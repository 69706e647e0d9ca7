"""End-to-end product workflows: calcDelays, GUNW corrections, GNSS merging."""
