#!/bin/bash
# Full test matrix (default `pytest -q` excludes @slow to stay <10 min).
# Runs the fast tier and the slow tier as separate pytest invocations so a
# CI window can bound each; pass extra args through (e.g. -x, -k pattern).
set -e
cd "$(dirname "$0")/.."
echo "=== fast tier (default: -m 'not slow') ==="
python -m pytest tests/ -q "$@"
echo "=== slow tier (-m slow) ==="
python -m pytest tests/ -q -m slow --override-ini addopts= "$@"
