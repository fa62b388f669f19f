#!/usr/bin/env bash
# One-command verification: tests -> DuckDB oracle parity -> bench.
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -x -q
echo "== Spark vs DuckDB oracle parity (sf0.01) =="
python scripts/check_oracle.py
echo "== bench (one JSON line) =="
python bench.py
