#!/usr/bin/env bash
# Refresh the committed steady-state budget snapshot from the latest
# full-suite bench run (run tools/bench.sh on a QUIET box first —
# docs/BUDGET.json is the number BudgetLintSpec holds entries to).
set -euo pipefail
cd "$(dirname "$0")/.."
cp bench.json docs/BUDGET.json
echo "docs/BUDGET.json <- bench.json"
