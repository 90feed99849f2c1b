#!/usr/bin/env bash
# Snapshot-discipline guard (VERDICT r13 item 7).
#
# The r13 failure class: a registry edit landed AFTER the end-of-round
# artifacts were generated, leaving pytest's window-discipline pin and
# doc_check's COVERAGE/PLANS/SWEEP cross-references stale at HEAD.
# Run this AFTER the last registry edit and BEFORE the final commit of
# a round (and after any commit that touches __spark_entry__.py's
# queries()/oracle_sql() literals):
#
#   bash scripts/snapshot_check.sh
#
# Exits non-zero if any doc artifact or the pinned driver window
# disagrees with the shipped registry.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== doc_check (COVERAGE/PLANS/SWEEP x registry cross-reference) =="
python scripts/doc_check.py

echo "== registry window discipline (pinned driver window vs shipped order) =="
python -m pytest tests/test_plan_health.py::test_registry_window_discipline -q

echo "snapshot_check: ALL GREEN"
