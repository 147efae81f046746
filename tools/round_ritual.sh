#!/bin/sh
# End-of-round evidence ritual (VERDICT r3 item 9): run the FULL
# verification surface — not just the driver's 50-query sample — and
# leave dated artifacts the judge can check.
#
#   sh tools/round_ritual.sh <round-number>
#
# Produces/updates:
#   SELFCHECK_r<N>.md   full-catalog selfcheck summary at sf0.01
#   /tmp/ritual_*       raw logs (pytest, selfcheck, bench)
set -e
ROUND="${1:?usage: round_ritual.sh <round-number>}"
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q 2>&1 | tail -2 | tee /tmp/ritual_pytest.log

echo "== full selfcheck (sf0.01) =="
python tools/selfcheck.py /root/testdata/sf0.01 \
  > /tmp/ritual_selfcheck.log 2>&1 || { tail -5 /tmp/ritual_selfcheck.log; exit 1; }
tail -2 /tmp/ritual_selfcheck.log

echo "== bench (sf0.1) =="
python bench.py 2>/dev/null | tail -1 | tee /tmp/ritual_bench.json

python tools/write_selfcheck_md.py "$ROUND" /tmp/ritual_selfcheck.log
echo "ritual complete: SELFCHECK_r0${ROUND}.md refreshed"
