"""Pre-freeze evidence check (VERDICT r11 task 5).

Run this in the SAME commit that freezes round evidence: it fails
when the newest STRICT_PARITY_r{N}.log was swept against a registry
smaller than the live one (an entry registered after the sweep froze
would silently skip verification — exactly how
``substring_span_removal_raw`` dodged the r11 sweep).

Checks:
1. newest STRICT_PARITY log records ``registry_count=`` (logs from
   r12 onward do) and it equals the LIVE registry count;
2. the log's "strictly clean" line covers that same count;
3. BENCH_ALL.json (if present) was recorded at the live registry
   count too.

Exit 0 = evidence is current; exit 1 = re-run the sweep.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main() -> int:
    from legate_dataframe_spark.plans.registry import QUERIES

    live = len(QUERIES)
    ok = True
    logs = sorted(glob.glob(os.path.join(here, "STRICT_PARITY_r*.log")),
                  key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    if not logs:
        print("no STRICT_PARITY logs found")
        return 1
    newest = logs[-1]
    text = open(newest).read()
    m = re.search(r"registry_count=(\d+)", text)
    if m is None:
        print(f"{os.path.basename(newest)}: records no "
              f"registry_count (pre-r12 log) — re-run the sweep")
        ok = False
    elif int(m.group(1)) != live:
        print(f"{os.path.basename(newest)}: swept at registry_count="
              f"{m.group(1)}, live registry has {live} — STALE")
        ok = False
    m2 = re.search(r"(\d+)/(\d+) strictly clean", text)
    if m2 and int(m2.group(2)) != live:
        print(f"{os.path.basename(newest)}: clean line covers "
              f"{m2.group(2)} entries, live registry has {live} — "
              f"STALE")
        ok = False
    ba = os.path.join(here, "BENCH_ALL.json")
    if os.path.exists(ba):
        rec = json.load(open(ba))
        n = rec.get("registry_count", len(rec.get("queries", {})))
        if n != live:
            print(f"BENCH_ALL.json covers {n} entries, live registry "
                  f"has {live} — STALE")
            ok = False
    print(f"{'OK' if ok else 'FAIL'}: live registry_count={live}, "
          f"newest log={os.path.basename(newest)}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
