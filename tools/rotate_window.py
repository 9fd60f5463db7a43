"""Compute the recommended next driver window (_WINDOW) from the
CORRECTNESS_r*.json countersign history.

Rotation policy (VERDICT r8 item 1, applied from round 9 on):
  1. oracles NEVER countersigned, or whose oracle/semantics changed
     this round (pass their keys via --new), lead the window;
  2. then the OLDEST-countersigned oracles, sorted (round, key), fill
     the remaining slots (50 total);
  3. everything else stays behind the window under the local parity
     gate.

Prints the 50 keys as a ready-to-paste Python list plus the queue of
next-oldest keys for the round after. Purely advisory — _WINDOW in
__spark_entry__.py stays the source of truth (tests pin that its 50
entries are oracle-backed).

Usage:
    python tools/rotate_window.py [--new key1,key2,...]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as EN


def countersigns() -> dict[str, int]:
    """Latest driver-green round per query key."""
    latest: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        with open(f) as fh:
            d = json.load(fh)
        for k, v in d.items():
            if (isinstance(v, dict) and v.get("rows_match")
                    and v.get("schema_match") and v.get("hash_match")
                    and not v.get("err")):
                latest[k] = rnd
    return latest


def main() -> int:
    new = []
    if len(sys.argv) > 2 and sys.argv[1] == "--new":
        new = [k for k in sys.argv[2].split(",") if k]
    oracles = set(EN.oracle_sql())
    signs = countersigns()
    unknown = [k for k in new if k not in oracles]
    if unknown:
        print(f"--new keys without an oracle: {unknown}")
        return 2
    never = sorted(k for k in oracles if k not in signs and k not in new)
    lead = [*new, *never]
    rest = sorted(((r, k) for k, r in signs.items()
                   if k in oracles and k not in lead),
                  key=lambda rk: (rk[0], rk[1]))
    window = lead + [k for _, k in rest]
    win50, queue = window[:50], window[50:60]
    print(f"# lead: {len(new)} changed + {len(never)} never-signed; "
          f"then oldest countersigns")
    body = ", ".join(f'"{k}"' for k in win50)
    print("_WINDOW = [\n" + textwrap.indent(textwrap.fill(body, 68),
                                            "    ") + ",\n]")
    print(f"# queued next (oldest 10 beyond slot 50): "
          f"{[k for k in queue]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
