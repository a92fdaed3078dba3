"""Sync generated counts into the docs (run before a round-end commit).

The query/oracle counts in README.md are the repo's headline claim;
deriving them from the live registry keeps them from going stale the way
hand-edited counts did in rounds 3-4.

Usage::

    python scripts/sync_docs.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as e

    n_q, n_o = len(e.queries()), len(e.oracle_sql())
    readme = "README.md"
    src = open(readme).read()
    new = re.sub(
        r"the public query surface: \d+ named queries",
        f"the public query surface: {n_q} named queries",
        src,
    )
    if new != src:
        open(readme, "w").write(new)
        print(f"README.md: query count -> {n_q}")
    else:
        print(f"README.md: already {n_q}")
    print(f"registry: {n_q} queries, {n_o} oracles, {n_q - n_o} rows-only")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
