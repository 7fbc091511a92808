"""Global-window allowlist guard (r8 verdict, What's wrong #3): a
``Window.orderBy(...)`` spec with no ``partitionBy`` funnels the whole
input through ONE task — acceptable only for the documented bounded
tiers, where the input is already top-k-, distinct-domain-, or
shortlist-sized. That set was previously enforced by convention; this
test pins it structurally so a new unbounded global window cannot slip
in unreviewed: adding one means either partitioning it or consciously
extending the allowlist below with its boundedness argument.

No runtime needed — the guard is a source scan for the only spelling
the package uses (`Window.orderBy(`; Window is never import-aliased,
and `partitionBy()` with zero args is never written).
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dbt_nlp_sqlizer_team04_spark",
)

# file (package-relative) -> expected count of Window.orderBy( sites,
# each justified:
#   operators/relational.py  1  q153 exact-NTILE tier: global-order is
#                               the operator's contract; the scalable
#                               twin is the q156 sketch histogram.
#   operators/text.py        2  q71 vocab head: ranks the term-frequency
#                               table AFTER the top-k cut (vocab-sized).
#   operators/retrieval.py   2  hybrid RRF rank fusion: ranks ride the
#                               two bounded shortlists (<= 2k rows).
#   operators/documents.py   2  $bucketAuto: frames the DISTINCT-value
#                               table (bounded by the value domain),
#                               not the document stream.
ALLOWED = {
    "operators/relational.py": 1,
    "operators/text.py": 2,
    "operators/retrieval.py": 2,
    "operators/documents.py": 2,
}

_SITE = re.compile(r"Window\s*\.\s*orderBy\s*\(")


def _scan() -> dict[str, int]:
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            with open(path, encoding="utf-8") as f:
                n = len(_SITE.findall(f.read()))
            if n:
                found[rel] = n
    return found


def test_global_window_sites_are_exactly_the_allowlist():
    found = _scan()
    assert found == ALLOWED, (
        "unpartitioned Window.orderBy sites drifted from the documented "
        f"bounded tiers: found={found} allowed={ALLOWED} — partition the "
        "new window or extend the allowlist WITH its boundedness "
        "argument"
    )


def test_no_window_alias_evades_the_scan():
    """The scan keys on the literal `Window.` spelling — assert the
    package never aliases the Window class, so the allowlist cannot be
    bypassed by renaming."""
    bad: list[str] = []
    alias = re.compile(
        r"(import\s+Window\s+as\s+\w+|from\s+pyspark\.sql(\.window)?"
        r"\s+import\s+[^\n]*\bWindow\s+as\s+\w+)"
    )
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                path = os.path.join(root, fn)
                with open(path, encoding="utf-8") as f:
                    if alias.search(f.read()):
                        bad.append(os.path.relpath(path, PKG))
    assert bad == [], f"Window import-aliased (evades the guard): {bad}"
