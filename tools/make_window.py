"""Generate the driver-facing query order for ``registry._PRIORITY``.

The driver's correctness harness checks the FIRST 50 registered queries
per round, so the order IS the evidence-rotation policy.  This tool makes
the composition mechanical (VERDICT r7 Next #5): it unions the committed
``CORRECTNESS_r*.json`` driver rows, sorts every registered query id by

    (latest-status-FAIL/ERR first, zero-evidence next
     [DEFERRED_TO_NEXT_WINDOW last within those],
     oldest latest-evidence round, registration order)

via ``registry.compute_priority`` (the single implementation the pytest
guard also calls), and prints the full tuple to paste over
``registry._PRIORITY`` — plus a window summary so a miscount is visible
before it is committed.

Usage:

    python tools/make_window.py [--through-round N]

``--through-round`` pins the evidence basis (defaults to the max round
present on disk); paste the printed basis into
``registry._PRIORITY_BASIS_ROUND`` alongside the tuple.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

WINDOW = 50


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--through-round", type=int, default=None)
    args = ap.parse_args()

    from kusuma_metamorph_etl_spark import registry

    ev = registry.evidence_status(args.through_round)
    basis = args.through_round
    if basis is None:
        basis = max((rnd for rnd, _ in ev.values()), default=0)
        ev = registry.evidence_status(basis)
    order = registry.compute_priority(basis)

    print(f"# Output of `python tools/make_window.py` at basis round {basis} —")
    print("# regenerate and re-paste each round after the driver lands")
    print("# CORRECTNESS_r{N}.json.")
    print("_PRIORITY: tuple[str, ...] = (")
    for i, name in enumerate(order):
        marks = []
        if name not in ev:
            marks.append("zero-evidence")
        elif ev[name][1]:
            marks.append(f"RED(r{ev[name][0]})")
        else:
            marks.append(f"r{ev[name][0]}")
        if name in registry.DEFERRED_TO_NEXT_WINDOW:
            marks.append("DEFERRED")
        cut = "  # ---- window cut ----" if i == WINDOW else ""
        if cut:
            print(cut)
        print(f'    "{name}",')
    print(")")

    window = order[:WINDOW]
    zero = [n for n in order if n not in ev]
    red = [n for n in order if n in ev and ev[n][1]]
    spilled = [n for n in zero if n not in window]
    red_spilled = [n for n in red if n not in window]
    print(
        f"\n# summary: {len(order)} registered; {len(red)} latest-red;"
        f" {len(zero)} zero-evidence;",
        file=sys.stderr,
    )
    print(
        f"# window holds {len([n for n in window if n in red])} red +"
        f" {sum(1 for n in window if n not in ev)} zero-evidence rows;"
        f" spilled past the cut: {spilled}",
        file=sys.stderr,
    )
    if red_spilled:
        print(f"# ERROR: latest-red rows outside the window: {red_spilled}", file=sys.stderr)
        return 1
    bad = [n for n in spilled if n not in registry.DEFERRED_TO_NEXT_WINDOW]
    if bad:
        print(f"# ERROR: spilled rows not in DEFERRED_TO_NEXT_WINDOW: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
