"""Guard for the generated driver window (VERDICT r7 Next #5).

``registry._PRIORITY`` is pasted output of ``tools/make_window.py``; these
tests recompute the same order at the pinned basis round and fail on any
hand-edit drift, miscount, or forgotten regeneration after new
registrations — the error class the r6 ADVICE caught once by hand.
No Spark session needed.
"""

from __future__ import annotations

from kusuma_metamorph_etl_spark import registry

WINDOW = 50


def test_priority_matches_generated_order():
    computed = registry.compute_priority(registry._PRIORITY_BASIS_ROUND)
    assert registry._PRIORITY == computed, (
        "registry._PRIORITY is stale — regenerate with "
        "`python tools/make_window.py --through-round "
        f"{registry._PRIORITY_BASIS_ROUND}` and re-paste"
    )


def test_priority_is_a_permutation_of_the_registry():
    names = set(registry.queries())
    assert set(registry._PRIORITY) == names
    assert len(registry._PRIORITY) == len(names)


def test_latest_red_rows_lead_the_window():
    """A row whose LATEST driver evidence is FAIL/ERR must sit at the
    very head of the window — ahead of zero-evidence rows — so a fix
    gets re-verified the round it lands (VERDICT r9 Next #2: the fixed
    dq_null_profile sat driver-red a whole round under the old key)."""
    ev = registry.evidence_status(registry._PRIORITY_BASIS_ROUND)
    red = [n for n in registry._PRIORITY if n in ev and ev[n][1]]
    assert red == list(registry._PRIORITY[: len(red)]), red
    assert len(red) <= WINDOW


def test_window_front_loads_zero_evidence_rows():
    """Every zero-evidence, non-deferred query (at the basis round) sits
    inside the 50-row driver window; everything spilled past the cut is
    explicitly deferred with a named sibling."""
    ev = registry.evidence_rounds(registry._PRIORITY_BASIS_ROUND)
    zero = [n for n in registry._PRIORITY if n not in ev]
    window = set(registry._PRIORITY[:WINDOW])
    spilled = [n for n in zero if n not in window]
    assert all(n in registry.DEFERRED_TO_NEXT_WINDOW for n in spilled), spilled
    # deferral is a pressure valve, not a parking lot: everything
    # spilled must fit comfortably in the NEXT 50-slot window with room
    # left for re-rotating stale evidence (15 caps the spill at under a
    # third of a window)
    assert len(spilled) <= 15


def rotation_budget() -> int:
    """Rounds a full rotation takes: ceil(registered rows / 50 slots).
    Derived, not pinned, so registry growth widens the budget by the
    true arithmetic instead of silently starving the guard."""
    n = len(registry._PRIORITY)
    return -(-n // WINDOW)


def test_overage_evidence_rows_are_seated_in_the_window():
    """Evidence-age guard (VERDICT r10 Next #2): any row whose latest
    driver evidence is >= the rotation budget behind the basis round
    must sit INSIDE the 50-row window, so it gets re-verified this round
    instead of aging further.  The three flagship marts reached age 5
    (r5 evidence at basis 10) before this guard existed — staleness is
    now a build break, not a judge finding."""
    budget = rotation_budget()
    basis = registry._PRIORITY_BASIS_ROUND
    ev = registry.evidence_rounds(basis)
    window = set(registry._PRIORITY[:WINDOW])
    registered = set(registry.queries())
    # Retired/consolidated ids (e.g. win_lag_lead → win_rank_family in
    # r13) keep their old CORRECTNESS evidence but can never be
    # re-proven — the family row that replaced them carries the rotation
    # duty, so the age guard applies to registered rows only.
    overage = [
        n for n, rnd in ev.items() if n in registered and basis - rnd >= budget
    ]
    unseated = [n for n in overage if n not in window]
    assert not unseated, (
        f"rows with evidence older than the {budget}-round rotation "
        f"budget are outside the driver window: {unseated} — regenerate the "
        "window (or shrink the registry growth rate)"
    )
    # a full rotation must stay visitable inside the build: if the
    # registry ever needs more than 6 rounds per cycle, slot pressure is
    # a design problem to solve deliberately, not a constant to bump
    assert budget <= 6, f"rotation budget {budget} rounds — registry too large"


MAX_EVIDENCE_AGE = 6


def test_registry_under_rotation_ceiling():
    """Retire-one-per-addition policy, enforced (VERDICT r11 Next #2):
    the evidence-age guard hard-caps the rotation budget at
    MAX_EVIDENCE_AGE rounds, so the registry cannot grow past
    50 × MAX_EVIDENCE_AGE rows (300) without making that guard
    unsatisfiable.  Any registration that would cross the ceiling must
    retire or consolidate an existing row in the same commit (and name
    it in the commit message)."""
    ceiling = WINDOW * MAX_EVIDENCE_AGE
    n = len(registry.queries())
    assert n <= ceiling, (
        f"registry has {n} rows — past the {ceiling}-row rotation "
        "ceiling; retire or consolidate a row per addition "
        "(registry.py policy note)"
    )


def test_no_evidence_bulge_forms():
    """Bulge guard (VERDICT r12 Next #2): the 49-row r8-evidence cohort
    would have consumed the ENTIRE r14 window, leaving zero headroom for
    new registrations two rounds running.  Two assertions keep that from
    silently re-forming:

    1. *Next-round headroom*: after this round's window lands (project
       every window row to basis+1), the cohort coming DUE next round —
       rows that would hit MAX_EVIDENCE_AGE staleness — must fit in 44
       slots, leaving >= 6 for next round's zero-evidence registrations.
    2. *Full-cycle feasibility*: simulate the oldest-first rotation one
       full MAX_EVIDENCE_AGE cycle forward at window capacity and assert
       the due cohort never exceeds the window — i.e. the age guard
       stays satisfiable without any consolidation emergency."""
    basis = registry._PRIORITY_BASIS_ROUND
    registered = set(registry._PRIORITY)
    ev = {
        n: rnd
        for n, rnd in registry.evidence_rounds(basis).items()
        if n in registered
    }
    window = registry._PRIORITY[:WINDOW]
    for n in window:
        ev[n] = basis + 1  # this round's driver run stamps the window
    # zero-evidence rows outside the window sort ahead of everything
    # next round (compute_priority puts them before evidenced rows)
    for n in registered:
        ev.setdefault(n, basis + 1 - MAX_EVIDENCE_AGE)

    due_next = [n for n, e in ev.items() if (basis + 2) - e >= MAX_EVIDENCE_AGE]
    assert len(due_next) <= WINDOW - 6, (
        f"{len(due_next)} rows come due in round {basis + 2} — the window "
        "would have <6 slots of registration headroom; pre-rotate or "
        f"consolidate within the cohort: {sorted(due_next)[:10]}…"
    )

    sim = dict(ev)
    for rnd in range(basis + 2, basis + 2 + MAX_EVIDENCE_AGE):
        due = [n for n, e in sim.items() if rnd - e >= MAX_EVIDENCE_AGE]
        assert len(due) <= WINDOW, (
            f"rotation infeasible: {len(due)} rows due at simulated "
            f"round {rnd} exceed the {WINDOW}-slot window"
        )
        for n in sorted(sim, key=sim.__getitem__)[:WINDOW]:
            sim[n] = rnd


def test_assert_driver_hashable_rejects_exactly_the_driver_crash_types():
    """The local checker's schema gate must reject array/map/struct
    output columns (the cell types the driver's pandas canonicalizer
    crashes on — r9 driver-ERRs) and pass every scalar type.  This is
    the gate the r10 ADVICE asked to be the single source of truth after
    the row-level pandas dry-run was dropped (object columns of lists
    sort without raising on common pandas versions)."""
    import sys
    from pathlib import Path

    import pytest
    from pyspark.sql import types as T

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from check_correctness import assert_driver_hashable

    scalars = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
            T.StructField("d", T.DateType()),
            T.StructField("e", T.TimestampType()),
            T.StructField("f", T.BooleanType()),
            T.StructField("g", T.DecimalType(38, 6)),
            T.StructField("h", T.BinaryType()),
        ]
    )
    assert_driver_hashable(scalars)  # must not raise
    for bad in (
        T.ArrayType(T.LongType()),
        T.MapType(T.StringType(), T.LongType()),
        T.StructType([T.StructField("x", T.LongType())]),
    ):
        schema = T.StructType(
            [T.StructField("ok", T.LongType()), T.StructField("bad", bad)]
        )
        with pytest.raises(TypeError, match="bad"):
            assert_driver_hashable(schema)


def test_err_companions_share_their_windows():
    """A rows-only query and its `_err` oracle gate must land in the same
    driver window — the gate is what makes the rows-only row evidence."""
    names = list(registry._PRIORITY)
    for i, name in enumerate(names):
        if not name.endswith("_err"):
            continue
        base = name[: -len("_err")]
        if base not in registry.REGISTRY:
            continue
        if registry.REGISTRY[base].oracle is not None:
            continue  # base is oracle-checked on its own
        same_side = (names.index(base) < WINDOW) == (i < WINDOW)
        assert same_side, f"{base} and {name} straddle the window cut"


def test_cut_repair_demotes_a_straddling_pair(monkeypatch):
    """Unit-pin the compute_priority cut-repair pass on a synthetic
    registry where a glued rows-only/_err pair lands exactly on
    positions 49/50 (first live hit: r11, sim_lsh_topk): the pair must
    be demoted past the cut as a unit, the first following singleton
    promoted into the freed slot, and the window stay exactly 50 rows."""
    singles = [f"q{i:03d}" for i in range(49)]
    names = singles + ["pair", "pair_err", "tail_a", "tail_b"]
    fake = {
        n: registry.QuerySpec(fn=None, oracle=None if n == "pair" else "SELECT 1")
        for n in names
    }
    monkeypatch.setattr(registry, "REGISTRY", fake)
    monkeypatch.setattr(registry, "_REG_BY_MODULE", {"x.queries.core": names})
    monkeypatch.setattr(registry, "_LOADED", True)
    # basis round 0: no CORRECTNESS file matches the synthetic names, so
    # every row is zero-evidence and sorts in registration order — the
    # pair straddles at 49/50 before repair
    order = list(registry.compute_priority(0))
    assert len(order) == len(names)
    assert order[49] == "tail_a"  # promoted singleton
    assert order[50:52] == ["pair", "pair_err"]  # pair leads the spill
    assert order[52] == "tail_b"
    p, e = order.index("pair"), order.index("pair_err")
    assert (p < registry.WINDOW) == (e < registry.WINDOW)
