"""Data-quality gates (`dq_duplicate_gate` + friends, SURVEY.md §2.9).

The reference's distinctive runtime check is a fail-fast primary-key
uniqueness gate: ``groupBy(pk).agg(count('*')).filter(cnt > 1)`` and raise
(``/root/reference/ETL-Airflow/dags/tasks/transform_utils.py:79-92``).  Its
error loses the offending keys (bug B5) and the full-aggregation plan keeps
every group even though the gate only needs *one* violation.  The engine:

* reports sample offending keys + counts in the exception,
* short-circuits with ``limit(sample)`` — Catalyst stops the scan early
  once enough violating groups are found (LocalLimit above the agg),
* leaves the input plan untouched (pure check, no caching side effects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DuplicateKeyError(Exception):
    """Primary-key uniqueness violated; carries sample keys + counts."""

    def __init__(self, keys: list[str], samples: list[dict]):
        self.keys = keys
        self.samples = samples
        preview = ", ".join(str(s) for s in samples[:5])
        super().__init__(
            f"duplicate primary key(s) on {keys}: {preview}"
            + (" …" if len(samples) > 5 else "")
        )


class SchemaMismatchError(Exception):
    pass


class NullPolicyError(Exception):
    pass


class RowCountError(Exception):
    pass


class FreshnessError(Exception):
    pass


def find_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Groups violating PK uniqueness, with their multiplicities.

    Scale note: a straight ``groupBy(pk).count()`` — partial (map-side)
    aggregation makes this one shuffle of already-collapsed groups.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("duplicate_count"))
        .filter(F.col("duplicate_count") > 1)
    )


def duplicate_gate(df: DataFrame, keys: list[str], sample: int = 20) -> DataFrame:
    """Raise :class:`DuplicateKeyError` if ``keys`` are not unique in ``df``.

    Returns ``df`` unchanged so it composes as a pipeline stage.
    """
    violations = find_duplicates(df, keys).limit(sample).collect()
    if violations:
        raise DuplicateKeyError(keys, [row.asDict() for row in violations])
    return df


def assert_schema(df: DataFrame, expected_columns: list[str]) -> DataFrame:
    """Fail fast when the frame's columns deviate from the declared contract
    (the reference's implicit contract is its rename-normalize step;
    SURVEY.md §1)."""
    actual = list(df.columns)
    if actual != list(expected_columns):
        raise SchemaMismatchError(
            f"schema contract violated: expected {list(expected_columns)}, got {actual}"
        )
    return df


def row_count_gate(
    df: DataFrame, min_rows: int = 1, max_rows: int | None = None
) -> DataFrame:
    """Fail when the frame's row count leaves [min_rows, max_rows] — the
    empty-feed / exploding-feed tripwire a daily pipeline needs before
    overwriting its raw layer.

    Scale note: when only the lower bound matters, ``limit(min_rows)``
    caps the scan instead of counting everything.
    """
    if max_rows is None:
        seen = df.limit(min_rows).count()
        if seen < min_rows:
            raise RowCountError(f"expected ≥ {min_rows} rows, found {seen}")
        return df
    n = df.count()
    if not (min_rows <= n <= max_rows):
        raise RowCountError(
            f"row count {n} outside [{min_rows}, {max_rows}]"
        )
    return df


def freshness_gate(
    df: DataFrame,
    ts_col: str,
    max_age: str,
    now: str | None = None,
) -> DataFrame:
    """Fail when the newest ``ts_col`` value is older than ``max_age``
    (e.g. ``"2 hours"``) relative to ``now`` (injectable for tests; wall
    clock otherwise) — the stalled-upstream tripwire.
    """
    now_expr = F.current_timestamp() if now is None else F.lit(now).cast("timestamp")
    row = df.select(
        F.max(ts_col).alias("newest"),
        (now_expr - F.expr(f"INTERVAL {max_age}")).alias("cutoff"),
    ).collect()[0]
    if row["newest"] is None or row["newest"] < row["cutoff"]:
        raise FreshnessError(
            f"newest {ts_col} = {row['newest']} is older than {max_age} "
            f"(cutoff {row['cutoff']})"
        )
    return df


def null_policy(df: DataFrame, not_null: list[str], sample: int = 20) -> DataFrame:
    """Raise :class:`NullPolicyError` if any NOT-NULL mart column holds
    nulls (test-strategy property 4, SURVEY.md §5)."""
    predicate = None
    for column in not_null:
        check = F.col(column).isNull()
        predicate = check if predicate is None else (predicate | check)
    if predicate is None:
        return df
    offenders = df.filter(predicate).limit(sample).collect()
    if offenders:
        raise NullPolicyError(
            f"null values in NOT-NULL columns {not_null}: "
            f"{[row.asDict() for row in offenders[:5]]}"
        )
    return df


class VolumeAnomalyError(Exception):
    """Today's row count is a statistical outlier versus history."""


def volume_anomaly_gate(
    df: DataFrame,
    history_counts: DataFrame,
    z: float = 3.0,
    count_col: str = "n_rows",
    min_history: int = 7,
) -> DataFrame:
    """Fail when the frame's row count sits more than ``z`` standard
    deviations from the mean of ``history_counts`` (a tiny per-run count
    table the pipeline appends to — e.g. one row per DAY_DT).

    The gate the static ``row_count_gate`` bounds cannot give: a feed
    that doubles or halves is anomalous RELATIVE to its own history even
    when inside absolute limits.  With fewer than ``min_history`` runs
    the gate passes open (a 2-run stddev trips on noise); a zero-variance
    history accepts only an exact repeat.

    Cost: one bounded 2-value aggregate over the (tiny) history table +
    one count of ``df`` — no wide operation.
    """
    stats = history_counts.agg(
        # count of NON-NULL history values: all-NULL rows would leave
        # mu/sigma None below while k counted them, and the full count
        # of df must not run before the pass-open check (a wasted
        # 100 TB scan when history is too short — r8 review)
        F.count(count_col).alias("k"),
        F.avg(count_col).alias("mu"),
        F.stddev_pop(count_col).alias("sigma"),
    ).first()
    if stats["k"] < min_history:
        return df
    n = df.count()
    mu, sigma = stats["mu"], stats["sigma"]
    if sigma == 0.0:
        if n != mu:
            raise VolumeAnomalyError(
                f"row count {n} != constant history {mu:.0f}"
            )
        return df
    score = abs(n - mu) / sigma
    if score > z:
        raise VolumeAnomalyError(
            f"row count {n} is {score:.1f}σ from history mean {mu:.0f} "
            f"(σ={sigma:.0f}, z-limit {z})"
        )
    return df


class ReferentialIntegrityError(Exception):
    pass


def find_orphans(
    fact: DataFrame, dim: DataFrame, fk: str, pk: str | None = None
) -> DataFrame:
    """Fact rows whose foreign key has no match in the dimension (null FKs
    are not orphans — null means 'no reference', not 'bad reference').

    Plan: left_anti against the DISTINCT key projection of the dim — the
    anti-join shuffles keys, never dim payload, and broadcasts when the
    key set is small."""
    keys = dim.select(F.col(pk or fk).alias(fk)).distinct()
    return fact.filter(F.col(fk).isNotNull()).join(keys, on=fk, how="left_anti")


def referential_gate(
    fact: DataFrame,
    dim: DataFrame,
    fk: str,
    pk: str | None = None,
    sample: int = 20,
) -> DataFrame:
    """Raise :class:`ReferentialIntegrityError` when fact rows reference a
    key absent from the dimension — the FK companion of the reference's
    PK `duplicate_gate` (`transform_utils.py:79-92`); pass-through when
    clean."""
    offenders = find_orphans(fact, dim, fk, pk).limit(sample).collect()
    if offenders:
        raise ReferentialIntegrityError(
            f"fact rows reference missing {fk}: "
            f"{[row.asDict() for row in offenders[:5]]}"
        )
    return fact


class SchemaDriftError(Exception):
    """Typed (name, type) contract violation; carries the categorized
    drift so callers can route (page vs auto-evolve) without parsing."""

    def __init__(self, added, missing, type_changed):
        self.added = added
        self.missing = missing
        self.type_changed = type_changed
        super().__init__(
            "schema drift: "
            f"added={sorted(added)} missing={sorted(missing)} "
            f"type_changed={sorted(type_changed)}"
        )


def schema_drift_gate(
    df: DataFrame,
    contract: dict[str, str],
    allow_added: bool = False,
) -> DataFrame:
    """Gate a batch against a (column → Spark simpleString type) contract.

    Drift is categorized: ``missing`` (contract column absent) and
    ``type_changed`` (same name, different type) always raise — silently
    NULL-filling a missing metric or narrowing a type corrupts downstream
    marts.  ``added`` columns raise only when ``allow_added`` is False;
    with ``allow_added=True`` additive evolution flows through (the
    ``src_schema_evolution`` read path handles it) but still surfaces in
    the returned frame's lineage via this gate's log line.  Column ORDER
    is deliberately not part of the contract (select-normalization owns
    order; `assert_schema` is the strict-order variant).

    Pure metadata check — no jobs run, no data is read.
    """
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = {c for c in contract if c not in actual}
    added = {c for c in actual if c not in contract}
    type_changed = {
        f"{c}:{contract[c]}->{actual[c]}"
        for c in contract
        if c in actual and actual[c] != contract[c]
    }
    if missing or type_changed or (added and not allow_added):
        raise SchemaDriftError(
            added=added if not allow_added else set(),
            missing=missing,
            type_changed=type_changed,
        )
    return df


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile → long-form ``(column, n_rows, n_null,
    n_distinct)`` — the data-profiling summary quality dashboards ingest
    (null creep and cardinality collapse are the two classic silent
    schema-rot signals; feed these into `volume_anomaly_gate`-style
    history checks to alarm on drift).

    ONE aggregation computes every column's stats (3·k aggregates, one
    shuffle of partial aggregates); the single wide row then unpivots via
    ``stack`` — no per-column jobs, no extra scans.
    """
    # POSITIONAL aliases (__rows_0, …), not name-derived ones: splicing a
    # raw column name into an alias and the stack() expression breaks on
    # any non-identifier character (space, hyphen, quote — ParseException
    # at F.expr; r8 review).  The name itself enters only as an escaped
    # string literal.
    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{i}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}"),
            F.countDistinct(c).alias(f"__dist_{i}"),
        ]
    wide = df.agg(*aggs)

    def lit_str(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"{lit_str(c)}, __rows_{i}, __null_{i}, __dist_{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_rows, n_null, n_distinct)"
        )
    )


def expectations(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """Declarative expectations suite (Deequ / Great-Expectations shape)
    evaluated in ONE aggregation pass → long-form
    ``(check, column, observed, passed)`` rows.

    ``checks`` is a list of tuples:

    * ``("not_null", col)`` — observed = null count, pass when 0
    * ``("unique", col)`` — observed = rows − distinct (excess), pass 0
    * ``("between", col, lo, hi)`` — observed = out-of-range count
      (nulls don't count; pair with not_null), pass when 0
    * ``("in_set", col, values)`` — observed = non-null rows outside the
      set, pass when 0
    * ``("matches", col, regex)`` — observed = non-null rows NOT matching
      (Java regex, full-match not required), pass when 0
    * ``("predicate", label, sql)`` — CROSS-FIELD invariant: observed =
      rows where the SQL boolean expression is NOT satisfied (false OR
      null — a null comparison is a violation, not a free pass), pass
      when 0.  E.g. ``("predicate", "ship_after_order",
      "ship_date >= order_date")``.
    * ``("row_count_min", n)`` — observed = row count, pass when ≥ n

    Unlike the fail-fast gates above, this is a REPORT: all checks
    evaluate, nothing raises — the shape monitoring dashboards ingest
    and CI asserts on.  Every check compiles to aggregate expressions in
    the same ``agg`` (one shuffle of partial aggregates, one scan
    regardless of how many checks); the single wide row unpivots via
    ``stack``.  Compose with a raise-on-failure wrapper when a hard gate
    is wanted.
    """
    exprs: list = []
    rows: list[tuple[str, str, str]] = []  # (check label, column, agg alias)
    for i, chk in enumerate(checks):
        kind = chk[0]
        alias = f"__c{i}"
        if kind == "not_null":
            _, c = chk
            exprs.append(F.sum(F.col(c).isNull().cast("long")).alias(alias))
            rows.append((kind, c, alias))
        elif kind == "unique":
            _, c = chk
            exprs.append(
                (F.count(c) - F.countDistinct(c)).alias(alias)
            )
            rows.append((kind, c, alias))
        elif kind == "between":
            _, c, lo, hi = chk
            bad = (F.col(c) < lo) | (F.col(c) > hi)
            exprs.append(F.sum(bad.cast("long")).alias(alias))
            rows.append((f"between({lo},{hi})", c, alias))
        elif kind == "in_set":
            _, c, values = chk
            bad = ~F.col(c).isin(*values) & F.col(c).isNotNull()
            exprs.append(F.sum(bad.cast("long")).alias(alias))
            rows.append(("in_set(" + ",".join(map(str, values)) + ")", c, alias))
        elif kind == "matches":
            _, c, regex = chk
            bad = ~F.col(c).rlike(regex) & F.col(c).isNotNull()
            exprs.append(F.sum(bad.cast("long")).alias(alias))
            rows.append((f"matches({regex})", c, alias))
        elif kind == "predicate":
            _, label, sql = chk
            bad = ~F.coalesce(F.expr(sql), F.lit(False))
            exprs.append(F.sum(bad.cast("long")).alias(alias))
            rows.append((f"predicate({label})", "*", alias))
        elif kind == "row_count_min":
            _, n = chk
            exprs.append(F.count(F.lit(1)).alias(alias))
            rows.append((f"row_count_min({n})", "*", alias))
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
    if not exprs:
        raise ValueError("expectations: empty check list")
    wide = df.agg(*exprs)
    structs = []
    for (label, col, alias), chk in zip(rows, checks):
        observed = F.coalesce(F.col(alias), F.lit(0)).cast("long")
        if chk[0] == "row_count_min":
            passed = observed >= int(chk[1])
        else:
            passed = observed == 0
        structs.append(
            F.struct(
                F.lit(label).alias("check"),
                F.lit(col).alias("column"),
                observed.alias("observed"),
                passed.alias("passed"),
            )
        )
    return wide.select(
        F.explode(F.array(*structs)).alias("r")
    ).select("r.check", "r.column", "r.observed", "r.passed")


def freshness_report(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    as_of: str,
    stale_after_days: int = 7,
) -> DataFrame:
    """Per-group freshness readout — the reporting complement of
    :func:`freshness_gate`'s single global tripwire: ``(group…,
    last_seen, lag_days, stale)`` with ``lag_days`` measured from
    ``as_of`` (injectable snapshot date, same determinism contract as
    the ``RUN_DATE`` queries).  One groupBy, group-cardinality output —
    the feed-health dashboard for a multi-source ingest, where one dead
    upstream hides inside a globally-fresh max(ts)."""
    lag = F.datediff(
        F.lit(as_of).cast("date"), F.to_date(F.max(F.col(ts_col)))
    ).cast("long")
    return df.groupBy(*group_cols).agg(
        F.max(F.col(ts_col)).alias("last_seen"),
        lag.alias("lag_days"),
        (lag > stale_after_days).alias("stale"),
    )


def reconcile(
    source: DataFrame,
    target: DataFrame,
    keys: list[str],
    amount_col: str,
    scale: int = 2,
) -> DataFrame:
    """Source→target load reconciliation: per key-group row counts and
    exact-decimal amount sums compared across the two frames — the
    classic post-load audit every warehouse run ends with (row drift
    from a dropped partition, amount drift from a bad cast or double
    rounding).

    Output grain is the key group: ``(keys…, src_rows, tgt_rows,
    src_amount, tgt_amount, rows_ok, amount_ok, status)`` with status
    ``ok`` / ``row_mismatch`` / ``amount_mismatch`` /
    ``missing_in_target`` / ``extra_in_target``.  Groups present on one
    side only survive via the FULL OUTER join with zero-filled
    counterparts.

    Determinism: amounts sum in DECIMAL(38,6) (exact, combine-order
    independent) and compare after rounding to ``scale`` — never raw
    doubles (SCALE.md "expression-level pitfalls").

    Scale shape: two grouped aggregates with map-side partials (each
    side scans once, shuffles only group-grain rows) + one equi-join on
    the group key — group-grain cost however wide the fact is; never a
    row-level join.  At 100 TB run it per load partition (day) so the
    join stays tiny.
    """
    # one consistent decimal type end-to-end (r11 ADVICE: rounding to
    # scale > 6 then casting to decimal(38,6) silently re-rounded to
    # 6 dp, breaking the compare-after-rounding-to-scale contract)
    dec = f"decimal(38,{max(scale, 6)})"

    def grouped(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(f"{side}_rows"),
            F.round(F.sum(F.col(amount_col).cast(dec)), scale)
            .cast(dec)
            .alias(f"{side}_amount"),
        )

    src, tgt = grouped(source, "src"), grouped(target, "tgt")
    j = src.join(tgt, on=keys, how="full_outer")
    src_rows = F.coalesce(F.col("src_rows"), F.lit(0))
    tgt_rows = F.coalesce(F.col("tgt_rows"), F.lit(0))
    src_amt = F.coalesce(F.col("src_amount"), F.lit(0).cast(dec))
    tgt_amt = F.coalesce(F.col("tgt_amount"), F.lit(0).cast(dec))
    rows_ok = src_rows == tgt_rows
    amount_ok = src_amt == tgt_amt
    status = (
        F.when(F.col("tgt_rows").isNull(), F.lit("missing_in_target"))
        .when(F.col("src_rows").isNull(), F.lit("extra_in_target"))
        .when(~rows_ok, F.lit("row_mismatch"))
        .when(~amount_ok, F.lit("amount_mismatch"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        *keys,
        src_rows.alias("src_rows"),
        tgt_rows.alias("tgt_rows"),
        src_amt.cast("double").alias("src_amount"),
        tgt_amt.cast("double").alias("tgt_amount"),
        rows_ok.alias("rows_ok"),
        amount_ok.alias("amount_ok"),
        status.alias("status"),
    )
