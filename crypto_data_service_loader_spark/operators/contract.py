"""Declarative data-contract validation: one pass, one report.

The pipeline-gating shape: a table lands, a contract (list of rules)
runs against it, and the load proceeds only if every rule passes. The
whole contract — not-null rates, value ranges, accepted sets, regexes,
arbitrary boolean expressions, key uniqueness, referential integrity —
is evaluated in ONE aggregation over ONE scan of the fact table:

- row-level rules become violation-flag columns summed in the agg;
- FK rules pre-join the (broadcast, distinct) reference keys so the
  orphan check is also just a flag column in the same agg;
- uniqueness uses count(<all keys non-null>) - count(DISTINCT key...)
  inside the agg — SQL UNIQUE-constraint semantics: rows with a NULL in
  any key column are exempt (pair with a not_null rule to forbid them),
  so countDistinct's own null-skipping is matched against the non-null
  row count instead of silently flagging every null-keyed row as a
  duplicate (each unique rule adds one Expand input replica, the
  standard exact multi-distinct cost — keep unique rules few, which
  contracts are).

The 1-row aggregate is then unpivoted into the report: one row per
rule, (rule_id, rule, col_name, n_violations, n_rows, passed). At
100 TB nothing but the single fact scan moves: references broadcast,
the aggregate is partial-combined, the unpivot runs on one row.

Reference parity: generalizes the reference's ad-hoc CSV/row validity
checks (CSVFileDAO.java line-validity filter, O17) into the declarative
contract a lakehouse load gate needs. Charter EXT otherwise.

Rule dicts:
    {"rule": "not_null", "col": c}
    {"rule": "range", "col": c, "lo": x, "hi": y}      # nulls don't violate
    {"rule": "in_set", "col": c, "values": [...]}       # nulls don't violate
    {"rule": "regex", "col": c, "pattern": p}           # nulls don't violate
    {"rule": "expr", "expr": sql_bool, "col": label}    # null/false = violation
    {"rule": "unique", "cols": [c, ...]}
    {"rule": "fk", "col": c, "ref": DataFrame, "ref_col": rc}  # nulls don't violate
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

_ROW_RULES = {"not_null", "range", "in_set", "regex", "expr", "fk"}


def _violation(rule: dict, flag_col: str | None) -> Column:
    kind = rule["rule"]
    c = F.col(rule["col"]) if "col" in rule and kind != "expr" else None
    if kind == "not_null":
        return c.isNull()
    if kind == "range":
        return c.isNotNull() & ((c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"])))
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(*rule["values"])
    if kind == "regex":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    if kind == "expr":
        return ~F.coalesce(F.expr(rule["expr"]), F.lit(False))
    if kind == "fk":
        return c.isNotNull() & F.col(flag_col).isNull()
    raise ValueError(f"unknown rule kind: {kind}")


def _label(rule: dict) -> str:
    if rule["rule"] == "unique":
        return ",".join(rule["cols"])
    return rule.get("col", "")


def contract_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate a contract; returns one row per rule:
    (rule_id, rule, col_name, n_violations, n_rows, passed)."""
    enriched = df
    flag_cols: dict[int, str] = {}
    for i, rule in enumerate(rules):
        if rule["rule"] != "fk":
            continue
        flag = f"_fk_ok_{i}"
        ref = (
            rule["ref"]
            .select(F.col(rule["ref_col"]).alias(rule["col"]))
            .distinct()
            .withColumn(flag, F.lit(True))
        )
        enriched = enriched.join(F.broadcast(ref), rule["col"], "left")
        flag_cols[i] = flag

    aggs = [F.count("*").alias("_n")]
    for i, rule in enumerate(rules):
        if rule["rule"] == "unique":
            aggs.append(F.countDistinct(*rule["cols"]).alias(f"_v{i}"))
            all_nn = reduce(
                lambda a, b: a & b,
                [F.col(c).isNotNull() for c in rule["cols"]],
            )
            aggs.append(F.sum(all_nn.cast("long")).alias(f"_nn{i}"))
        else:
            viol = _violation(rule, flag_cols.get(i))
            aggs.append(F.sum(viol.cast("long")).alias(f"_v{i}"))
    one = enriched.agg(*aggs)

    entries = []
    for i, rule in enumerate(rules):
        if rule["rule"] == "unique":
            # sum over zero rows is NULL; countDistinct is 0 — coalesce
            v = F.coalesce(F.col(f"_nn{i}"), F.lit(0).cast("long")) - F.col(f"_v{i}")
        else:
            v = F.coalesce(F.col(f"_v{i}"), F.lit(0).cast("long"))
        entries.append(
            F.struct(
                F.lit(i).cast("int").alias("rule_id"),
                F.lit(rule["rule"]).alias("rule"),
                F.lit(_label(rule)).alias("col_name"),
                v.cast("long").alias("n_violations"),
            )
        )
    return (
        one.select(F.col("_n").alias("n_rows"), F.explode(F.array(*entries)).alias("e"))
        .select(
            "e.rule_id",
            "e.rule",
            "e.col_name",
            "e.n_violations",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("e.n_violations") == 0).alias("passed"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Privacy audit before a dataset ships for training: group rows into
    quasi-identifier equivalence classes and report, per class, the
    k-anonymity size test (|class| >= k — Sweeney 2002) and the
    distinct-l-diversity test (>= l distinct sensitive values — Machanavajjhala
    et al. 2007; a k-anonymous class whose sensitive column is constant
    still leaks it). Returns one row per class: (quasi cols...,
    class_size, n_sensitive, k_ok, l_ok).

    One hash-partitioned aggregation with map-side partials — the exact
    shape of a groupBy count, so 100 TB costs one shuffle on the QI key;
    count(DISTINCT sensitive) rides the same agg via Spark's expand.
    Suppression/generalization act on this report (filter k_ok AND l_ok
    -> semi-join back), keeping policy outside the scan."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive",
            (F.col("class_size") >= k).alias("k_ok"),
            (F.col("n_sensitive") >= l).alias("l_ok"),
        )
    )
