"""Whole-JVM compilation of fixed-length strictly-contiguous CEP patterns.

Reference: the reference compiles MATCH_RECOGNIZE onto its NFA
(`StreamExecMatch.scala:68`) unconditionally; on Spark, a pattern whose
stages are all fixed-count and strictly contiguous is exactly a lead()
window expression — one shuffle, whole-stage codegen, zero Python. The
batch `cep()` operator routes through here when the pattern qualifies
(every stage carries a SQL `expr`), falling back to the Arrow/NFA path
otherwise. Compiled and NFA paths are asserted equivalent in
tests/test_cep.py.

Supported: positive stages with times(n, n) (repeats consecutive when
n > 1), negative strict stages (not_next — including trailing), a TRAILING
relaxed negative stage (not_followed_by absence detection, requires
within() — compiled to a min-over-following-rows "next negative event"
window check), within, NO_SKIP. Not compilable: variable quantifiers,
optional, relaxed positive contiguity, until, middle not_followed_by,
other skip strategies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_ci_flink_spark.cep.pattern import NO_SKIP, Pattern


def _compilable(pattern: Pattern) -> bool:
    if pattern.after_match != NO_SKIP:
        return False
    if not pattern.stages or all(st.negated for st in pattern.stages):
        return False
    for i, st in enumerate(pattern.stages):
        if st.expr is None or st.until is not None or st.ctx_predicate is not None:
            return False
        if st.negated:
            if st.contiguity != "strict":
                # not_followed_by scans a gap — compilable only as the final
                # stage (absence detection) with a within() bound
                if i != len(pattern.stages) - 1 or pattern.within_seconds is None:
                    return False
            continue
        if st.optional or st.min_times != st.max_times:
            return False
        if st.max_times > 1 and st.inner_contiguity != "strict":
            return False  # relaxed repeats are not fixed-offset
        if i > 0 and st.contiguity != "strict":
            return False
    return True


def try_compile(
    df: DataFrame,
    pattern: Pattern,
    keys: list[str],
    ts_col: str,
    measures: dict[str, tuple],
    output_schema: str,
) -> DataFrame | None:
    """Return the compiled plan, or None when the pattern doesn't qualify."""
    if not _compilable(pattern):
        return None

    # flatten stages to row offsets relative to the anchor
    offset = 0
    occ_offsets: dict[str, list[int]] = {}
    neg_checks: list[tuple[int, int]] = []  # (offset, stage index) — strict
    trailing_neg: int | None = None  # stage index of final not_followed_by
    for i, st in enumerate(pattern.stages):
        if st.negated:
            if st.contiguity == "strict":
                neg_checks.append((offset, i))
            else:
                trailing_neg = i
        else:
            occ_offsets[st.name] = list(range(offset, offset + st.max_times))
            offset += st.max_times
    last_off = offset - 1

    work = df
    for i, st in enumerate(pattern.stages):
        work = work.withColumn(f"__p{i}", F.coalesce(F.expr(st.expr), F.lit(False)))
    from flink_ci_flink_spark.functions.scalar import epoch_seconds

    work = work.withColumn("__tsec", epoch_seconds(work, ts_col))
    measure_cols: dict[str, str] = {}
    for mi, (out_name, (var, kind, fieldexpr)) in enumerate(measures.items()):
        if kind in ("first", "last", "sum", "avg", "min", "max") and fieldexpr is not None:
            measure_cols[out_name] = f"__m{mi}"
            work = work.withColumn(f"__m{mi}", F.expr(fieldexpr))

    w = Window.partitionBy(*keys).orderBy(ts_col)

    def at(col: str, off: int) -> Column:
        return F.col(col) if off == 0 else F.lead(col, off).over(w)

    conds: list[Column] = []
    for st_name, offs in occ_offsets.items():
        i = next(j for j, s in enumerate(pattern.stages) if s.name == st_name)
        for o in offs:
            conds.append(F.coalesce(at(f"__p{i}", o), F.lit(False)))
    if pattern.within_seconds is not None and last_off > 0:
        conds.append(
            (at("__tsec", last_off) - F.col("__tsec")) <= F.lit(pattern.within_seconds)
        )
    for o, i in neg_checks:
        neg_hit = F.coalesce(at(f"__p{i}", o), F.lit(False))
        if pattern.within_seconds is not None and o > 0:
            neg_hit = neg_hit & (
                (at("__tsec", o) - F.col("__tsec")) <= F.lit(pattern.within_seconds)
            )
        conds.append(~neg_hit)
    if trailing_neg is not None:
        # absence detection: no negative-matching event among the rows after
        # the last consumed one with ts <= anchor ts + within. min() over the
        # following rows finds the next such event; NULL = none at all.
        i = trailing_neg
        wf = w.rowsBetween(last_off + 1, Window.unboundedFollowing)
        next_neg = F.min(
            F.when(F.col(f"__p{i}"), F.col("__tsec"))
        ).over(wf)
        conds.append(
            F.coalesce(
                next_neg > F.col("__tsec") + F.lit(pattern.within_seconds),
                F.lit(True),
            )
        )

    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c

    # measure lead()s MUST be computed in the same pre-filter projection as
    # the match condition — after filter they'd range over matches, not rows
    measure_exprs: list[Column] = []
    for out_name, (var, kind, fieldexpr) in measures.items():
        if kind in ("classifier", "classifier_first"):
            # fixed-length pattern: the variable at the first/last consumed
            # offset is statically known
            want = 0 if kind == "classifier_first" else last_off
            name = next(v for v, offs in occ_offsets.items() if want in offs)
            measure_exprs.append(F.lit(name).alias(out_name))
            continue
        offs = occ_offsets[var]
        if kind == "count":
            measure_exprs.append(F.lit(len(offs)).cast("long").alias(out_name))
            continue
        mcol = measure_cols[out_name]
        if kind == "first":
            measure_exprs.append(at(mcol, offs[0]).alias(out_name))
        elif kind == "last":
            measure_exprs.append(at(mcol, offs[-1]).alias(out_name))
        elif kind in ("sum", "avg"):
            total = at(mcol, offs[0])
            for o in offs[1:]:
                total = total + at(mcol, o)
            if kind == "avg":
                total = total.cast("double") / F.lit(float(len(offs)))
            measure_exprs.append(total.alias(out_name))
        elif kind in ("min", "max"):
            cols = [at(mcol, o) for o in offs]
            if len(cols) == 1:
                c = cols[0]
            else:
                c = F.least(*cols) if kind == "min" else F.greatest(*cols)
            measure_exprs.append(c.alias(out_name))
        else:
            raise ValueError(f"unknown measure kind {kind!r}")

    result = (
        work.select(*[F.col(k) for k in keys], cond.alias("__match"), *measure_exprs)
        .filter("__match")
        .drop("__match")
    )
    return result.to(StructType.fromDDL(output_schema))
