"""CEP pattern API (reference: flink-cep `pattern/Pattern.java:50`).

Combinator surface mirrored: `begin:129`, `where:156`, `next:262`
(strict contiguity), `followed_by:291` (relaxed contiguity),
`followed_by_any:322` (non-deterministic relaxed), `not_next:304` /
`not_followed_by:273` (negative patterns), `optional:333`, `times:382`,
`one_or_more:352`, `greedy:367`, `until:220`, `consecutive:480`,
`allow_combinations:441`, `subtype:199`, `within:245`; after-match skip
strategies (`nfa/aftermatch/`): NO_SKIP, SKIP_PAST_LAST, SKIP_TO_FIRST,
SKIP_TO_LAST.

A Pattern is a list of stages; each stage has a name, a predicate over the
event (a dict of column values), a contiguity mode relative to the previous
stage, and a (min, max) quantifier. Evaluation is in `cep/nfa.py`.

Predicates may optionally carry a Spark SQL expression (`expr=`) alongside
the Python callable. When every stage has an expr, the batch operator
evaluates predicates JVM-side (vectorized, before the shuffle) and — for
fixed-length strictly-contiguous patterns — compiles the whole match to a
lead/lag window expression with no Python at all (`cep/compiled.py`).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field, replace

Predicate = Callable[[dict], bool]

NO_SKIP = "no_skip"
SKIP_PAST_LAST = "skip_past_last"
SKIP_TO_FIRST = "skip_to_first"
SKIP_TO_LAST = "skip_to_last"


@dataclass
class Stage:
    name: str
    predicate: Predicate | None = None
    contiguity: str = "strict"  # strict (next) | relaxed (followed_by) | any (followed_by_any)
    min_times: int = 1
    max_times: int = 1
    greedy: bool = True
    optional: bool = False
    #: negative pattern (not_next / not_followed_by): the stage consumes no
    #: event; it forbids a matching event in its contiguity scope.
    negated: bool = False
    #: contiguity BETWEEN repeats of a looping stage; None = same as
    #: `contiguity`. 'strict' = consecutive(), 'any' = allow_combinations().
    inner_contiguity: str | None = None
    #: stop condition for looping stages (Pattern.until:220) — events from
    #: the first until-matching event onward are not accepted into the loop.
    until: Predicate | None = None
    #: optional Spark SQL boolean expression equivalent to `predicate`,
    #: enabling JVM-side evaluation / full lead-lag compilation.
    expr: str | None = None
    until_expr: str | None = None
    #: iterative (match-aware) predicate: (event, MatchContext) -> bool.
    #: Reference: `IterativeCondition.java` — Pattern.where(IterativeCondition)
    #: — and MATCH_RECOGNIZE navigation/aggregate DEFINE. ANDed with
    #: `predicate`; forces the NFA path (never JVM-compiled).
    ctx_predicate: Callable | None = None


@dataclass
class Pattern:
    """Fluent pattern builder. Immutable-ish: combinators mutate the last
    stage or append a new one and return self (matching the reference API)."""

    stages: list[Stage] = field(default_factory=list)
    within_seconds: float | None = None
    after_match: str = NO_SKIP
    #: stage name argument for SKIP_TO_FIRST / SKIP_TO_LAST
    after_match_stage: str | None = None

    @staticmethod
    def begin(name: str, where: Predicate | None = None, expr: str | None = None) -> "Pattern":
        p = Pattern()
        p.stages.append(Stage(name, where, expr=expr))
        return p

    def where(self, predicate: Predicate, expr: str | None = None) -> "Pattern":
        """AND-refine the current stage's predicate (Pattern.where:156)."""
        st = self.stages[-1]
        prev = st.predicate
        st.predicate = (
            predicate if prev is None else (lambda e, a=prev, b=predicate: a(e) and b(e))
        )
        if expr is not None:
            st.expr = expr if st.expr is None else f"({st.expr}) AND ({expr})"
        return self

    def where_iterative(self, predicate: Callable) -> "Pattern":
        """AND-refine the current stage with a match-aware predicate
        ``(event, ctx) -> bool`` (Pattern.where(IterativeCondition), ref
        `pattern/conditions/IterativeCondition.java`). ``ctx`` is a
        `cep.nfa.MatchContext`: ``ctx.events_for(var)`` mirrors
        ``Context.getEventsForPattern``; SQL-style navigation helpers
        (``prev_val``/``first``/``last``/``agg``) use running semantics."""
        st = self.stages[-1]
        prev = st.ctx_predicate
        st.ctx_predicate = (
            predicate
            if prev is None
            else (lambda e, c, a=prev, b=predicate: a(e, c) and b(e, c))
        )
        st.expr = None  # no longer a pure row-local condition
        return self

    def or_(self, predicate: Predicate, expr: str | None = None) -> "Pattern":
        """OR-extend the current stage's predicate (Pattern.or:178)."""
        st = self.stages[-1]
        prev = st.predicate
        st.predicate = (
            predicate if prev is None else (lambda e, a=prev, b=predicate: a(e) or b(e))
        )
        if expr is not None and st.expr is not None:
            st.expr = f"({st.expr}) OR ({expr})"
        else:
            st.expr = None  # OR with an unknown half is not expressible
        return self

    def subtype(self, predicate: Predicate, expr: str | None = None) -> "Pattern":
        """Restrict the current stage to a subtype (Pattern.subtype:199).

        The reference narrows by Java class; rows here are schema'd dicts, so
        the narrowing is expressed as a predicate on a discriminator column
        (e.g. ``lambda e: e["kind"] == "sensor"``). Composes like where()."""
        return self.where(predicate, expr=expr)

    def next(self, name: str, where: Predicate | None = None, expr: str | None = None) -> "Pattern":
        """Strict contiguity (Pattern.next:262)."""
        self.stages.append(Stage(name, where, contiguity="strict", expr=expr))
        return self

    def followed_by(
        self, name: str, where: Predicate | None = None, expr: str | None = None
    ) -> "Pattern":
        """Relaxed contiguity — other events may intervene (:291)."""
        self.stages.append(Stage(name, where, contiguity="relaxed", expr=expr))
        return self

    def followed_by_any(
        self, name: str, where: Predicate | None = None, expr: str | None = None
    ) -> "Pattern":
        """Non-deterministic relaxed contiguity (:322): EVERY later matching
        event opens a branch, not just the first one."""
        self.stages.append(Stage(name, where, contiguity="any", expr=expr))
        return self

    def not_next(self, name: str, where: Predicate, expr: str | None = None) -> "Pattern":
        """Negative strict contiguity (Pattern.notNext:304): the event
        directly following the previous stage must NOT match."""
        self.stages.append(
            Stage(name, where, contiguity="strict", negated=True, expr=expr)
        )
        return self

    def not_followed_by(
        self, name: str, where: Predicate, expr: str | None = None
    ) -> "Pattern":
        """Negative relaxed contiguity (Pattern.notFollowedBy:273): no
        matching event between the previous stage and the next positive
        stage. As the final stage it expresses absence detection and
        requires within() (matching the reference's constraint)."""
        self.stages.append(
            Stage(name, where, contiguity="relaxed", negated=True, expr=expr)
        )
        return self

    def times(self, min_times: int, max_times: int | None = None) -> "Pattern":
        """Quantifier on the current stage (:382,400)."""
        st = self.stages[-1]
        st.min_times = min_times
        st.max_times = max_times if max_times is not None else min_times
        return self

    def one_or_more(self, max_times: int = 16) -> "Pattern":
        """(:352) — max bounded for evaluation; raise if you need more."""
        return self.times(1, max_times)

    def times_or_more(self, min_times: int, max_times: int = 16) -> "Pattern":
        """At least `min_times` occurrences (Pattern.timesOrMore:420) —
        max bounded for evaluation, like one_or_more."""
        return self.times(min_times, max_times)

    def optional_(self) -> "Pattern":
        self.stages[-1].optional = True
        return self

    def greedy_(self, flag: bool = True) -> "Pattern":
        self.stages[-1].greedy = flag
        return self

    def consecutive_(self) -> "Pattern":
        """Repeats of the current looping stage must be strictly contiguous
        (Pattern.consecutive:480)."""
        self.stages[-1].inner_contiguity = "strict"
        return self

    def allow_combinations_(self) -> "Pattern":
        """Non-deterministic relaxed contiguity between repeats of the
        current looping stage (Pattern.allowCombinations:441)."""
        self.stages[-1].inner_contiguity = "any"
        return self

    def until_(self, predicate: Predicate, expr: str | None = None) -> "Pattern":
        """Stop condition for the current looping stage (Pattern.until:220)."""
        self.stages[-1].until = predicate
        self.stages[-1].until_expr = expr
        return self

    def within(self, seconds: float) -> "Pattern":
        """Time bound first→last event (:245)."""
        self.within_seconds = seconds
        return self

    def after_match_skip(self, strategy: str, stage: str | None = None) -> "Pattern":
        assert strategy in (NO_SKIP, SKIP_PAST_LAST, SKIP_TO_FIRST, SKIP_TO_LAST)
        if strategy in (SKIP_TO_FIRST, SKIP_TO_LAST):
            assert stage is not None, f"{strategy} requires a stage name"
        self.after_match = strategy
        self.after_match_stage = stage
        return self

    # -- introspection helpers (used by operators) ---------------------------

    def validate(self) -> None:
        if not self.stages:
            raise ValueError("empty pattern")
        if self.stages[0].negated:
            raise ValueError("pattern cannot begin with a negative stage (ref Pattern.java)")
        for st in self.stages:
            if st.negated and (st.min_times, st.max_times) != (1, 1):
                raise ValueError(f"negative stage {st.name!r} cannot have a quantifier")
            if st.negated and st.optional:
                raise ValueError(f"negative stage {st.name!r} cannot be optional")
        if self.stages[-1].negated and self.stages[-1].contiguity != "strict":
            if self.within_seconds is None:
                raise ValueError(
                    "not_followed_by as the final stage requires within() "
                    "(ref Pattern.java notFollowedBy constraint)"
                )

    def copy_with_predicates(self, predicates: list[Predicate | None]) -> "Pattern":
        """A shallow pattern copy with stage predicates replaced (operators
        swap in JVM-precomputed boolean column reads)."""
        p = Pattern(
            stages=[replace(st, predicate=pred) for st, pred in zip(self.stages, predicates)],
            within_seconds=self.within_seconds,
            after_match=self.after_match,
            after_match_stage=self.after_match_stage,
        )
        return p
