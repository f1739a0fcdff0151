"""CEP pattern API (reference: flink-cep `pattern/Pattern.java:50`).

Combinator surface mirrored: `begin:129`, `where:156`, `next:262`
(strict contiguity), `followed_by:291` (relaxed contiguity), `optional:333`,
`times:382`, `one_or_more:352`, `greedy:367`, `within:245`; after-match skip
strategies (`nfa/aftermatch/`): NO_SKIP and SKIP_PAST_LAST_EVENT.

A Pattern is a list of stages; each stage has a name, a predicate over the
event (a dict of column values), a contiguity mode relative to the previous
stage, and a (min, max) quantifier. Evaluation is in `cep/nfa.py`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

Predicate = Callable[[dict], bool]

NO_SKIP = "no_skip"
SKIP_PAST_LAST = "skip_past_last"


@dataclass
class Stage:
    name: str
    predicate: Predicate | None = None
    contiguity: str = "strict"  # strict (next) | relaxed (followed_by)
    min_times: int = 1
    max_times: int = 1
    greedy: bool = True
    optional: bool = False


@dataclass
class Pattern:
    """Fluent pattern builder. Immutable-ish: combinators mutate the last
    stage or append a new one and return self (matching the reference API)."""

    stages: list[Stage] = field(default_factory=list)
    within_seconds: float | None = None
    after_match: str = NO_SKIP

    @staticmethod
    def begin(name: str, where: Predicate | None = None) -> "Pattern":
        p = Pattern()
        p.stages.append(Stage(name, where))
        return p

    def where(self, predicate: Predicate) -> "Pattern":
        """AND-refine the current stage's predicate (Pattern.where:156)."""
        prev = self.stages[-1].predicate
        self.stages[-1].predicate = (
            predicate if prev is None else (lambda e, a=prev, b=predicate: a(e) and b(e))
        )
        return self

    def or_(self, predicate: Predicate) -> "Pattern":
        """OR-extend the current stage's predicate (Pattern.or:178)."""
        prev = self.stages[-1].predicate
        self.stages[-1].predicate = (
            predicate if prev is None else (lambda e, a=prev, b=predicate: a(e) or b(e))
        )
        return self

    def next(self, name: str, where: Predicate | None = None) -> "Pattern":
        """Strict contiguity (Pattern.next:262)."""
        self.stages.append(Stage(name, where, contiguity="strict"))
        return self

    def followed_by(self, name: str, where: Predicate | None = None) -> "Pattern":
        """Relaxed contiguity — other events may intervene (:291)."""
        self.stages.append(Stage(name, where, contiguity="relaxed"))
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

    def optional_(self) -> "Pattern":
        self.stages[-1].optional = True
        return self

    def greedy_(self, flag: bool = True) -> "Pattern":
        self.stages[-1].greedy = flag
        return self

    def within(self, seconds: float) -> "Pattern":
        """Time bound first→last event (:245)."""
        self.within_seconds = seconds
        return self

    def after_match_skip(self, strategy: str) -> "Pattern":
        assert strategy in (NO_SKIP, SKIP_PAST_LAST)
        self.after_match = strategy
        return self
