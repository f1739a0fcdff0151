"""Pattern matcher over an ordered per-key event sequence.

Reference: flink-cep's NFA (`nfa/NFA.java`, versioned `SharedBuffer.java`).
The reference builds an explicit NFA with shared match buffers because it
must be incremental per record with bounded state; evaluating per key over a
watermark-ordered buffer (how our operators invoke it) lets us use a simpler
and easily-audited backtracking matcher with identical match semantics for
the supported combinator set: strict/relaxed/non-deterministic contiguity,
negative stages (notNext/notFollowedBy incl. trailing absence detection),
quantifiers with consecutive()/allowCombinations() inner contiguity,
optional, greedy, until, within, and the four after-match skip strategies
(NO_SKIP, SKIP_PAST_LAST, SKIP_TO_FIRST, SKIP_TO_LAST — `nfa/aftermatch/`).

Events are dicts; `ts_field` must be a sortable numeric/time value.

Anchoring: a match's first CONSUMED event must sit at the anchor index, so
patterns whose leading stages are optional still anchor deterministically
(the within window starts at the anchor event's time).
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass

from flink_ci_flink_spark.cep.pattern import (
    NO_SKIP,
    SKIP_PAST_LAST,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    Pattern,
    Stage,
)


#: strict-streak fast path switch — tests flip it to prove the fast path
#: is observationally identical to the generic backtracking placements
_STREAK_ENABLED = True


@dataclass
class Match:
    #: stage name -> list of event indices (into the input sequence)
    groups: dict
    start_idx: int
    end_idx: int


@dataclass
class MatchContext:
    """Evaluation context for iterative (match-aware) predicates.

    Reference: `IterativeCondition.Context` (`flink-cep/.../pattern/
    conditions/IterativeCondition.java`) — predicates may inspect the events
    matched so far — and SQL MATCH_RECOGNIZE navigation/aggregates in DEFINE
    (`PREV`/`NEXT` physical, `FIRST`/`LAST` + running aggregates logical).

    ``events_for`` mirrors ``Context.getEventsForPattern`` (accepted events
    only, current row excluded); the SQL helpers (`first`/`last`/`agg`) use
    *running* semantics — the row under evaluation counts as mapped to the
    current variable, per SQL MATCH_RECOGNIZE DEFINE."""

    events: list
    idx: int  # index of the row under evaluation
    groups: dict  # var -> accepted indices so far (current match attempt)
    var: str  # variable being evaluated

    def events_for(self, var: str) -> list:
        return [self.events[i] for i in self.groups.get(var, [])]

    def _running(self, var: str) -> list[int]:
        idxs = list(self.groups.get(var, []))
        if var == self.var:
            idxs.append(self.idx)
        return idxs

    def prev_val(self, col: str, n: int = 1):
        """PREV(col, n): physical navigation over the input partition."""
        j = self.idx - n
        return self.events[j].get(col) if j >= 0 else None

    def next_val(self, col: str, n: int = 1):
        """NEXT(col, n): physical navigation over the input partition."""
        j = self.idx + n
        return self.events[j].get(col) if j < len(self.events) else None

    def first(self, var: str, col: str, n: int = 0):
        idxs = self._running(var)
        return self.events[idxs[n]].get(col) if n < len(idxs) else None

    def last(self, var: str, col: str, n: int = 0):
        idxs = self._running(var)
        return self.events[idxs[-1 - n]].get(col) if n < len(idxs) else None

    def agg(self, fn: str, var: str, col: str | None = None):
        idxs = self._running(var)
        if fn == "count":
            return len(idxs)
        vals = [v for v in (self.events[i].get(col) for i in idxs) if v is not None]
        if not vals:
            return None
        if fn == "sum":
            return sum(vals)
        if fn == "min":
            return min(vals)
        if fn == "max":
            return max(vals)
        if fn == "avg":
            return sum(vals) / len(vals)
        raise ValueError(f"unknown aggregate {fn!r}")


def _stage_matches(
    stage: Stage, event: dict, ctx: MatchContext | None = None
) -> bool:
    if stage.predicate is not None and not stage.predicate(event):
        return False
    if stage.ctx_predicate is not None:
        return bool(stage.ctx_predicate(event, ctx))
    return True


def _iter_matches(
    pattern: Pattern,
    events: list[dict],
    start: int,
    ts_field: str,
    partial_sink: list | None = None,
) -> Iterator[dict]:
    """Yield every match (as a groups dict) anchored at index `start`,
    in preference order (greedy branches first).

    When `partial_sink` (a 1-slot mutable holder) is given, the deepest
    partial consumption reached during the search is recorded into it as
    ``(stage_progress, total_consumed, groups)`` — the NFA run that
    survived longest before failing. Used for timed-out partial matches
    (`TimedOutPartialMatchHandler` semantics)."""
    stages = pattern.stages
    n = len(events)
    t0 = events[start][ts_field]
    within = pattern.within_seconds

    def in_window(idx: int) -> bool:
        return within is None or (events[idx][ts_field] - t0) <= within

    def _ctx(
        st: Stage, idx: int, groups: dict, partial: list[int]
    ) -> MatchContext | None:
        """Build a MatchContext only when the stage needs one."""
        if st.ctx_predicate is None:
            return None
        g = groups
        if partial:
            g = {**groups, st.name: groups.get(st.name, []) + partial}
        return MatchContext(events, idx, g, st.name)

    def neg_violated(pending: list[Stage], lo: int, hi: int, groups: dict) -> bool:
        """Check pending negative stages against the gap [lo, hi) before the
        next positive consumption at `hi`. Strict negatives (notNext) test
        only the event directly at `lo`; relaxed test the whole gap."""
        for st in pending:
            if st.contiguity == "strict":
                # notNext: only the event directly following the previous
                # stage is tested (even when the next positive stage matches
                # that same position — A notNext(B) next(B) is unsatisfiable)
                if lo < n and in_window(lo) and _stage_matches(
                    st, events[lo], _ctx(st, lo, groups, [])
                ):
                    return True
            else:
                for j in range(lo, min(hi, n)):
                    if not in_window(j):
                        break
                    if _stage_matches(st, events[j], _ctx(st, j, groups, [])):
                        return True
        return False

    def trailing_neg_violated(pending: list[Stage], lo: int, groups: dict) -> bool:
        """Final negative stages: absence until the within bound (or end of
        the bounded input). Strict trailing (notNext last) tests events[lo]."""
        for st in pending:
            if st.contiguity == "strict":
                if lo < n and in_window(lo) and _stage_matches(
                    st, events[lo], _ctx(st, lo, groups, [])
                ):
                    return True
            else:
                for j in range(lo, n):
                    if not in_window(j):
                        break
                    if _stage_matches(st, events[j], _ctx(st, j, groups, [])):
                        return True
        return False

    def strict_streak(st: Stage, ei: int, groups: dict, cap: int) -> int:
        """Length of the maximal strictly-contiguous run of st-matching
        events starting at ei (bounded by cap, within, until). Valid when
        every repeat placement is forced to the next position — the
        placements are then prefixes of this run, so greedy take-counting
        needs ONE forward walk instead of one per candidate count."""
        m = 0
        while m < cap:
            pos = ei + m
            if pos >= n or not in_window(pos):
                break
            ev = events[pos]
            if st.until is not None and st.until(ev):
                break
            if not _stage_matches(st, ev, _ctx(st, pos, groups, list(range(ei, pos)))):
                break
            m += 1
        return m

    def placements(
        st: Stage, take: int, ei: int, consumed: bool, groups: dict
    ) -> Iterator[list[int]]:
        """Yield index lists for `take` occurrences of stage st, searching
        from ei. Honors anchor, contiguity, inner contiguity, until, within."""

        def pick(k: int, pos: int, idxs: list[int]) -> Iterator[list[int]]:
            if k == take:
                yield idxs
                return
            anchored = (not consumed) and k == 0
            mode = st.contiguity if k == 0 else (st.inner_contiguity or "relaxed")
            if anchored or mode == "strict":
                if pos < n and in_window(pos) and _stage_matches(
                    st, events[pos], _ctx(st, pos, groups, idxs)
                ):
                    if st.until is not None and st.until(events[pos]):
                        return
                    yield from pick(k + 1, pos + 1, idxs + [pos])
                return
            # relaxed / any: scan forward
            j = pos
            while j < n and in_window(j):
                if st.until is not None and st.until(events[j]):
                    return  # until stops the loop from accepting further events
                if _stage_matches(st, events[j], _ctx(st, j, groups, idxs)):
                    yield from pick(k + 1, j + 1, idxs + [j])
                    if mode != "any":
                        return  # deterministic relaxed: first match only
                j += 1

        yield from pick(0, ei, [])

    def _record_partial(si: int, ei: int, groups: dict, pending_neg: list[Stage]):
        """Candidate timed-out partial: a run waiting at positive stage si.

        A run whose pending negative matches before the window expires is
        STOPPED (NFA stop state), not timed out — `NFA.java` stop
        transitions discard the computation without reaching
        `TimedOutPartialMatchHandler`. `trailing_neg_violated` performs
        exactly that forward scan (strict: the adjacent event; relaxed:
        the rest of the window)."""
        if partial_sink is None or not groups:
            return
        n_consumed = sum(len(v) for v in groups.values())
        best = partial_sink[0]
        # deepest stage progress, then most events; first-seen wins ties
        # (preference order = the NFA's surviving-branch order)
        if best is not None and (si, n_consumed) <= (best[0], best[1]):
            return
        if trailing_neg_violated(pending_neg, ei, groups):
            return  # stopped by a negative, not timed out
        partial_sink[0] = (si, n_consumed, groups)

    def rec(
        si: int, ei: int, groups: dict, consumed: bool, pending_neg: list[Stage]
    ) -> Iterator[dict]:
        if (
            partial_sink is not None
            and consumed
            and si < len(stages)
            and not stages[si].negated
        ):
            _record_partial(si, ei, groups, pending_neg)
        if si == len(stages):
            if not consumed:
                return
            if trailing_neg_violated(pending_neg, ei, groups):
                return
            yield groups
            return
        st = stages[si]
        if st.negated:
            yield from rec(si + 1, ei, groups, consumed, pending_neg + [st])
            return
        counts = (
            range(st.max_times, st.min_times - 1, -1)
            if st.greedy
            else range(st.min_times, st.max_times + 1)
        )
        options = list(counts)
        if st.optional and 0 not in options:
            options = options + [0]
        # every placement forced to the next position? one walk finds the
        # maximal run; each take is then its prefix (no per-take re-walk)
        all_strict = (
            _STREAK_ENABLED
            and ((not consumed) or st.contiguity == "strict")
            and (st.max_times == 1 or st.inner_contiguity == "strict")
        )
        streak = (
            strict_streak(st, ei, groups, st.max_times) if all_strict else None
        )
        if (
            partial_sink is not None
            and streak is not None
            and 0 < streak < st.min_times
            and (consumed or ei == start)
        ):
            # partially-consumed strict loop (e.g. times(3) saw 2): the
            # timed-out partial carries the loop events consumed so far,
            # as the reference's SharedBuffer extraction would
            _record_partial(
                si,
                ei + streak,
                {**groups, st.name: groups.get(st.name, []) + list(range(ei, ei + streak))},
                pending_neg,
            )
        for take in options:
            if take == 0:
                yield from rec(si + 1, ei, groups, consumed, pending_neg)
                continue
            if streak is not None:
                cands = [list(range(ei, ei + take))] if take <= streak else []
            else:
                cands = placements(st, take, ei, consumed, groups)
            for idxs in cands:
                if not consumed and idxs[0] != start:
                    continue  # anchor: first consumed event must be at start
                if pending_neg and neg_violated(pending_neg, ei, idxs[0], groups):
                    continue
                yield from rec(
                    si + 1,
                    idxs[-1] + 1,
                    {**groups, st.name: groups.get(st.name, []) + idxs},
                    True,
                    [],
                )

    yield from rec(0, start, {}, False, [])


def _make_match(groups: dict) -> Match:
    all_idx = [i for idxs in groups.values() for i in idxs]
    return Match(groups, min(all_idx), max(all_idx))


def _match_key(groups: dict) -> tuple:
    return tuple(sorted((k, tuple(v)) for k, v in groups.items()))


@dataclass
class TimedOutPartial:
    """A partial match pruned by within() expiry.

    Reference: `PatternStream.java:173-189` (select/flatSelect with a
    timeout function) + `TimedOutPartialMatchHandler.java` — when the
    within window of a partial computation expires, the (variable ->
    events-so-far) map and the timeout timestamp are exposed on a side
    output instead of being silently discarded."""

    groups: dict
    start_idx: int
    end_idx: int
    timeout_ts: float


def find_matches_and_timeouts(
    pattern: Pattern, events: list[dict], ts_field: str = "ts"
) -> tuple[list[Match], list[TimedOutPartial]]:
    """Matches plus timed-out partial matches in one scan.

    A timed-out partial exists for an anchor when (a) the pattern has a
    within() bound, (b) at least one event was consumed at the anchor,
    (c) no full match anchored there exists over the bounded input, and
    (d) the surviving run died waiting for a positive stage (not stopped
    by a matched negative). Deterministic-branch semantics: the deepest
    surviving partial per anchor is reported (the reference NFA reports
    one per pruned computation; with deterministic contiguity there is
    exactly one). timeout_ts = anchor ts + within — when the window
    expired. Anchors inside an after-match skip region are pruned runs,
    not timeouts (aftermatch/ strategies discard them silently)."""
    return _scan(pattern, events, ts_field, want_timeouts=True)


def find_matches(pattern: Pattern, events: list[dict], ts_field: str = "ts") -> list[Match]:
    """All matches over an ordered sequence under the after-match strategy."""
    return _scan(pattern, events, ts_field, want_timeouts=False)[0]


def _scan(
    pattern: Pattern, events: list[dict], ts_field: str, want_timeouts: bool
) -> tuple[list[Match], list[TimedOutPartial]]:
    pattern.validate()
    # deterministic patterns yield one match per anchor (the preferred
    # branch); non-deterministic contiguity (followed_by_any /
    # allow_combinations) emits every branch, like the reference NFA.
    multi = any(
        st.contiguity == "any" or st.inner_contiguity == "any" for st in pattern.stages
    )
    collect = want_timeouts and pattern.within_seconds is not None
    matches: list[Match] = []
    timeouts: list[TimedOutPartial] = []
    seen: set[tuple] = set()
    i = 0
    n = len(events)
    while i < n:
        found: list[Match] = []
        sink: list | None = [None] if collect else None
        for groups in _iter_matches(pattern, events, i, ts_field, partial_sink=sink):
            key = _match_key(groups)
            if key not in seen:
                seen.add(key)
                found.append(_make_match(groups))
            if not multi:
                break
        if collect and not found and sink[0] is not None:
            _si, _nc, pgroups = sink[0]
            all_idx = [j for idxs in pgroups.values() for j in idxs]
            timeouts.append(
                TimedOutPartial(
                    pgroups,
                    min(all_idx),
                    max(all_idx),
                    events[i][ts_field] + pattern.within_seconds,
                )
            )
        matches.extend(found)
        if found and pattern.after_match != NO_SKIP:
            m0 = found[0]
            if pattern.after_match == SKIP_PAST_LAST:
                i = m0.end_idx + 1
            elif pattern.after_match == SKIP_TO_FIRST:
                idxs = m0.groups.get(pattern.after_match_stage)
                nxt = idxs[0] if idxs else m0.end_idx + 1
                i = nxt if nxt > i else i + 1
            elif pattern.after_match == SKIP_TO_LAST:
                idxs = m0.groups.get(pattern.after_match_stage)
                nxt = idxs[-1] if idxs else m0.end_idx + 1
                i = nxt if nxt > i else i + 1
            continue
        i += 1
    return matches, timeouts
