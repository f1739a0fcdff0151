"""Pattern matcher over an ordered per-key event sequence.

Reference: flink-cep's NFA (`nfa/NFA.java`, versioned `SharedBuffer.java`).
The reference builds an explicit NFA with shared match buffers because it
must be incremental per record with bounded state; evaluating per key over a
watermark-ordered buffer (how our operators invoke it) lets us use a simpler
and easily-audited backtracking matcher with identical match semantics for
the supported combinator set (strict/relaxed contiguity, quantifiers,
optional, greedy, within, NO_SKIP / SKIP_PAST_LAST).

Events are dicts; `ts_field` must be a sortable numeric/time value.
"""

from __future__ import annotations

from dataclasses import dataclass

from flink_ci_flink_spark.cep.pattern import NO_SKIP, SKIP_PAST_LAST, Pattern, Stage


@dataclass
class Match:
    #: stage name -> list of event indices (into the input sequence)
    groups: dict
    start_idx: int
    end_idx: int


def _stage_matches(stage: Stage, event: dict) -> bool:
    return stage.predicate is None or bool(stage.predicate(event))


def _try_match(pattern: Pattern, events: list[dict], start: int, ts_field: str):
    """Attempt a match anchored at `start`. Returns Match or None.

    Backtracking over (stage_idx, repeat_count, event_idx). Greedy stages
    consume as many as allowed first; non-greedy the minimum first.
    """
    stages = pattern.stages
    n = len(events)
    t0 = None

    def within_ok(idx: int) -> bool:
        if pattern.within_seconds is None or t0 is None:
            return True
        return (events[idx][ts_field] - t0) <= pattern.within_seconds

    def rec(si: int, ei: int, groups: dict):
        if si == len(stages):
            return groups
        st = stages[si]
        counts = range(st.max_times, st.min_times - 1, -1) if st.greedy else range(
            st.min_times, st.max_times + 1
        )
        options = list(counts)
        if st.optional and 0 not in options:
            options = options + [0]
        for take in options:
            if take == 0:
                res = rec(si + 1, ei, groups)
                if res is not None:
                    return res
                continue
            idxs, pos = [], ei
            ok = True
            for k in range(take):
                anchored = si == 0 and k == 0
                if anchored or st.contiguity == "strict":
                    # must match at exactly `pos`
                    if pos >= n or not (_stage_matches(st, events[pos]) and within_ok(pos)):
                        ok = False
                        break
                    idxs.append(pos)
                    pos += 1
                else:
                    # relaxed: scan forward for the next matching event
                    while pos < n and not (_stage_matches(st, events[pos]) and within_ok(pos)):
                        if pattern.within_seconds is not None and t0 is not None and (
                            events[pos][ts_field] - t0
                        ) > pattern.within_seconds:
                            break
                        pos += 1
                    if pos >= n or not (_stage_matches(st, events[pos]) and within_ok(pos)):
                        ok = False
                        break
                    idxs.append(pos)
                    pos += 1
            if not ok:
                continue
            res = rec(si + 1, pos, {**groups, st.name: groups.get(st.name, []) + idxs})
            if res is not None:
                return res
        return None

    first = stages[0]
    if not _stage_matches(first, events[start]):
        return None
    t0 = events[start][ts_field]
    groups = rec(0, start, {})
    if groups is None:
        return None
    all_idx = [i for idxs in groups.values() for i in idxs]
    return Match(groups, min(all_idx), max(all_idx))


def find_matches(pattern: Pattern, events: list[dict], ts_field: str = "ts") -> list[Match]:
    """All matches over an ordered sequence under the after-match strategy."""
    matches: list[Match] = []
    i = 0
    n = len(events)
    while i < n:
        m = _try_match(pattern, events, i, ts_field)
        if m is not None:
            matches.append(m)
            if pattern.after_match == SKIP_PAST_LAST:
                i = m.end_idx + 1
                continue
        i += 1
    return matches
