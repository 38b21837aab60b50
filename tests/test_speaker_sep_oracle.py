"""Pins the declarative interval-algebra reformulation the
speaker_sep_segments oracle uses against the real stateful sweeps
(process_speaker_segments), plus the data invariants the reformulation
relies on, over a wide doc_id range — the 3-way pyref pattern: python
sweep == python formula here, Spark sweep == DuckDB formula in the
driver gate.
"""

from __future__ import annotations

import pytest

from __spark_entry__ import _speaker_sep_intervals
from nemo_curator_spark.operators import speaker_sep as SS

DOC_RANGE = range(0, 2001)


def test_interval_invariants():
    for d in DOC_RANGE:
        ivals = _speaker_sep_intervals(d)
        # no two intervals share a start; no 3 concurrent; no
        # same-speaker overlap (end == start touches are fine: the end
        # event sorts before the start event)
        starts = [a for _, a, _ in ivals]
        assert len(set(starts)) == len(starts), d
        events = sorted(
            [(a, 1) for _, a, _ in ivals] + [(b, -1) for _, _, b in ivals]
        )
        active = 0
        for _, typ in events:
            active += typ
            assert active <= 2, d
        by_spk: dict[str, list] = {}
        for spk, a, b in ivals:
            by_spk.setdefault(spk, []).append((a, b))
        for spk, segs in by_spk.items():
            segs = sorted(segs)
            for (a1, b1), (a2, b2) in zip(segs, segs[1:]):
                assert b1 <= a2, (d, spk)


def _formula(ivals, exclude: bool, buffer: float = 0.5,
             gap: float = 0.1, min_dur: float = 2.0):
    """Python mirror of the oracle SQL: piece derivation + island merge
    + duration filter."""
    pieces: dict[str, list] = {}
    for spk, a, b in ivals:
        if exclude:
            regions = sorted(
                (max(ja, a), min(jb, b))
                for jspk, ja, jb in ivals
                if jspk != spk and jb > a and ja < b
            )
            bounds = []
            if regions:
                bounds.append((a, regions[0][0] - buffer))
                for i, (rs, re) in enumerate(regions):
                    nxt = (
                        regions[i + 1][0] - buffer
                        if i + 1 < len(regions)
                        else b
                    )
                    bounds.append((re + buffer, nxt))
            else:
                bounds.append((a, b))
        else:
            cutters = sorted(
                (ja, jb)
                for jspk, ja, jb in ivals
                if jspk != spk and a < ja < b
            )
            bounds = [(a, cutters[0][0] if cutters else b)]
            for i, (ca, cb) in enumerate(cutters):
                nxt = cutters[i + 1][0] if i + 1 < len(cutters) else b
                bounds.append((cb, min(nxt, b)))
        pieces.setdefault(spk, []).extend(
            (s, e) for s, e in bounds if s < e
        )
    out: dict[str, list] = {}
    for spk, ps in pieces.items():
        merged = SS.merge_adjacent_segments(sorted(ps), gap)
        kept = [(s, e) for s, e in merged if e - s >= min_dur]
        if kept:
            out[spk] = kept
    return out


@pytest.mark.parametrize("exclude", [False, True])
def test_formula_matches_sweep(exclude):
    for d in DOC_RANGE:
        ivals = _speaker_sep_intervals(d)
        lines = [f"{a!r} {b!r} {spk}" for spk, a, b in ivals]
        lines.insert(1, "malformed")
        swept = SS.process_speaker_segments(
            lines,
            gap_threshold=0.1,
            exclude_overlaps=exclude,
            min_duration=2.0,
            buffer_time=0.5,
        )
        swept = {spk: segs for spk, segs in swept.items() if segs}
        formd = _formula(ivals, exclude)
        assert formd == swept, (d, exclude)


def test_layout_exercises_every_path():
    # the gate data actually reaches: clean-cut resume piece surviving,
    # exclude buffered tail, the merge-only pair, and the parse skip
    d = 1
    ivals = _speaker_sep_intervals(d)
    clean = _formula(ivals, exclude=False)
    p = (d % 7) * 0.125
    assert (p + 24, p + 27) in clean["spk0"]  # resume after containment
    excl = _formula(ivals, exclude=True)
    assert (p + 24.5, p + 27) in excl["spk0"]  # buffered tail resume
    assert (p + 30, p + 34.0625) in clean["spk0"]  # merged pair
    assert (p + 30, p + 34.0625) in excl["spk0"]
