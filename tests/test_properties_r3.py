"""Property-based tests (hypothesis) for the round-3 algorithm cores,
in pure Python — they pin the ALGORITHMS the engines implement on
inputs far beyond the fixtures:

- the declarative gaps-and-islands BPE merge (q224's DuckDB oracle
  formulation) is exactly greedy-leftmost non-overlapping merging;
- the 3x3 grid-cell probe (q233) generates a candidate superset of
  every true epsilon-neighbor pair (the no-loss covering theorem);
- the prefix-filter candidate rule (q223) never misses a pair with
  Jaccard >= 1/2 (the pigeonhole prefix theorem).
"""

from hypothesis import given, settings
from hypothesis import strategies as st


def _greedy_merge(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _islands_merge(syms, l, r):
    """The q224 oracle's declarative form: mark matching positions,
    take odd offsets within each consecutive-mark island, drop the
    consumed right halves."""
    n = len(syms)
    mk = [1 if i + 1 < n and syms[i] == l and syms[i + 1] == r else 0 for i in range(n)]
    take = [0] * n
    run = 0
    for i in range(n):
        if mk[i]:
            run += 1
            if run % 2 == 1:
                take[i] = 1
        else:
            run = 0
    out = []
    i = 0
    for i in range(n):
        if i > 0 and take[i - 1]:
            continue  # consumed as a right half
        out.append(syms[i] + syms[i + 1] if take[i] else syms[i])
    return out


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab", "ba"]), min_size=1, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "c", "ab", "ba"]),
        st.sampled_from(["a", "b", "c", "ab", "ba"]),
    ),
)
def test_islands_merge_is_greedy(syms, pair):
    assert _islands_merge(syms, *pair) == _greedy_merge(syms, *pair)


@settings(max_examples=200, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 400)),
        min_size=2,
        max_size=40,
        unique=True,
    ),
    eps=st.integers(1, 60),
)
def test_grid_probe_covers_every_true_pair(pts, eps):
    """Every pair within eps must share a cell with one point's 3x3
    probe of the other — with cell size == eps (q233's invariant)."""
    cells = {p: (p[0] // eps, p[1] // eps) for p in pts}
    for i, a in enumerate(pts):
        for b in pts[i + 1 :]:
            d2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            if d2 <= eps * eps:
                ca, cb = cells[a], cells[b]
                assert abs(ca[0] - cb[0]) <= 1 and abs(ca[1] - cb[1]) <= 1


@settings(max_examples=200, deadline=None)
@given(
    sets=st.lists(
        st.frozensets(st.integers(0, 30), min_size=1, max_size=15),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_prefix_filter_never_misses(sets):
    """With the df-ascending global order and prefix length
    p = n - ceil(n/2) + 1, any two sets with 3*|A∩B| >= |A|+|B|
    (J >= 1/2) must share a prefix token."""
    import math
    from collections import Counter

    df = Counter()
    for s in sets:
        df.update(s)
    order = lambda t: (df[t], t)

    def prefix(s):
        n = len(s)
        p = n - math.ceil(n / 2) + 1
        return set(sorted(s, key=order)[:p])

    for i, a in enumerate(sets):
        for b in sets[i + 1 :]:
            inter = len(a & b)
            if 3 * inter >= len(a) + len(b):
                assert prefix(a) & prefix(b), (sorted(a), sorted(b))
