"""Single-process NumPy/Python Pregel oracle (FIXTURES.md F5).

Mirrors the reference semantics *exactly* (SURVEY.md §2.3): unnormalized
PageRank update ``(1-d) + d·Σ`` with dropped dangling mass and duplicate-
edge multiplicity (reference: example/PageRank.java:48-63), hash-min CC,
mode-with-min-tie-break LP, frontier-relaxation SSSP with deterministic
(dist, pred) struct-min tie-break, exact triangle count.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _index(vertex_ids: list[str], edges: list[tuple[str, str]]):
    idx = {v: i for i, v in enumerate(vertex_ids)}
    src = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    dst = np.array([idx[d] for _, d in edges], dtype=np.int64)
    return idx, src, dst


def pagerank_oracle(
    vertex_ids: list[str],
    edges: list[tuple[str, str]],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_supersteps: int = 200,
    fixed_supersteps: int | None = None,
    dangling: str = "drop",
) -> tuple[dict[str, float], int]:
    """Returns ({id: rank}, supersteps_run)."""
    n = len(vertex_ids)
    _, src, dst = _index(vertex_ids, edges)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    rank = np.ones(n)
    steps = fixed_supersteps if fixed_supersteps is not None else max_supersteps
    ran = 0
    for s in range(steps):
        contrib = np.where(outdeg > 0, rank / np.maximum(outdeg, 1), 0.0)
        sums = np.zeros(n)
        np.add.at(sums, dst, contrib[src])
        if dangling == "redistribute":
            sums = sums + rank[outdeg == 0].sum() / n
        new = (1.0 - damping) + damping * sums
        residual = np.abs(new - rank).sum()
        rank = new
        ran = s + 1
        if fixed_supersteps is None and residual < tol:
            break
    return {v: float(rank[i]) for i, v in enumerate(vertex_ids)}, ran


def _sym_adj(vertex_ids: list[str], edges: list[tuple[str, str]]):
    adj: dict[str, set[str]] = defaultdict(set)
    vs = set(vertex_ids)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return {v: adj.get(v, set()) for v in vs}


def cc_oracle(vertex_ids: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    adj = _sym_adj(vertex_ids, edges)
    label = {v: v for v in vertex_ids}
    changed = True
    while changed:
        changed = False
        new = {}
        for v in vertex_ids:
            incoming = [label[u] for u in adj[v]]
            best = min([label[v]] + incoming)
            new[v] = best
            if best != label[v]:
                changed = True
        label = new
    return label


def lp_oracle(
    vertex_ids: list[str], edges: list[tuple[str, str]], rounds: int = 10
) -> dict[str, str]:
    adj = _sym_adj(vertex_ids, edges)
    label = {v: v for v in vertex_ids}
    for _ in range(rounds):
        new = {}
        any_changed = False
        for v in vertex_ids:
            if adj[v]:
                counts = Counter(label[u] for u in adj[v])
                # mode; tie -> smallest label
                best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            else:
                best = label[v]
            new[v] = best
            any_changed = any_changed or best != label[v]
        label = new
        if not any_changed:
            break
    return label


def triangle_oracle(edges: list[tuple[str, str]]) -> int:
    canon = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj_hi: dict[str, set[str]] = defaultdict(set)
    for a, b in canon:
        adj_hi[a].add(b)
    return sum(len(adj_hi[a] & adj_hi[b]) for a, b in canon)


def sssp_oracle(
    vertex_ids: list[str],
    weighted_edges: list[tuple[str, str, float]],
    source: str,
) -> dict[str, tuple[float | None, str | None]]:
    """Frontier-synchronous relaxation; same tie rule as the engine:
    per round, best incoming = min (dist, pred) tuple; update iff strictly
    smaller distance (reference halt analog: util/DefaultHaltDecider.java:25-29).
    """
    out: dict[str, list[tuple[str, float]]] = defaultdict(list)
    for s, d, w in weighted_edges:
        out[s].append((d, w))
    dist: dict[str, float | None] = {v: None for v in vertex_ids}
    pred: dict[str, str | None] = {v: None for v in vertex_ids}
    dist[source] = 0.0
    pred[source] = source
    frontier = {source}
    while frontier:
        inbox: dict[str, tuple[float, str]] = {}
        for u in frontier:
            for d, w in out.get(u, []):
                cand = (dist[u] + w, u)
                if d not in inbox or cand < inbox[d]:
                    inbox[d] = cand
        frontier = set()
        for v, (cd, cp) in inbox.items():
            if dist[v] is None or cd < dist[v]:
                dist[v], pred[v] = cd, cp
                frontier.add(v)
    return {v: (dist[v], pred[v]) for v in vertex_ids}


def recommend_oracle(
    ratings: list[tuple[str, str, str, float]],
    n_features: int = 2,
    runs_per_feature: int = 3,
    lr: float = 0.001,
    cap: float = 10.0,
):
    """NumPy mirror of the reference SGD recommendations program
    (Recommendations.java:42-119). Returns (U_by_user, M_by_movie,
    residue_by_rating, final_mse)."""
    users = sorted({r[0] for r in ratings})
    movies = sorted({r[1] for r in ratings})
    ui = {u: i for i, u in enumerate(users)}
    mi = {m: i for i, m in enumerate(movies)}
    u_idx = np.array([ui[r[0]] for r in ratings])
    m_idx = np.array([mi[r[1]] for r in ratings])
    rat = np.array([r[3] for r in ratings], dtype=np.float64)
    U = np.ones((len(users), n_features))
    M = np.ones((len(movies), n_features))
    residue = np.zeros(len(ratings))
    gu = np.zeros(len(users))
    gm = np.zeros(len(movies))
    uval = mval = None
    mse = None
    for s in range(n_features * runs_per_feature * 2):
        rnd = s // 2
        cf = rnd // runs_per_feature
        if s % 2 == 0:
            rf = cf - (1 if (rnd % runs_per_feature == 0 and rnd != 0) else 0)
            U[:, rf] = np.clip(U[:, rf] + gu, -cap, cap)
            M[:, rf] = np.clip(M[:, rf] + gm, -cap, cap)
            uval = U[u_idx, cf].copy()
            mval = M[m_idx, cf].copy()
        else:
            pred = residue + uval * mval
            err = lr * (rat - pred)
            gu = np.bincount(u_idx, weights=err * mval, minlength=len(users))
            gm = np.bincount(m_idx, weights=err * uval, minlength=len(movies))
            if (rnd + 1) % runs_per_feature == 0:
                residue = residue + pred
            mse = float((err * err).sum())
    return (
        {u: U[ui[u]].tolist() for u in users},
        {m: M[mi[m]].tolist() for m in movies},
        {ratings[k][2]: float(residue[k]) for k in range(len(ratings))},
        mse,
    )


def bipartite_ratings(m: int, u: int, maxr: int, seed: int):
    """(user_id, movie_id, rating_id, rating) rows shaped like the
    reference generator (Recommendations.java:158-181)."""
    rng = np.random.default_rng(seed)
    out = []
    k = 0
    for i in range(u):
        for _ in range(int(rng.integers(0, maxr))):
            out.append((f"u{i}", f"m{int(rng.integers(0, m))}", f"r{k}", float(rng.integers(0, 5))))
            k += 1
    return out


def rand_graph(v: int, maxdeg: int, seed: int) -> tuple[list[str], list[tuple[str, str]]]:
    """Reference-generator-shaped random graph (example/PageRank.java:113-122):
    outdeg ~ U{0..maxdeg}, uniform targets, self-loops + duplicates allowed."""
    rng = np.random.default_rng(seed)
    ids = [str(i) for i in range(v)]
    deg = rng.integers(0, maxdeg + 1, size=v)
    src = np.repeat(np.arange(v), deg)
    dst = rng.integers(0, v, size=len(src))
    return ids, [(str(s), str(d)) for s, d in zip(src, dst)]


def weighted_rand_graph(
    v: int, maxdeg: int, seed: int
) -> tuple[list[str], list[tuple[str, str, float]]]:
    rng = np.random.default_rng(seed)
    ids = [str(i) for i in range(v)]
    deg = rng.integers(0, maxdeg + 1, size=v)
    src = np.repeat(np.arange(v), deg)
    dst = rng.integers(0, v, size=len(src))
    w = rng.integers(0, 16364, size=len(src))  # reference: ShortestPath.java:116
    return ids, [(str(s), str(d), float(x)) for s, d, x in zip(src, dst, w)]
