"""Per-shard graph construction and beam search — the numpy re-expression of
the reference's dehnsw algorithm (source/dehnsw.h). This module is pure
Python/numpy: it runs INSIDE Spark tasks (applyInPandas / cogroup), one call
per shard; Spark supplies the cross-shard parallelism that the reference
lacks (its shards are built one insert at a time on one thread).

Semantics preserved from the reference (cited per function):
  - deterministic layer promotion via bounded BFS, no RNG (dehnsw.h:150-178)
  - degree-capped linking with worst-edge eviction (dehnsw.h:419-466)
  - connectivity veto: an eviction that would disconnect the layer graph is
    rolled back (dehnsw.h:119-148, 467-489)
  - best-first beam search with relaxed-monotonicity patience
    (dehnsw.h:181-237 insert flavor, 241-323 query flavor)

Deliberate divergences (SURVEY §7): float64 distances, (dist, id) total
ordering for ties (the reference's multimap keeps insertion order), and no
replication of the AVX tail-drop or shard-0-only-query bugs.
"""

from __future__ import annotations

import heapq
from collections import deque
from dataclasses import dataclass, field

import numpy as np

# Precomputing the query→all-rows distance row costs O(rows * d) compute
# plus a rows-long .tolist(); the beam it feeds only saves a roughly
# CONSTANT per-query overhead (~1-2 ms of small-einsum dispatch — beam
# size grows ~logarithmically with the shard). Measured crossover on this
# hardware: ~0.5M elements (1.5 ms precompute at 8192 x 64; the saving is
# ~1.5-2 ms), so above this cap the per-pop batched path stays — a beam
# touching a few hundred nodes of a 10^7-row shard must not pay an O(n)
# precompute per query. Both paths are bit-identical: einsum("ij,ij->i")
# contracts per row, so the full-matrix row equals the per-batch subset
# value exactly (pinned in tests/test_round15_opt.py).
_DQ_MAX_ELEMS = 524_288


def _dq_row(X: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All-rows squared-L2 distance from ``q`` — the SAME einsum kernel the
    per-pop batches use, evaluated once (row-wise independent, so each
    entry is bit-identical to the per-batch computation it replaces)."""
    D = X - q
    return np.einsum("ij,ij->i", D, D)


@dataclass
class ShardGraph:
    """In-task graph state for one shard. ``offsets`` are dense 0..n-1 in
    insertion (id) order; ``ids`` maps offset -> global id."""

    X: np.ndarray  # (n, d) float64
    ids: np.ndarray  # (n,) int64 global ids
    layer_of: list[int] = field(default_factory=list)
    # adj[layer][u] = {v: refcount}  (undirected, refcounted — dehnsw.h:43)
    adj: list[dict[int, dict[int, int]]] = field(default_factory=list)
    entry: int = -1  # offset of vector_in_highest_layer (dehnsw.h:62)

    # layer-0 CSR cache for the QUERY path (adjacency is static once built
    # / loaded; build-time mutation must not use this). Neighbor order does
    # not affect results — the candidate/result heaps order by (dist, id),
    # never by push order — so the sorted CSR is value-identical to dict
    # iteration.
    _csr0_cache: tuple | None = None
    # serving blobs (index/serving._pack_shard) strip the layer-0 dict
    # after caching the CSR and mark the graph immutable: a mutation would
    # silently repopulate a near-empty dict and search wrong adjacency
    immutable: bool = False
    # offset-aligned integral attributes for filtered serving
    # (index/serving.ServingIndex(attr_col=...)); None when not packed
    attrs: np.ndarray | None = None

    def csr0(self) -> tuple[np.ndarray, np.ndarray]:
        if self._csr0_cache is None:
            n = len(self.ids)
            adj0 = self.adj[0] if self.adj else {}
            # serving blobs (index/serving._pack_shard) strip the layer-0
            # dict after caching the CSR; if anything invalidates that
            # cache (the graph is supposed to be immutable) a silent
            # rebuild from the stripped dict would return near-empty
            # wrong adjacency — fail loudly instead
            if n > 0 and not adj0:
                raise ValueError(
                    "layer-0 adjacency was stripped (serving blob) and the "
                    "CSR cache is gone — this graph is immutable; rebuild "
                    "it from the edge relation to mutate"
                )
            counts = np.zeros(n + 1, dtype=np.int64)
            for u, m in adj0.items():
                counts[u + 1] = len(m)
            indptr = np.cumsum(counts)
            indices = np.empty(int(indptr[-1]), dtype=np.int64)
            for u, m in adj0.items():
                s = indptr[u]
                indices[s : s + len(m)] = sorted(m)
            self._csr0_cache = (indptr, indices)
        return self._csr0_cache

    def dist(self, a: int, b: int) -> float:
        d = self.X[a] - self.X[b]
        return float(d @ d)

    def dist_q(self, q: np.ndarray, a: int) -> float:
        d = q - self.X[a]
        return float(d @ d)


def _check_mutable(g: ShardGraph) -> None:
    if g.immutable:
        raise ValueError(
            "this graph is an immutable serving blob (layer-0 dict "
            "stripped after CSR caching) — rebuild it from the edge "
            "relation to mutate"
        )


def _add_edge(g: ShardGraph, layer: int, u: int, v: int) -> None:
    _check_mutable(g)
    g.adj[layer].setdefault(u, {})[v] = g.adj[layer].setdefault(u, {}).get(v, 0) + 1
    g.adj[layer].setdefault(v, {})[u] = g.adj[layer].setdefault(v, {}).get(u, 0) + 1
    if layer == 0:
        g._csr0_cache = None  # build path never populates it; cheap to clear


def _remove_edge(g: ShardGraph, layer: int, u: int, v: int) -> None:
    _check_mutable(g)
    for a, b in ((u, v), (v, u)):
        m = g.adj[layer].get(a)
        if m and b in m:
            m[b] -= 1
            if m[b] <= 0:
                del m[b]
    if layer == 0:
        g._csr0_cache = None


def search_layer(
    g: ShardGraph,
    q: np.ndarray,
    entry: int,
    layer: int,
    width: int,
    patience: int,
    dq: list[float] | None = None,
) -> list[tuple[float, int]]:
    """Best-first beam in one layer returning the ``width`` nearest visited
    nodes, early-exiting after ``patience`` consecutive non-improving pops
    (reference nearest_neighbors_insert, dehnsw.h:181-237).

    ``dq`` (optional) is the precomputed :func:`_dq_row` distance row for
    ``q`` as a plain list — per-neighbor distances become list lookups
    instead of one small einsum per expanded node (bit-identical values;
    the build's hottest line before round 15)."""
    X = g.X
    adj = g.adj[layer]
    d0 = g.dist_q(q, entry)
    candidates: list[tuple[float, int]] = [(d0, entry)]
    # plain python set: measured FASTER than epoch-stamped numpy flags here
    # — build-time neighbor lists are <= connect (~8) entries, where
    # fromiter + fancy indexing overhead exceeds set ops (the query path,
    # which batches against a static CSR, is the opposite — see
    # query_shard)
    visited = {entry}
    # result: bounded max-heap of (-dist, -offset) — negating the offset
    # too keeps eviction consistent with the engine-wide (dist, id) total
    # order (equal distances evict the LARGER id first)
    result: list[tuple[float, int]] = [(-d0, -entry)]
    stall = 0
    heappop, heappush = heapq.heappop, heapq.heappush
    heapreplace = heapq.heapreplace
    while candidates:
        d, u = heappop(candidates)
        if len(result) >= width and d > -result[0][0]:
            stall += 1
            if patience and stall >= patience:
                break
        # one vectorized distance evaluation per expanded node (the
        # per-neighbor python-call form was the build's hottest line)
        nbrs = [v for v in adj.get(u, ()) if v not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        if dq is None:
            D = X[nbrs] - q
            dvs = np.einsum("ij,ij->i", D, D).tolist()
        else:
            # dq is a plain list (build_shard_graph converts once per
            # insert): C-speed item lookups beat numpy fancy indexing at
            # these tiny (<= connect) batch sizes
            dvs = [dq[v] for v in nbrs]
        for dv, v in zip(dvs, nbrs):
            heappush(candidates, (dv, v))
            if len(result) < width:
                heappush(result, (-dv, -v))
                stall = 0
            else:
                # inline (dv, v) < (-r0[0], -r0[1]) without tuple builds
                r0 = result[0]
                nr0 = -r0[0]
                if dv < nr0 or (dv == nr0 and v < -r0[1]):
                    heapreplace(result, (-dv, -v))
                    stall = 0
    out = sorted((-nd, -nv) for nd, nv in result)
    return out


def _connected(
    g: ShardGraph, layer: int, start: int, targets: set[int], max_rounds: int = 4
) -> bool:
    """<=4-round BFS from ``start``: are all ``targets`` reachable?
    (reference ``connected``, dehnsw.h:119-148)."""
    return _connected_seen(g, layer, start, targets, max_rounds)[0]


def _connected_seen(
    g: ShardGraph, layer: int, start: int, targets: set[int], max_rounds: int = 4
) -> tuple[bool, bytearray]:
    """:func:`_connected` plus the visited-byte table. On a FAILED check the
    BFS necessarily ran to exhaustion, so ``seen`` is the complete
    ``max_rounds``-reachable set — _link reuses it for the per-target
    restore decisions instead of re-running a whole-shard BFS per target
    (the build's second-hottest path). On success ``seen`` may be partial
    (early exit), but then every target is marked, which is all callers
    test."""
    if not targets:
        return True, bytearray(len(g.ids))
    adj = g.adj[layer]
    # flat byte tables instead of hash sets: the BFS touches most of the
    # shard (degree^4 frontier), so membership tests dominate
    n = len(g.ids)
    seen = bytearray(n)
    seen[start] = 1
    tmask = bytearray(n)
    need = 0
    for t in targets:
        if not tmask[t]:
            tmask[t] = 1
            need += 1
    if tmask[start]:
        need -= 1
        if need == 0:
            return True, seen
    frontier = [start]
    adj_get = adj.get
    for _ in range(max_rounds):
        if not frontier:
            break
        next_frontier: list[int] = []
        append = next_frontier.append
        for u in frontier:
            for v in adj_get(u, ()):
                if not seen[v]:
                    seen[v] = 1
                    if tmask[v]:
                        need -= 1
                        if need == 0:
                            return True, seen
                    append(v)
        frontier = next_frontier
    return need == 0, seen


def _should_promote(g: ShardGraph, layer: int, offset: int, step: int) -> bool:
    """Deterministic promotion (reference insert_to_upper_layer,
    dehnsw.h:150-178): BFS <= ``step`` hops in ``layer``; promote iff no
    node of a higher layer is encountered."""
    frontier = deque([offset])
    seen = {offset}
    for _ in range(step):
        if not frontier:
            break
        next_frontier: deque[int] = deque()
        while frontier:
            u = frontier.popleft()
            for v in g.adj[layer].get(u, ()):
                if v in seen:
                    continue
                if g.layer_of[v] > layer:
                    return False
                seen.add(v)
                next_frontier.append(v)
        frontier = next_frontier
    return True


def _link(g: ShardGraph, layer: int, new: int, neighbors: list[tuple[float, int]],
          connect: int) -> None:
    """Bidirectional linking with degree cap + connectivity repair
    (reference add, dehnsw.h:419-489)."""
    deleted: list[tuple[int, int]] = []
    for _, v in neighbors:
        _add_edge(g, layer, new, v)
        # degree cap on the neighbor: evict its worst edge (by (dist, id))
        m = g.adj[layer].get(v, {})
        if len(m) > connect:
            others = [w for w in m if w != new]
            if others:
                D = g.X[others] - g.X[v]
                dd = np.einsum("ij,ij->i", D, D).tolist()
                wi = max(range(len(others)), key=lambda i: (dd[i], others[i]))
                if dd[wi] > g.dist(v, new):
                    _remove_edge(g, layer, v, others[wi])
                    deleted.append((v, others[wi]))
    # connectivity repair: restore any eviction whose endpoint became
    # unreachable from the new vector (dehnsw.h:467-489). The failed batch
    # check's BFS ran to exhaustion, so its seen table answers every
    # per-target reachability question for free; the BFS only re-runs
    # after an ACTUAL restore (reachability grew) — semantically identical
    # to the per-target _connected loop, measured ~25% off the shard build
    # (restores are rare next to checks).
    targets = {w for _, w in deleted}
    if targets:
        ok, seen = _connected_seen(g, layer, new, targets)
        if not ok:
            for i, (v, w) in enumerate(deleted):
                if seen[w]:
                    continue
                _add_edge(g, layer, v, w)
                remaining = {w2 for _, w2 in deleted[i + 1:]}
                if not remaining:
                    break
                _, seen = _connected_seen(g, layer, new, remaining)


def build_shard_graph(
    X: np.ndarray,
    ids: np.ndarray,
    connect: int,
    patience: int,
    step: int,
) -> ShardGraph:
    """Sequential shard build in id order (insertion order = id order,
    mirroring global_offset semantics, dehnsw.h:599). Returns the built
    graph; serialize with :func:`graph_to_rows`."""
    g = ShardGraph(X=np.asarray(X, dtype=np.float64), ids=np.asarray(ids))
    n = len(ids)
    if n == 0:
        return g
    g.layer_of = [0] * n
    g.adj = [dict()]
    g.adj[0][0] = {}
    g.entry = 0
    dim = g.X.shape[1] if g.X.ndim == 2 else 1
    for i in range(1, n):
        q = g.X[i]
        # one distance row per insert serves every layer's beam, sliced to
        # the already-inserted prefix (the adjacency only contains offsets
        # < i, so nothing past the slice is ever looked up — a stray
        # lookup would raise IndexError loudly); gated per insert so only
        # the profitable prefix sizes pay the precompute
        dq = _dq_row(g.X[:i], q).tolist() if i * dim <= _DQ_MAX_ELEMS else None
        top = g.layer_of[g.entry]
        # candidate collection: beam per layer top-down, seeded by the
        # previous layer's best (dehnsw.h:405-417)
        entry = g.entry
        per_layer: list[list[tuple[float, int]]] = []
        for layer in range(top, -1, -1):
            found = search_layer(g, q, entry, layer, connect, patience, dq=dq)
            per_layer.append(found)
            entry = found[0][1]
        per_layer.reverse()  # per_layer[l] = candidates at layer l
        g.adj[0].setdefault(i, {})
        _link(g, 0, i, per_layer[0], connect)
        # promotion loop (dehnsw.h:491-507)
        layer = 0
        while layer < g.layer_of[g.entry] + 1 and _should_promote(g, layer, i, step):
            layer += 1
            g.layer_of[i] = layer
            if layer > g.layer_of[g.entry]:
                # new top layer: i becomes the global entry point
                # (dehnsw.h:495-499)
                while len(g.adj) <= layer:
                    g.adj.append(dict())
                g.adj[layer].setdefault(i, {})
                g.entry = i
                break
            while len(g.adj) <= layer:
                g.adj.append(dict())
            g.adj[layer].setdefault(i, {})
            if layer < len(per_layer):
                cands = per_layer[layer]
            else:
                cands = search_layer(
                    g, q, g.entry, layer, connect, patience, dq=dq
                )
            cands = [(d, v) for d, v in cands if g.layer_of[v] >= layer and v != i]
            if cands:
                _link(g, layer, i, cands, connect)
    return g


def query_shard(
    g: ShardGraph,
    q: np.ndarray,
    k: int,
    patience: int,
    allowed: np.ndarray | None = None,
) -> list[tuple[float, int]]:
    """Full ANN query against one shard (reference nearest_neighbors_query,
    dehnsw.h:241-323): greedy descent L..1 carrying the candidate heap, then
    best-first beam at layer 0 with top-k max-heap + patience.

    ``allowed`` (optional) is a bool mask over shard OFFSETS: the
    filter-during-search rule of filtered HNSW — every node still
    NAVIGATES (the beam traverses non-matching nodes so the graph stays
    connected through them), but only matching nodes enter the result
    heap, and only matching pops advance the patience counter
    (non-matching pops are pure navigation, not evidence of
    convergence)."""
    if g.entry < 0:
        return []
    top = g.layer_of[g.entry]
    entry = g.entry
    d_entry = g.dist_q(q, entry)
    candidates: list[tuple[float, int]] = [(d_entry, entry)]
    # flat visited flags + CSR layer-0 adjacency: the query graph is
    # static, so neighbor lists are numpy slices and membership tests are
    # array loads — same values as the dict/set form (heap order is by
    # (dist, id), never by neighbor iteration order)
    visited = np.zeros(len(g.ids), dtype=bool)
    visited[entry] = True
    # descent: hill-climb per layer; heap carried across layers
    # (dehnsw.h:258-279 — note the heap is not reset per layer)
    for layer in range(top, 0, -1):
        improved = True
        while improved:
            improved = False
            best = candidates[0]
            for v in g.adj[layer].get(best[1], ()):
                if visited[v]:
                    continue
                visited[v] = True
                dv = g.dist_q(q, v)
                heapq.heappush(candidates, (dv, v))
            if candidates[0] != best:
                improved = True
    # layer-0 beam (dehnsw.h:280-321); max-heap of (-d, -off) so ties
    # evict the larger id, matching the (dist, id) total order
    result: list[tuple[float, int]] = []
    stall = 0
    X = g.X
    indptr, indices = g.csr0()
    # one distance row per query replaces the per-pop einsum batches
    # (bit-identical values — see _dq_row); the per-pop path stays for
    # shards past the scratch cap
    dq = _dq_row(X, q).tolist() if X.size <= _DQ_MAX_ELEMS else None
    heappop, heappush = heapq.heappop, heapq.heappush
    heapreplace = heapq.heapreplace
    while candidates:
        d, u = heappop(candidates)
        if allowed is None or allowed[u]:
            if len(result) >= k:
                # inline (d, u) < (-r0[0], -r0[1]) without tuple builds
                r0 = result[0]
                nr0 = -r0[0]
                if d < nr0 or (d == nr0 and u < -r0[1]):
                    heapreplace(result, (-d, -u))
                    stall = 0
                else:
                    stall += 1
                    if patience and stall >= patience:
                        break
            else:
                heappush(result, (-d, -u))
                stall = 0
        nbrs = indices[indptr[u] : indptr[u + 1]]
        fresh = nbrs[~visited[nbrs]]
        if fresh.size:
            visited[fresh] = True
            fl = fresh.tolist()
            if dq is None:
                D = X[fresh] - q
                dvs = np.einsum("ij,ij->i", D, D).tolist()
            else:
                dvs = [dq[v] for v in fl]
            for dv, v in zip(dvs, fl):
                heappush(candidates, (dv, v))
    return sorted((-nd, -nv) for nd, nv in result)


def graph_to_rows(g: ShardGraph, shard: int) -> list[tuple[int, int, int, int, float]]:
    """Serialize to the edge relation (shard, layer, src, dst, dist) in
    GLOBAL ids. Every node also emits a self-row (src == dst, dist 0) at its
    top layer, so entry points and isolated top-layer nodes survive the
    round trip (the relational form of the save format, dehnsw.h:666-736)."""
    rows: list[tuple[int, int, int, int, float]] = []
    for off in range(len(g.ids)):
        gid = int(g.ids[off])
        rows.append((shard, g.layer_of[off], gid, gid, 0.0))
    for layer, adj in enumerate(g.adj):
        for u, nbrs in adj.items():
            gu = int(g.ids[u])
            for v in nbrs:
                if u < v:
                    rows.append(
                        (shard, layer, gu, int(g.ids[v]), g.dist(u, v))
                    )
    return rows


def graph_from_rows(
    X: np.ndarray, ids: np.ndarray, edge_rows: np.ndarray
) -> ShardGraph:
    """Rebuild a ShardGraph from (layer, src, dst, dist) rows with global
    ids (inverse of :func:`graph_to_rows`)."""
    g = ShardGraph(X=np.asarray(X, dtype=np.float64), ids=np.asarray(ids))
    n = len(ids)
    off_of = {int(gid): i for i, gid in enumerate(ids)}
    g.layer_of = [0] * n
    self_rows = edge_rows[edge_rows[:, 1] == edge_rows[:, 2]]
    for layer, src, _dst in self_rows[:, :3].astype(np.int64):
        g.layer_of[off_of[int(src)]] = int(layer)
    max_layer = max(g.layer_of, default=0)
    g.adj = [dict() for _ in range(max_layer + 1)]
    for off, lay in enumerate(g.layer_of):
        for l in range(lay + 1):
            g.adj[l].setdefault(off, {})
    real = edge_rows[edge_rows[:, 1] != edge_rows[:, 2]]
    for layer, src, dst in real[:, :3].astype(np.int64):
        _add_edge(g, int(layer), off_of[int(src)], off_of[int(dst)])
    # entry = highest-layer node, min id tiebreak (dehnsw.h:62 semantics)
    g.entry = min(
        (off for off in range(n) if g.layer_of[off] == max_layer),
        default=-1,
        key=lambda o: int(g.ids[o]),
    )
    return g
