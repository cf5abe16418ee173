"""Sweep: compile + EXECUTE every reference .gm app through the DSL
pipeline on a small RMAT graph (CPU), with generically synthesized
arguments.  Tracks the lowerable-subset count (VERDICT r1 item 6).

Usage: python scripts/app_sweep.py [--no-opt]
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from green_marl_tpu.graph import generate as gen  # noqa: E402
from green_marl_tpu.graph.csr import from_edges  # noqa: E402
from green_marl_tpu.lang.lower import LowerError, compile_file  # noqa: E402

PRIM_DEFAULT = {
    "INT": 4, "LONG": 4, "FLOAT": 0.3, "DOUBLE": 0.3, "BOOL": True,
}


def arg_value(t, g, rng):
    k = t.kind
    if k == "GRAPH":
        return g
    if k in PRIM_DEFAULT:
        return PRIM_DEFAULT[k]
    if k in ("NODE",):
        return jnp.asarray(1, jnp.int32)   # per-name overrides in main
    if k in ("EDGE",):
        return jnp.asarray(0, jnp.int32)
    if k == "NODEPROP":
        # never supplied: _bind allocates zeros and RETURNS the final
        # values, which the output validators need
        return "SKIP"
    if k == "EDGEPROP":
        base = t.elem.kind if t.elem is not None else "DOUBLE"
        if base in ("INT", "LONG"):
            return jnp.ones((g.e_pad,), jnp.int32)   # unit weights
        return "SKIP"
    if k == "NSET":
        return "SKIP"        # output-style: let _bind allocate empty
    if k in ("NSEQ", "NORDER"):
        return np.array([1, 2, 3], np.int32)   # e.g. bc.gm seed list
    return None


# ---------------------------------------------------------------------------
# Output validators: numpy oracles / structural invariants per app —
# the sweep fails on wrong output, not just on exceptions
# (VERDICT r2 item 5).  ``v(g, kwargs, out, aux)`` raises on mismatch.
# ---------------------------------------------------------------------------

def _csr(g):
    e = g.num_edges
    return (np.asarray(g.node_idx_src)[:e], np.asarray(g.node_idx)[:e])


def _bfs_np(g, root):
    import collections
    s_, d_ = _csr(g)
    n = g.num_nodes
    adj = [[] for _ in range(n)]
    for a, b in zip(s_, d_):
        adj[a].append(b)
    INF = np.iinfo(np.int32).max
    dist = np.full(n, INF, np.int64)
    dist[root] = 0
    q = collections.deque([root])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if dist[w] > dist[u] + 1:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _nkey(out, *names):
    for nm in names:
        if nm in out:
            return np.asarray(out[nm])
    raise AssertionError(f"missing output {names}; have {list(out)}")


def v_pagerank(g, kw, out, aux):
    from green_marl_tpu.models.pagerank import pagerank_np
    exp, _, _ = pagerank_np(np.asarray(g.begin),
                            np.asarray(g.node_idx)[:g.num_edges],
                            e=kw["e"], d=kw["d"], max_iter=kw["max"])
    got = _nkey(out, "pg_rank")[: g.num_nodes]
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=1e-9)


def v_hop_dist(g, kw, out, aux):
    exp = _bfs_np(g, int(kw["root"]))
    got = _nkey(out, "dist")[: g.num_nodes].astype(np.int64)
    np.testing.assert_array_equal(got, exp)


def v_sssp(g, kw, out, aux):
    # unit weights -> BFS distances
    exp = _bfs_np(g, int(kw["root"]))
    got = _nkey(out, "dist")[: g.num_nodes].astype(np.int64)
    np.testing.assert_array_equal(got, exp)


def v_sssp_path(g, kw, out, aux):
    n = g.num_nodes
    exp = _bfs_np(g, int(kw.get("root", kw.get("src", 1))))
    dist = _nkey(out, "dist")[:n].astype(np.int64)
    np.testing.assert_array_equal(dist, exp)
    prev = _nkey(out, "prev_node", "prev")[:n]
    s_, d_ = _csr(g)
    edges = set(zip(s_.tolist(), d_.tolist()))
    for v in range(n):
        p = int(prev[v])
        if p >= 0:
            assert (p, v) in edges and dist[v] == dist[p] + 1, (v, p)


def v_triangles(g, kw, out, aux):
    # literal slot semantics (parallel edges multiply wedge counts,
    # like the generated OpenMP loops) — not the set-deduped count
    import collections
    s_, d_ = _csr(g)
    nbrs = collections.defaultdict(set)
    for a, b in zip(s_, d_):
        nbrs[a].add(b)
    T = 0
    for v in range(g.num_nodes):
        row = d_[s_ == v]
        for u in row:
            if u <= v:
                continue
            for w in row:
                if w > u and u in nbrs[w]:
                    T += 1
    assert int(np.asarray(out["_return"])) == T, \
        (int(np.asarray(out["_return"])), T)


def v_triangles_dir(g, kw, out, aux):
    s_, d_ = _csr(g)
    import collections
    nbrs = collections.defaultdict(set)
    for a, b in zip(s_, d_):
        nbrs[a].add(b)
    T = 0
    n = g.num_nodes
    for v in range(n):
        row = d_[s_ == v]          # slot semantics, multiplicity kept
        for u in row:
            for w in row:
                if w > u and (w in nbrs[u] or u in nbrs[w]):
                    T += 1
    assert int(np.asarray(out["_return"])) == T, \
        (int(np.asarray(out["_return"])), T)


def v_conduct(g, kw, out, aux):
    member = np.zeros(g.num_nodes, np.int64)   # synthesized zeros
    num = kw["num"]
    s_, d_ = _csr(g)
    din = int((member[s_] == num).sum())
    dout = int((member[s_] != num).sum())
    cross = int(((member[s_] == num) & (member[d_] != num)).sum())
    mm = min(din, dout)
    exp = (0.0 if cross == 0 else np.inf) if mm == 0 else cross / mm
    got = float(np.asarray(out["_return"]))
    assert (np.isinf(exp) and np.isinf(got)) or \
        abs(got - exp) < 1e-5 * max(1.0, abs(exp)), (got, exp)


def v_scc(g, kw, out, aux):
    from green_marl_tpu.models.scc import scc_np
    exp = scc_np(np.asarray(g.begin),
                 np.asarray(g.node_idx)[:g.num_edges])
    got = _nkey(out, "mem", "SCC", "scc")[: g.num_nodes]
    # partition equivalence: same classes, arbitrary representatives
    import collections
    m1, m2 = collections.defaultdict(set), collections.defaultdict(set)
    for v in range(g.num_nodes):
        m1[int(got[v])].add(v)
        m2[int(exp[v])].add(v)
    assert sorted(map(sorted, m1.values())) == \
        sorted(map(sorted, m2.values()))


def v_tarjan_literal(g, kw, out, aux):
    """tarjan_scc.gm is NOT exact Tarjan (post-visit LowLink folds read
    popped neighbors' LowLink without the InStack check), so validate
    against a faithful per-restart replication of the app, not against
    true SCC."""
    import sys as _sys
    _sys.setrecursionlimit(200000)
    begin, ni = np.asarray(g.begin), np.asarray(g.node_idx)
    N = g.num_nodes
    SCC = np.full(N, -1)
    InStack = np.zeros(N, bool)
    Low = np.zeros(N, np.int64)
    stack = []

    def run_from(n):
        visited = np.zeros(N, bool)

        def dfs(t):
            if visited[t] or InStack[t]:
                return
            visited[t] = True
            stack.append(t)
            InStack[t] = True
            Low[t] = t
            for w in ni[begin[t]:begin[t + 1]]:
                if w < N:
                    dfs(int(w))
            for k in ni[begin[t]:begin[t + 1]]:
                if k < N and Low[int(k)] < Low[t]:
                    Low[t] = Low[int(k)]
            if Low[t] == t:
                w = stack.pop()
                while w != t:
                    InStack[w] = False
                    SCC[w] = t
                    w = stack.pop()
                InStack[w] = False
                SCC[w] = t
        dfs(n)

    for n in range(N):
        if SCC[n] == -1:
            run_from(n)
    got = _nkey(out, "SCC")[: N]
    np.testing.assert_array_equal(got, SCC)


def _brandes_round(g, sd, BC, exclude_src=False):
    """One bc round from seed ``sd`` accumulated into ``BC``, literal
    InBFS/InReverse semantics.  ``exclude_src=False`` is bc.gm /
    bc_random.gm: visit_fw also runs for the root
    (gm_bfs_template.h:102), so sigma[root] is overwritten by the empty
    UpNbrs sum and NaNs propagate exactly like the reference binary.
    ``exclude_src=True`` is bc_adj.gm's ``(v != s)`` navigator on both
    passes: sigma[src] stays 1, src accumulates nothing."""
    import collections
    begin, ni = np.asarray(g.begin), np.asarray(g.node_idx)
    rbegin, rni = np.asarray(g.r_begin), np.asarray(g.r_node_idx)
    N = g.num_nodes
    level = np.full(N, -1)
    level[sd] = 0
    order = [sd]
    q = collections.deque([sd])
    while q:
        u = q.popleft()
        for v in ni[begin[u]:begin[u + 1]]:
            if v < N and level[v] < 0:
                level[v] = level[u] + 1
                q.append(v)
                order.append(v)
    sigma = np.zeros(N, np.float32)
    sigma[sd] = 1
    for u in sorted(order, key=lambda x: level[x]):
        if exclude_src and u == sd:
            continue
        sigma[u] = sum(sigma[p] for p in rni[rbegin[u]:rbegin[u + 1]]
                       if level[p] == level[u] - 1)
    delta = np.zeros(N, np.float32)
    for u in sorted(order, key=lambda x: -level[x]):
        if exclude_src and u == sd:
            continue
        tot = np.float32(0)
        for w in ni[begin[u]:begin[u + 1]]:
            if w < N and level[w] == level[u] + 1:
                tot += sigma[u] / sigma[w] * (1 + delta[w])
        delta[u] = tot
        BC[u] += delta[u]


def v_bc(g, kw, out, aux):
    N = g.num_nodes
    BC = np.zeros(N, np.float32)
    for sd in [1, 2, 3]:
        _brandes_round(g, sd, BC)
    got = _nkey(out, "BC")[: N]
    np.testing.assert_array_equal(np.isnan(got), np.isnan(BC))
    m = ~np.isnan(BC)
    np.testing.assert_allclose(got[m], BC[m], rtol=1e-4)


def v_bc_adj(g, kw, out, aux):
    """bc_adj.gm: every node is a seed, with the ``(v != s)`` source
    exclusion on both passes — proper Brandes, fully deterministic."""
    N = g.num_nodes
    BC = np.zeros(N, np.float32)
    for sd in range(N):
        _brandes_round(g, sd, BC, exclude_src=True)
    got = _nkey(out, "BC")[: N]
    np.testing.assert_allclose(got, BC, rtol=1e-4, atol=1e-5)


def v_bc_random(g, kw, out, aux):
    """bc_random.gm: the K PickRandom seeds come from the lowerer's
    counter-based threefry stream (lower.py:_rng_uniform) — fully
    replicable on the host.  The draw-site/counter pattern depends on
    whether the While body traced or ran eagerly (InBFS forces eager),
    so both candidate seed sequences are derived and ONE must reproduce
    the BC output."""
    import jax.random as jr
    K = int(np.asarray(kw["K"]))
    N = g.num_nodes
    got = _nkey(out, "BC")[: N]

    def seeds_for(pattern):
        sds = []
        for i in range(K):
            site = i + 1 if pattern == "eager" else 1
            key = jr.fold_in(jr.fold_in(jr.PRNGKey(0), np.uint32(i)),
                             site)
            u = float(jr.uniform(key, ()))
            sds.append(min(max(int(u * N), 0), N - 1))
        return sds

    errs = []
    for pattern in ("eager", "traced"):
        BC = np.zeros(N, np.float32)
        for sd in seeds_for(pattern):
            _brandes_round(g, sd, BC)
        m = ~np.isnan(BC)
        try:
            np.testing.assert_array_equal(np.isnan(got), np.isnan(BC))
            np.testing.assert_allclose(got[m], BC[m], rtol=1e-4)
            return
        except AssertionError as e:
            errs.append(f"{pattern}: {str(e)[:100]}")
    raise AssertionError(
        "bc_random output matches neither candidate seed stream: "
        + "; ".join(errs))


def v_b2(g, kw, out, aux):
    """b2.gm: InDFS on the TRANSPOSED graph (G^) from s — the pre body
    sets A = B+1 and the post body B = A+1 for every visited node, so
    values are order-independent and the visited set is exactly
    reverse-reachability from s (the host DFS visits semi-sorted
    neighbors deterministically)."""
    s = int(np.asarray(kw["s"]))
    rbegin, rni = np.asarray(g.r_begin), np.asarray(g.r_node_idx)
    N = g.num_nodes
    seen = np.zeros(N, bool)
    seen[s] = True
    stack = [s]
    while stack:
        u = stack.pop()
        for v in rni[rbegin[u]:rbegin[u + 1]]:
            if v < N and not seen[v]:
                seen[v] = True
                stack.append(v)
    a = _nkey(out, "A")[: N]
    b = _nkey(out, "B")[: N]
    np.testing.assert_array_equal(a[seen], 1)
    np.testing.assert_array_equal(b[seen], 2)
    np.testing.assert_array_equal(a[~seen], 0)
    np.testing.assert_array_equal(b[~seen], 0)


def v_communities(g, kw, out, aux):
    comm = _nkey(out, "Comm")[: g.num_nodes]
    s_, d_ = _csr(g)
    # fixpoint: every node's label count among neighbors is maximal
    for x in range(g.num_nodes):
        labs = comm[d_[s_ == x]]
        if len(labs) == 0:
            continue
        vals, cnts = np.unique(labs, return_counts=True)
        cur = cnts[vals == comm[x]]
        assert cur.size and cur[0] == cnts.max(), x


def v_vcover(g, kw, out, aux):
    covered = _nkey(out, "Covered", "covered", "select")
    s_, d_ = _csr(g)
    if covered.shape[0] >= g.e_pad:      # edge prop: selection flags
        # recompute node cover from selected edges
        sel = covered[: g.num_edges].astype(bool)
        cov = np.zeros(g.num_nodes, bool)
        cov[s_[sel]] = True
        cov[d_[sel]] = True
    else:
        cov = covered[: g.num_nodes].astype(bool)
    assert ((cov[s_]) | (cov[d_])).all(), "uncovered edge"


def v_matching(g, kw, out, aux):
    match = _nkey(out, "Match")[: g.num_nodes]
    s_, d_ = _csr(g)
    edges = set(zip(s_.tolist(), d_.tolist()))
    cnt = 0
    for v in range(g.num_nodes):
        m = int(match[v])
        if m >= 0:
            assert int(match[m]) == v, (v, m)
            assert (v, m) in edges or (m, v) in edges
            cnt += 1
    assert cnt // 2 == int(np.asarray(out["_return"]))


def v_selected_count(g, kw, out, aux):
    sel = _nkey(out, "Selected")[: g.num_nodes].astype(bool)
    assert sel.sum() >= int(g.num_nodes * kw["p_size"])


def v_sampled_set(g, kw, out, aux):
    s = _nkey(out, "S")[: g.num_nodes].astype(bool)
    assert 0 < s.sum() <= g.num_nodes


def v_avg_teen(g, kw, out, aux):
    # synthesized age = zeros -> no teens, no node with age > K -> 0
    assert float(np.asarray(out["_return"])) == 0.0


def v_adamic2(g, kw, out, aux):
    """adamicAdar2.gm counts wedges into ``from.cnt``:
    cnt[from] += 1 for every (to, n, from) with n, from in InNbrs(to)
    and from->n an edge (slot multiplicity kept)."""
    import collections
    cnt = _nkey(out, "cnt")[: g.num_nodes].astype(np.int64)
    s_, d_ = _csr(g)
    nbrs = collections.defaultdict(set)
    for a, b in zip(s_, d_):
        nbrs[a].add(b)
    exp = np.zeros(g.num_nodes, np.int64)
    innbrs = collections.defaultdict(list)
    for a, b in zip(s_, d_):
        innbrs[b].append(a)
    for to in range(g.num_nodes):
        row = innbrs[to]
        for n in row:
            for fr in row:
                if n in nbrs[fr]:
                    exp[fr] += 1
    np.testing.assert_array_equal(cnt, exp)


def v_adamic2_zero(g, kw, out, aux):
    # adamicAdar2.gm's aa writes are commented out; the wedge counting
    # goes into a *local* N_P cnt that is not an output — assert the
    # declared output stayed at its default
    aa = _nkey(out, "aa")[: g.num_edges]
    assert (aa == 0).all()


def v_dijkstra(g, kw, out, aux):
    """sssp_dijkstra.gm: Parent chain from dest reaches root with BFS
    distance steps (unit weights)."""
    n = g.num_nodes
    root, dest = int(kw["root"]), int(kw["dest"])
    exp = _bfs_np(g, root)
    found = bool(np.asarray(out["_return"]))
    INF = np.iinfo(np.int32).max
    assert found == (exp[dest] < INF)
    if not found:
        return
    par = _nkey(out, "Parent")[: n]
    s_, d_ = _csr(g)
    edges = set(zip(s_.tolist(), d_.tolist()))
    cur, hops = dest, 0
    while cur != root:
        p = int(par[cur])
        assert p >= 0 and (p, cur) in edges, (p, cur)
        cur = p
        hops += 1
        assert hops <= n
    assert hops == exp[dest]


def v_sssp_path_adj(g, kw, out, aux):
    # goal-directed search with pruning (n.dist < end.dist); edge_cost
    # is an unsupplied Double prop (zeros) -> distances are 0 or +INF,
    # the end node reaches 0 iff reachable, prev edges are real edges
    n = g.num_nodes
    root, end = int(kw["root"]), int(kw["end"])
    exp = _bfs_np(g, root)
    INF = np.iinfo(np.int32).max
    dist = _nkey(out, "dist")[: n]
    assert dist[root] == 0
    assert np.isin(dist, [0.0, np.inf]).all()
    if exp[end] < INF:
        assert dist[end] == 0
    prev = _nkey(out, "prev_node")[: n]
    s_, d_ = _csr(g)
    edges = set(zip(s_.tolist(), d_.tolist()))
    for v in range(n):
        p = int(prev[v])
        if p >= 0:
            assert (p, v) in edges, (v, p)


def v_adamic(g, kw, out, aux):
    import collections
    aa = _nkey(out, "aa")[: g.num_edges]
    s_, d_ = _csr(g)
    nbrs = collections.defaultdict(set)
    for a, b in zip(s_, d_):
        nbrs[a].add(b)
    outdeg = np.diff(np.asarray(g.begin))
    exp = np.zeros(g.num_edges)
    for i, (a, b) in enumerate(zip(s_, d_)):
        exp[i] = sum(1.0 / np.log(outdeg[n]) for n in d_[s_ == a]
                     if n in nbrs[b])
    m = np.isfinite(exp)
    np.testing.assert_allclose(aa[m], exp[m], rtol=1e-4, atol=1e-6)


def v_finite(key):
    def check(g, kw, out, aux):
        arr = _nkey(out, key)
        assert np.isfinite(np.asarray(arr, np.float64)).all()
    return check


VALIDATORS = {
    "pagerank": v_pagerank,
    "hop_dist": v_hop_dist,
    "sssp": v_sssp,
    "sssp_path": v_sssp_path,
    "sssp_path_adj": v_sssp_path_adj,
    "sssp_dijkstra": v_dijkstra,
    "triangle_counting": v_triangles,
    "triangle_counting_directed": v_triangles_dir,
    "conduct": v_conduct,
    "kosaraju": v_scc,
    "tarjan_scc": v_tarjan_literal,
    "bc": v_bc,
    "communities": v_communities,
    "v_cover": v_vcover,
    "random_bipartite_matching": v_matching,
    "parallel_random_walk_jump_sampling": v_selected_count,
    "random_node_sampling": v_sampled_set,
    "random_degree_node_sampling": v_sampled_set,
    "random_walk_sampling_with_random_jump": v_sampled_set,
    "avg_teen_cnt": v_avg_teen,
    "adamicAdar": v_adamic,
    "adamicAdar2": v_adamic2_zero,
    "potential_friends": None,   # oracle-tested in tests/test_lower_maps
    "bidir_dijkstra": None,      # oracle-tested in tests/test_lower_maps
    "bc_adj": v_bc_adj,
    "bc_random": v_bc_random,
    "b2": v_b2,
}


def main():
    do_opt = "--no-opt" not in sys.argv
    src, dst = gen.rmat_edges(200, 1200, seed=3)
    g, _ = from_edges(src, dst, 200)
    rng = np.random.default_rng(0)

    ok, fail = [], []
    n_checked = 0
    for f in sorted(glob.glob("/root/reference/apps/src/*.gm")):
        name = os.path.basename(f)[:-3]
        try:
            proc_name = {"sssp_dijkstra": "dijkstra",
                         "tarjan_scc": "Tarjan",
                         "sssp_path_adj": "sssp_path"}.get(name)
            cp = compile_file(f, optimize=do_opt, name=proc_name)
            proc = cp.proc
            kwargs = {}
            for a in proc.args:
                if a.type.kind == "GRAPH":
                    continue
                for nm in a.names:
                    v = arg_value(a.type, g, rng)
                    if v is None:
                        raise LowerError(
                            f"no generic value for arg type {a.type.kind}")
                    if isinstance(v, str) and v == "SKIP":
                        continue
                    if a.type.kind == "NODE" and nm in ("end", "dest",
                                                        "dst"):
                        v = jnp.asarray(7, jnp.int32)  # distinct target
                    kwargs[nm] = v
            out = cp(g, **kwargs)
            check = VALIDATORS.get(name)
            if check is not None:
                check(g, kwargs, out, None)
                n_checked += 1
                ok.append(name + " [oracle]")
            else:
                ok.append(name)
        except Exception as e:  # noqa
            fail.append((name, f"{type(e).__name__}: {str(e)[:140]}"))
    print(f"EXEC OK: {len(ok)}/27  (oracle-verified: {n_checked})")
    for n in ok:
        print("  ok  ", n)
    for n, e in fail:
        print("  FAIL", n, "--", e)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
