"""Native C++ host-kernel tests: the min-degree ordering must match the
pure-Python implementation exactly (same algorithm, same tie-breaking)."""

import numpy as np
import pytest
from scipy import sparse as sp

from slampp_tpu.core import native_host
from slampp_tpu.core.ordering import block_adjacency


def _python_min_degree(adj, constrained_last=None):
    """The pure-Python reference path (bypassing the native fast path)."""
    import heapq

    n = adj.shape[0]
    last = set(int(x) for x in (constrained_last or ()))
    nbrs = [set(adj.indices[adj.indptr[i] : adj.indptr[i + 1]].tolist()) for i in range(n)]
    for i in range(n):
        nbrs[i].discard(i)
    eliminated = np.zeros(n, bool)
    heap = [(len(nbrs[i]), i) for i in range(n) if i not in last]
    heapq.heapify(heap)
    order = []
    while heap:
        d, v = heapq.heappop(heap)
        if eliminated[v] or v in last:
            continue
        if d != len(nbrs[v]):
            heapq.heappush(heap, (len(nbrs[v]), v))
            continue
        eliminated[v] = True
        order.append(v)
        live = [u for u in nbrs[v] if not eliminated[u]]
        for a in live:
            s = nbrs[a]
            s.discard(v)
            before = len(s)
            s.update(live)
            s.discard(a)
            if len(s) != before:
                heapq.heappush(heap, (len(s), a))
    order.extend(sorted(last))
    return np.asarray(order, dtype=np.int64)


@pytest.mark.skipif(not native_host.available(), reason="native lib not built")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_min_degree_matches_python(seed):
    rng = np.random.default_rng(seed)
    n = 120
    pairs = {(i + 1, i) for i in range(n - 1)}
    for _ in range(150):
        i, j = rng.integers(0, n, 2)
        if i != j:
            pairs.add((max(i, j), min(i, j)))
    adj = block_adjacency(n, sorted(pairs))
    p_py = _python_min_degree(adj)
    p_cc = native_host.min_degree_order(adj.indptr, adj.indices)
    np.testing.assert_array_equal(p_py, p_cc)
    # with last-element constraints
    p_py2 = _python_min_degree(adj, [n - 1, 3])
    p_cc2 = native_host.min_degree_order(adj.indptr, adj.indices, [n - 1, 3])
    np.testing.assert_array_equal(p_py2, p_cc2)
    # valid permutation
    assert sorted(p_cc.tolist()) == list(range(n))
