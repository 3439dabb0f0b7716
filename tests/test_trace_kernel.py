"""Agreement tests: Pallas traversal kernels vs the XLA wavefront tracer
and brute force."""

import numpy as np
import jax
import jax.numpy as jnp

from vulkan_renderer_tpu.render import trace_kernel as tk
from vulkan_renderer_tpu.render import wavefront as wf
from vulkan_renderer_tpu.render.visibility import (trace_anyhit_bruteforce,
                                                   trace_primary_bruteforce)


def _scene(rng, t=600):
    tris = rng.rand(t, 3, 3).astype(np.float32) * 20
    tris[:, 1] = tris[:, 0] + rng.rand(t, 3) * 1.5
    tris[:, 2] = tris[:, 0] + rng.rand(t, 3) * 1.5
    order = np.argsort(tris[:, 0, 0])
    return tris[order]


def _rays(rng, n=640):
    o = rng.rand(n, 3).astype(np.float32) * 20
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tm = (rng.rand(n) * 25).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)


def test_anyhit_fused_matches_bruteforce():
    rng = np.random.RandomState(0)
    tris = _scene(rng)
    clusters = wf.build_clusters(tris, cluster_size=16)
    o, d, tm = _rays(rng)
    ref = np.asarray(trace_anyhit_bruteforce(jnp.asarray(tris), o, d, tm))
    got, overflow = tk.trace_anyhit_fused(clusters, o, d, tm,
                                          chunk_rows=2, m_budget=64,
                                          interpret=True)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_closest_fused_matches_bruteforce():
    rng = np.random.RandomState(1)
    tris = _scene(rng)
    clusters = wf.build_clusters(tris, cluster_size=16)
    _, d, _ = _rays(rng)
    origin = jnp.asarray(np.array([10.0, 10.0, 25.0], np.float32))
    o = jnp.broadcast_to(origin, d.shape)
    ref_prim, ref_t = trace_primary_bruteforce(jnp.asarray(tris), origin, d)
    prim, t, uncertain = tk.trace_closest_fused(clusters, o, d,
                                                chunk_rows=2, m_budget=64,
                                                interpret=True)
    assert int(uncertain) == 0
    hit = np.isfinite(np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(prim)[hit],
                                  np.asarray(ref_prim)[hit])
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(ref_t)[hit],
                               rtol=1e-5)
    assert not np.isfinite(np.asarray(t)[~hit]).any()


def test_two_level_cull_matches_bruteforce():
    """>1024 clusters activates the supercluster pre-cull; hit results must
    stay exact (overflow reported otherwise)."""
    rng = np.random.RandomState(5)
    tris = _scene(rng, t=4400)
    clusters = wf.build_clusters(tris, cluster_size=4)  # 1100 clusters
    assert clusters.cluster_count > tk._TWO_LEVEL_MIN_CLUSTERS
    o, d, tm = _rays(rng, n=384)
    ref = np.asarray(trace_anyhit_bruteforce(jnp.asarray(tris), o, d, tm))
    got, overflow = tk.trace_anyhit_fused(clusters, o, d, tm,
                                          chunk_rows=1, m_budget=512,
                                          interpret=True)
    got = np.asarray(got)
    if int(overflow) == 0:
        np.testing.assert_array_equal(got, ref)
    else:
        # Budgets too small for random rays: no FALSE positives allowed,
        # and misses must be accounted by the counter.
        assert not (got & ~ref).any()
        assert (ref & ~got).sum() <= int(overflow)


def test_anyhit_fused_overflow_reported():
    """A tiny m_budget must be reported, not silently wrong."""
    rng = np.random.RandomState(2)
    tris = _scene(rng, t=2000)
    clusters = wf.build_clusters(tris, cluster_size=16)
    o, d, tm = _rays(rng, n=256)
    _, overflow = tk.trace_anyhit_fused(clusters, o, d, tm,
                                        chunk_rows=2, m_budget=2,
                                        interpret=True)
    assert int(overflow) > 0
