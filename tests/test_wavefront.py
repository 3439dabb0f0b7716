"""Sorted-wavefront tracer correctness against brute force.

Covers the chunked cull-inside-scan path (slab + top_k compaction per row
chunk) for both closest-hit and any-hit, including multi-chunk execution
and the budget-overflow/uncertainty accounting."""

import numpy as np
import pytest

import vulkan_renderer_tpu.render.wavefront as wf


def _random_tris(rng, n, spread=4.0):
    centers = rng.uniform(-spread, spread, (n, 1, 3))
    offsets = rng.uniform(-0.4, 0.4, (n, 3, 3))
    return (centers + offsets).astype(np.float32)


def _brute_closest(tris, origins, dirs, t_min=1e-3):
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    t_best = np.full(dirs.shape[0], np.inf, np.float32)
    prim = np.full(dirs.shape[0], 0xFFFFFFFF, np.uint64)
    for k in range(tris.shape[0]):
        p = np.cross(dirs, e2[k])
        det = np.sum(e1[k] * p, axis=-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = origins - v0[k]
        u = np.sum(tv * p, axis=-1) * inv
        q = np.cross(tv, e1[k])
        v = np.sum(dirs * q, axis=-1) * inv
        t = np.sum(e2[k] * q, axis=-1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= t_min) \
            & (t < t_best)
        t_best = np.where(hit, t, t_best)
        prim = np.where(hit, k, prim)
    return prim, t_best


@pytest.mark.parametrize("t_count,rays", [(40, 64), (500, 128)])
def test_closest_matches_bruteforce(rng, t_count, rays):
    tris = _random_tris(rng, t_count)
    clusters = wf.build_clusters(tris, cluster_size=16)
    origins = rng.uniform(-6, 6, (rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    prim, t, uncertain = wf.trace_closest(clusters, origins, dirs,
                                          pairs_per_ray=64)
    prim_ref, t_ref = _brute_closest(tris, origins, dirs)
    # The triangle order inside clusters is the input order (no re-sort).
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(prim) != 0xFFFFFFFF, hit)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(prim)[hit],
                                  prim_ref[hit].astype(np.uint32))
    assert int(uncertain) == 0  # budget covers every cluster


def test_closest_multi_chunk(rng, monkeypatch):
    monkeypatch.setattr(wf, "_ROW_CHUNK", 32)
    tris = _random_tris(rng, 100)
    clusters = wf.build_clusters(tris, cluster_size=16)
    origins = rng.uniform(-6, 6, (100, 3)).astype(np.float32)
    dirs = rng.normal(size=(100, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    prim, t, _ = wf.trace_closest(clusters, origins, dirs, pairs_per_ray=16)
    prim_ref, t_ref = _brute_closest(tris, origins, dirs)
    hit = np.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(prim)[hit],
                                  prim_ref[hit].astype(np.uint32))
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-4)


def test_anyhit_matches_bruteforce(rng):
    tris = _random_tris(rng, 200)
    clusters = wf.build_clusters(tris, cluster_size=16)
    rays = 256
    origins = rng.uniform(-6, 6, (rays, 3)).astype(np.float32)
    dirs = rng.normal(size=(rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t_max = rng.uniform(0.5, 20.0, rays).astype(np.float32)
    occ, overflow = wf.trace_anyhit(clusters, origins, dirs, t_max,
                                    pairs_per_ray=32)
    _, t_ref = _brute_closest(tris, origins, dirs)
    np.testing.assert_array_equal(np.asarray(occ), t_ref <= t_max)


def test_anyhit_respects_t_range(rng):
    # One triangle straight ahead at t=5: occluded only if t_max >= 5.
    tris = np.array([[[-1, -1, 5.0], [1, -1, 5.0], [0, 1, 5.0]]], np.float32)
    clusters = wf.build_clusters(tris, cluster_size=4)
    origins = np.zeros((3, 3), np.float32)
    dirs = np.tile(np.array([0, 0, 1.0], np.float32), (3, 1))
    t_max = np.array([4.0, 5.1, 0.0005], np.float32)  # last below t_min
    occ, _ = wf.trace_anyhit(clusters, origins, dirs, t_max)
    np.testing.assert_array_equal(np.asarray(occ), [False, True, False])


def test_closest_uncertainty_reported(rng):
    # Force a tiny budget on a deep line of clusters along +z: with
    # pairs_per_ray=1 and front-to-back ordering the nearest cluster wins,
    # so the hit is still exact and certain for rays that hit cluster 0.
    tris = []
    for k in range(8):
        z = 2.0 + k
        tris.append([[-1, -1, z], [1, -1, z], [0, 1, z]])
    tris = np.array(tris, np.float32)
    clusters = wf.build_clusters(tris, cluster_size=1)
    origins = np.zeros((1, 3), np.float32)
    dirs = np.array([[0, 0, 1.0]], np.float32)
    prim, t, uncertain = wf.trace_closest(clusters, origins, dirs,
                                          pairs_per_ray=1)
    assert int(np.asarray(prim)[0]) == 0
    np.testing.assert_allclose(np.asarray(t)[0], 2.0, rtol=1e-5)
    assert int(uncertain) == 0  # nearest-first: hit precedes the bound
