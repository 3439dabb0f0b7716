"""Agreement tests: Pallas traversal kernels vs the XLA wavefront tracer
and brute force."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_pipeline_pallas_trace_matches_bruteforce():
    """Full frame through the Pallas trace path (traversal='pallas',
    interpret on CPU) vs brute force: exercises the pipeline wiring —
    Morton ray permutation + inverse, shadow megabatch layout, counters."""
    import dataclasses
    import tempfile

    from vulkan_renderer_tpu.assets.noise import NoiseType
    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import (make_frame_constants,
                                                     render_frame_jit)
    from vulkan_renderer_tpu.render.shading import SceneStatic
    from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
    from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
    from vulkan_renderer_tpu.scene.scene import load_scene
    from vulkan_renderer_tpu.tools.export_scene import write_test_scene

    d = tempfile.mkdtemp(prefix="pallas_pipe_")
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    light = PolygonalLightSpec(
        translation=np.array([1.0, 1.0, 1.99], np.float32),
        rotation_angles=np.array([np.pi, 0, 0], np.float32),
        scaling_x=0.4, scaling_y=0.4,
        radiant_flux=np.array([40.0, 35.0, 30.0], np.float32))
    scene = load_scene(vks, d + "/cornell_box_textures", [light],
                      noise_type=NoiseType.WHITE, data_directory=d)
    camera = FirstPersonCamera(
        position_world_space=np.array([1.0, 0.15, 1.0], np.float32),
        rotation_x=0.6 * np.pi, rotation_z=np.pi)
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
        polygon_sampling_technique=(
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
        sample_count=1, trace_shadow_rays=True, output_linear_rgb=True)
    base = SceneStatic(light_count=1, light_texturing=(0,),
                       light_vertex_counts=(4,))
    constants = make_frame_constants(
        camera, 24, 24, settings, (np.arange(4) * 0x123456).astype(np.uint32))
    ref = np.asarray(render_frame_jit(
        scene, dataclasses.replace(base, traversal="bruteforce"), settings,
        constants, 24, 24))
    img, stats = render_frame_jit(
        scene, dataclasses.replace(base, traversal="pallas"), settings,
        constants, 24, 24, with_stats=True)
    assert int(stats.primary_uncertain) == 0
    assert int(stats.shadow_overflow) == 0
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-3)


@pytest.mark.slow
def test_sliced_megabatch_matches_unsliced(monkeypatch):
    """Large megabatches run as multiple bounded-SMEM pallas_calls
    (lax.map slices); results must be identical to the single-call path."""
    rng = np.random.RandomState(7)
    tris = _scene(rng)
    clusters = wf.build_clusters(tris, cluster_size=16)
    o, d, tm = _rays(rng, n=2048)
    ref, ref_ovf = tk.trace_anyhit_fused(clusters, o, d, tm, chunk_rows=2,
                                         m_budget=64, interpret=True)
    monkeypatch.setattr(tk, "_MIN_SLICE_CHUNKS", 2)
    monkeypatch.setattr(tk, "_MAX_PREFETCH_BYTES", 1)
    got, ovf = tk.trace_anyhit_fused(clusters, o, d, tm, chunk_rows=2,
                                     m_budget=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(ovf) == int(ref_ovf)
    origin = jnp.asarray(np.array([10.0, 10.0, 25.0], np.float32))
    ob = jnp.broadcast_to(origin, d.shape)
    rp, rt, runc = tk.trace_closest_fused(clusters, ob, d, chunk_rows=2,
                                          m_budget=64, interpret=True)
    monkeypatch.undo()
    p0, t0, unc0 = tk.trace_closest_fused(clusters, ob, d, chunk_rows=2,
                                          m_budget=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(rp), np.asarray(p0))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(t0))
    assert int(runc) == int(unc0)


def test_anyhit_fused_overflow_reported():
    """A tiny m_budget must be reported, not silently wrong."""
    rng = np.random.RandomState(2)
    tris = _scene(rng, t=2000)
    clusters = wf.build_clusters(tris, cluster_size=16)
    o, d, tm = _rays(rng, n=256)
    _, overflow = tk.trace_anyhit_fused(clusters, o, d, tm,
                                        chunk_rows=2, m_budget=2,
                                        interpret=True, retrace_factor=1)
    assert int(overflow) > 0


@pytest.mark.slow
def test_retrace_fixes_anyhit_overflow():
    """The exactness re-trace: a tiny first-pass budget overflows, the
    second pass with scaled budgets drives the counter to zero and the
    result matches brute force (VERDICT r2 #2)."""
    rng = np.random.RandomState(2)
    tris = _scene(rng, t=2000)
    clusters = wf.build_clusters(tris, cluster_size=16)
    o, d, tm = _rays(rng, n=256)
    _, overflow1 = tk.trace_anyhit_fused(clusters, o, d, tm,
                                         chunk_rows=2, m_budget=2,
                                         interpret=True, retrace_factor=1)
    assert int(overflow1) > 0  # the scenario genuinely overflows
    # factor 64 -> second-pass budget 128 >= cluster_count: provably exact.
    assert clusters.cluster_count <= 128
    got, overflow = tk.trace_anyhit_fused(clusters, o, d, tm,
                                          chunk_rows=2, m_budget=2,
                                          interpret=True, retrace_factor=64)
    assert int(overflow) == 0
    ref = np.asarray(trace_anyhit_bruteforce(jnp.asarray(tris), o, d, tm))
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.slow
def test_retrace_fixes_closest_uncertain():
    rng = np.random.RandomState(3)
    tris = _scene(rng, t=2000)
    clusters = wf.build_clusters(tris, cluster_size=16)
    _, d, _ = _rays(rng, n=256)
    origin = jnp.asarray(np.array([10.0, 10.0, 25.0], np.float32))
    o = jnp.broadcast_to(origin, d.shape)
    _, _, unc1 = tk.trace_closest_fused(clusters, o, d, chunk_rows=2,
                                        m_budget=2, interpret=True,
                                        retrace_factor=1)
    assert int(unc1) > 0
    assert clusters.cluster_count <= 128
    prim, t, unc = tk.trace_closest_fused(clusters, o, d, chunk_rows=2,
                                          m_budget=2, interpret=True,
                                          retrace_factor=64)
    assert int(unc) == 0
    ref_prim, ref_t = trace_primary_bruteforce(jnp.asarray(tris), origin, d)
    hit = np.isfinite(np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(prim)[hit],
                                  np.asarray(ref_prim)[hit])
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(ref_t)[hit],
                               rtol=1e-5)


@pytest.mark.slow
def test_attr_pass_matches_geometry_attributes():
    """The deferred attribute-fetch kernel must reproduce the XLA
    geometry_attributes (shading_rows gather + re-intersection) for every
    hit ray."""
    import functools

    from vulkan_renderer_tpu.render.shading import (
        FrameConstants, geometry_attributes, geometry_attributes_from_planes)

    rng = np.random.RandomState(9)
    tris = _scene(rng, t=600)
    nrm = rng.randn(600, 3, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    uvs = rng.rand(600, 3, 2).astype(np.float32)
    mat = rng.randint(0, 5, 600)
    clusters = wf.build_clusters(tris, cluster_size=16,
                                 triangle_normals=nrm,
                                 triangle_tex_coords=uvs,
                                 material_indices=mat)
    _, d, _ = _rays(rng, n=384)
    origin = np.array([10.0, 10.0, 25.0], np.float32)
    o = jnp.broadcast_to(jnp.asarray(origin), d.shape)
    derivs = np.array([[1e-3, 0.0, 2e-4], [0.0, -1e-3, 1e-4]], np.float32)

    prim, t, unc, attrs, stale = tk.trace_closest_attrs(
        clusters, o, d, jnp.asarray(derivs), chunk_rows=2, m_budget=64,
        interpret=True)
    assert int(unc) == 0
    assert not bool(np.asarray(stale).any())

    # XLA reference: shading_rows-equivalent row table.
    shading_rows = np.concatenate(
        [tris.reshape(-1, 9), nrm.reshape(-1, 9), uvs.reshape(-1, 6),
         mat.astype(np.float32)[:, None]], axis=1).astype(np.float32)
    scene_like = types.SimpleNamespace(shading_rows=jnp.asarray(shading_rows))
    constants = FrameConstants(
        camera_position=jnp.asarray(origin),
        pixel_to_ray=jnp.asarray(
            np.stack([derivs[0], derivs[1],
                      np.array([0, 0, 1], np.float32)], axis=1)),
        exposure_factor=jnp.float32(1.0),
        roughness_factor=jnp.float32(1.0),
        mis_visibility_estimate=jnp.float32(0.5),
        error_factor=jnp.float32(1.0),
        noise_random_numbers=jnp.zeros(4, jnp.uint32))

    hit = np.asarray(prim) != 0xFFFFFFFF
    safe_p = jnp.where(jnp.asarray(hit), prim, 0).astype(jnp.int32)
    ref_geom, _ = jax.vmap(functools.partial(
        geometry_attributes, scene_like, constants))(safe_p, d)
    got_geom = jax.vmap(geometry_attributes_from_planes)(attrs)
    found = np.asarray(attrs[:, 17]) > 0.5
    assert (found == hit).all()
    for name in ("normal_interp", "tex_coord", "duv_dx", "duv_dy",
                 "tangent", "bitangent", "mean_tangent_length"):
        g = np.asarray(getattr(got_geom, name))[hit]
        r_ = np.asarray(getattr(ref_geom, name))[hit]
        scale = np.maximum(np.abs(r_).max(), 1e-3)
        np.testing.assert_allclose(g, r_, atol=3e-5 * scale, rtol=2e-4,
                                   err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(got_geom.material_index)[hit],
        np.asarray(ref_geom.material_index)[hit])


@pytest.mark.slow
def test_pipeline_tile_order_matches_bruteforce():
    """The tile pixel order (64-multiple widths: pure reshape/transpose
    reorders instead of Morton permutation gathers) must produce the same
    image as the row-major brute-force path, including the padded-row
    crop."""
    import dataclasses
    import tempfile

    from vulkan_renderer_tpu.assets.noise import NoiseType
    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import (make_frame_constants,
                                                     render_frame_jit)
    from vulkan_renderer_tpu.render.shading import SceneStatic
    from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
    from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
    from vulkan_renderer_tpu.scene.scene import load_scene
    from vulkan_renderer_tpu.tools.export_scene import write_test_scene

    d = tempfile.mkdtemp(prefix="tile_pipe_")
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    light = PolygonalLightSpec(
        translation=np.array([1.0, 1.0, 1.99], np.float32),
        rotation_angles=np.array([np.pi, 0, 0], np.float32),
        scaling_x=0.4, scaling_y=0.4,
        radiant_flux=np.array([40.0, 35.0, 30.0], np.float32))
    scene = load_scene(vks, d + "/cornell_box_textures", [light],
                       noise_type=NoiseType.WHITE, data_directory=d)
    camera = FirstPersonCamera(
        position_world_space=np.array([1.0, 0.15, 1.0], np.float32),
        rotation_x=0.6 * np.pi, rotation_z=np.pi)
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
        polygon_sampling_technique=(
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
        sample_count=1, trace_shadow_rays=True, output_linear_rgb=True)
    # width 128 (64-multiple) + chunk_rows 2 -> tile_h 4; height 10 is NOT
    # a tile multiple, so the padded-row crop is exercised too.
    base = SceneStatic(light_count=1, light_texturing=(0,),
                       light_vertex_counts=(4,), trace_chunk_rows=2,
                       primary_m_budget=64, shadow_m_budget=64)
    w, h = 128, 10
    constants = make_frame_constants(
        camera, w, h, settings, (np.arange(4) * 0x123456).astype(np.uint32))
    ref = np.asarray(render_frame_jit(
        scene, dataclasses.replace(base, traversal="bruteforce"), settings,
        constants, w, h))
    img, stats = render_frame_jit(
        scene, dataclasses.replace(base, traversal="pallas"), settings,
        constants, w, h, with_stats=True)
    assert int(stats.primary_uncertain) == 0
    assert int(stats.shadow_overflow) == 0
    assert img.shape == (h, w, 3)
    # The noise image differs between pixel orders only through the pixel
    # index mapping, which is identical by construction; allow tiny FP
    # reassociation differences plus rare 1-spp boundary flips.
    close = np.isclose(np.asarray(img), ref, atol=2e-3)
    assert close.mean() > 0.995, close.mean()


@pytest.mark.slow
def test_escalating_retrace_matches_bruteforce():
    """retrace_mid_sc: the two-tier re-trace (budgeted mid tier, then
    exhaustive on its remainder) must match brute force with counters 0
    on a two-level scene where pass 1 genuinely drops superclusters."""
    rng = np.random.RandomState(5)
    tris = _scene(rng, t=4400)
    clusters = wf.build_clusters(tris, cluster_size=4)  # 1100 clusters
    assert clusters.cluster_count > tk._TWO_LEVEL_MIN_CLUSTERS
    o, d, tm = _rays(rng, n=384)
    ref = np.asarray(trace_anyhit_bruteforce(jnp.asarray(tris), o, d, tm))
    # sc_budget 2 of ~35 superclusters: plenty of unproven rays; the mid
    # tier at 4 still drops some, forcing tier B to fire.
    # retrace_factor 4: random (incoherent) rays union nearly every
    # cluster, so the exhaustive tier's item capacity must cover
    # cluster_count+1 per chunk (m_budget * factor >= 1101).
    got, overflow = tk.trace_anyhit_fused(clusters, o, d, tm,
                                          chunk_rows=1, m_budget=512,
                                          interpret=True, sc_budget=2,
                                          retrace_frac=1,
                                          retrace_factor=4,
                                          retrace_mid_sc=4)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_budget_validation_messages():
    """Nonsense budgets must raise a readable ValueError, not a shape
    error deep in Pallas (VERDICT r3 weak #9)."""
    rng = np.random.RandomState(4)
    tris = _scene(rng, t=64)
    clusters = wf.build_clusters(tris, cluster_size=16)
    o, d, tm = _rays(rng, n=128)
    with pytest.raises(ValueError, match="m_budget"):
        tk.trace_anyhit_fused(clusters, o, d, tm, m_budget=0,
                              interpret=True)
    with pytest.raises(ValueError, match="chunk_rows"):
        tk.trace_closest_fused(clusters, o, d, chunk_rows=0,
                               interpret=True)
    with pytest.raises(ValueError, match="retrace_frac"):
        tk.trace_closest_fused(clusters, o, d, retrace_frac=0,
                               interpret=True)
    with pytest.raises(ValueError, match="sc_budget"):
        tk.trace_anyhit_fused(clusters, o, d, tm, sc_budget=-1,
                              interpret=True)


def test_retrace_select_capacity_and_order():
    """_retrace_select: order-preserving compaction, honest `missed`
    counter when the static ray capacity binds."""
    r = 40960
    unproven = np.zeros(r, bool)
    unproven[::3] = True  # 13654 unproven > cap = r//8 = 5120
    idx, live, missed = tk._retrace_select(jnp.asarray(unproven), r)
    idx, live = np.asarray(idx), np.asarray(live)
    cap = max(2048, r // 8)
    assert idx.shape == (cap,)
    n_live = int(live.sum())
    assert n_live == cap
    # order-preserving: the first cap unproven indices, ascending
    expect = np.flatnonzero(unproven)[:cap]
    np.testing.assert_array_equal(idx[:n_live], expect)
    assert int(missed) == int(unproven.sum()) - n_live
    # plenty of capacity: everything selected, missed == 0
    few = np.zeros(r, bool)
    few[100:140] = True
    idx2, live2, missed2 = tk._retrace_select(jnp.asarray(few), r)
    assert int(missed2) == 0
    assert int(np.asarray(live2).sum()) == 40
    np.testing.assert_array_equal(np.asarray(idx2)[:40],
                                  np.arange(100, 140))


@pytest.mark.slow
def test_seeded_anyhit_matches_unseeded():
    """Occlusion-seed pass (seed_sc): the seed's occlusions are definite
    and the main pass culls dead rays, so the merged result must be
    identical to the unseeded trace AND to brute force (the seed is a
    bound, never a coverage claim)."""
    rng = np.random.RandomState(11)
    tris = _scene(rng, t=4400)
    clusters = wf.build_clusters(tris, cluster_size=4)  # 1100 clusters
    assert clusters.cluster_count > tk._TWO_LEVEL_MIN_CLUSTERS
    o, d, tm = _rays(rng, n=384)
    ref = np.asarray(trace_anyhit_bruteforce(jnp.asarray(tris), o, d, tm))
    plain, ov0 = tk.trace_anyhit_fused(clusters, o, d, tm, chunk_rows=1,
                                       m_budget=512, sc_budget=64,
                                       interpret=True)
    seeded, ov1 = tk.trace_anyhit_fused(clusters, o, d, tm, chunk_rows=1,
                                        m_budget=512, sc_budget=64,
                                        seed_sc=2, seed_items=64,
                                        interpret=True)
    assert int(ov0) == 0 and int(ov1) == 0
    np.testing.assert_array_equal(np.asarray(seeded), np.asarray(plain))
    np.testing.assert_array_equal(np.asarray(seeded), ref)


@pytest.mark.slow
def test_seeded_closest_matches_unseeded():
    """Seeded closest hit: the main pass re-finds every seed hit (the
    seed cluster's slab entry <= its hit t passes the seeded cull), so
    prim/t must be pixel-identical to the unseeded trace."""
    rng = np.random.RandomState(12)
    tris = _scene(rng, t=4400)
    clusters = wf.build_clusters(tris, cluster_size=4)
    _, d, _ = _rays(rng, n=384)
    origin = jnp.asarray(np.array([10.0, 10.0, 25.0], np.float32))
    o = jnp.broadcast_to(origin, d.shape)
    ref_prim, ref_t = trace_primary_bruteforce(jnp.asarray(tris), origin, d)
    plain = tk.trace_closest_fused(clusters, o, d, chunk_rows=1,
                                   m_budget=512, sc_budget=64,
                                   interpret=True)
    seeded = tk.trace_closest_fused(clusters, o, d, chunk_rows=1,
                                    m_budget=512, sc_budget=64,
                                    seed_sc=2, seed_items=64,
                                    interpret=True)
    assert int(plain[2]) == 0 and int(seeded[2]) == 0
    np.testing.assert_array_equal(np.asarray(seeded[0]),
                                  np.asarray(plain[0]))
    np.testing.assert_array_equal(np.asarray(seeded[1]),
                                  np.asarray(plain[1]))
    hit = np.isfinite(np.asarray(ref_t))
    np.testing.assert_array_equal(np.asarray(seeded[0])[hit],
                                  np.asarray(ref_prim)[hit])


@pytest.mark.slow
def test_attr_filter_matches_unfiltered():
    """attr_item_filter: the attribute pass over only winner-cluster items
    must return identical attrs (ample capacity -> no drops, stale stays
    clear); a starved capacity must repair through `stale`, never ship
    wrong attrs silently."""
    rng = np.random.RandomState(13)
    tris = _scene(rng, t=600)
    nrm = rng.randn(600, 3, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    uvs = rng.rand(600, 3, 2).astype(np.float32)
    mat = rng.randint(0, 5, 600)
    clusters = wf.build_clusters(tris, cluster_size=16,
                                 triangle_normals=nrm,
                                 triangle_tex_coords=uvs,
                                 material_indices=mat)
    _, d, _ = _rays(rng, n=384)
    o = jnp.broadcast_to(jnp.asarray(
        np.array([10.0, 10.0, 25.0], np.float32)), d.shape)
    derivs = jnp.asarray(
        np.array([[1e-3, 0.0, 2e-4], [0.0, -1e-3, 1e-4]], np.float32))
    plain = tk.trace_closest_attrs(clusters, o, d, derivs, chunk_rows=2,
                                   m_budget=64, interpret=True)
    filt = tk.trace_closest_attrs(clusters, o, d, derivs, chunk_rows=2,
                                  m_budget=64, interpret=True,
                                  attr_filter=True, attr_avg_items=64)
    assert int(plain[2]) == 0 and int(filt[2]) == 0
    np.testing.assert_array_equal(np.asarray(filt[0]), np.asarray(plain[0]))
    np.testing.assert_array_equal(np.asarray(filt[1]), np.asarray(plain[1]))
    assert not bool(np.asarray(filt[4]).any())
    np.testing.assert_array_equal(np.asarray(filt[3]), np.asarray(plain[3]))
    # Starved capacity: every dropped hit ray must be flagged stale.
    tight = tk.trace_closest_attrs(clusters, o, d, derivs, chunk_rows=2,
                                   m_budget=64, interpret=True,
                                   attr_filter=True, attr_avg_items=1)
    prim = np.asarray(tight[0])
    attrs = np.asarray(tight[3])
    stale = np.asarray(tight[4])
    hit = prim != 0xFFFFFFFF
    found = attrs[:, -1] > 0.5
    assert (hit & ~found & ~stale).sum() == 0
    # Flagged rays' attrs are exactly the plain ones after the caller's
    # fixup; here just check the non-stale hits already agree.
    ok = hit & ~stale
    np.testing.assert_array_equal(attrs[ok], np.asarray(plain[3])[ok])


def _camera_grid(w=128, h=16):
    """Pixel-grid rays like the pipeline's: d = M @ (px, py, 1), camera
    above the test scene looking down; strip chunk rects (2 rows per
    chunk at chunk_rows=2)."""
    m = np.array([[0.6 / 64, 0.0, -0.6],
                  [0.0, 0.05, -0.4],
                  [0.0, 0.0, -1.0]], np.float32)
    cam = np.array([10.0, 10.0, 40.0], np.float32)
    px, py = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32), indexing="xy")
    pix = np.stack([px, py, np.ones_like(px)], -1).reshape(-1, 3)
    dirs = pix @ m.T
    chunk = 2 * 128
    nc = pix.shape[0] // chunk
    pxy = pix[:, :2].reshape(nc, chunk, 2)
    rects = np.concatenate([pxy.min(1), pxy.max(1)], axis=1)
    return (jnp.asarray(m), jnp.asarray(cam), jnp.asarray(dirs),
            jnp.asarray(rects.astype(np.float32)))


@pytest.mark.slow
def test_raster_binning_matches_slab_cull():
    """Screen-space binned primary cull (cluster_screen_rects +
    _raster_items) must reproduce the slab-culled closest hit exactly —
    the rasterized-visibility parity requirement (VERDICT r4 #2)."""
    rng = np.random.RandomState(21)
    tris = _scene(rng)
    clusters = wf.build_clusters(tris, cluster_size=16)
    m, cam, dirs, rects = _camera_grid()
    o = jnp.broadcast_to(cam, dirs.shape)
    prim_r, t_r, unc_r = tk.trace_closest_fused(
        clusters, o, dirs, chunk_rows=2, m_budget=64, interpret=True,
        raster=(tk.cluster_screen_rects(clusters, m, cam), rects))
    prim_s, t_s, unc_s = tk.trace_closest_fused(
        clusters, o, dirs, chunk_rows=2, m_budget=64, interpret=True)
    assert int(unc_r) == 0 and int(unc_s) == 0
    assert np.isfinite(np.asarray(t_s)).any()  # scene actually visible
    np.testing.assert_array_equal(np.asarray(prim_r), np.asarray(prim_s))
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_s))
    # Starved item capacity: capped chunks must repair through the
    # re-trace (retrace_frac=1 -> full repair capacity), never silently.
    prim_c, t_c, unc_c = tk.trace_closest_fused(
        clusters, o, dirs, chunk_rows=2, m_budget=2, interpret=True,
        retrace_frac=1,
        raster=(tk.cluster_screen_rects(clusters, m, cam), rects))
    assert int(unc_c) == 0
    np.testing.assert_array_equal(np.asarray(prim_c), np.asarray(prim_s))


@pytest.mark.slow
def test_pipeline_raster_visibility_bit_identical():
    """Full frame with primary_raster=True (Morton-fallback chunk rects at
    a non-64-multiple width) must be bit-identical to the slab-cull frame."""
    import dataclasses
    import tempfile

    from vulkan_renderer_tpu.assets.noise import NoiseType
    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import (make_frame_constants,
                                                     render_frame_jit)
    from vulkan_renderer_tpu.render.shading import SceneStatic
    from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
    from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
    from vulkan_renderer_tpu.scene.scene import load_scene
    from vulkan_renderer_tpu.tools.export_scene import write_test_scene

    d = tempfile.mkdtemp(prefix="raster_pipe_")
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    light = PolygonalLightSpec(
        translation=np.array([1.0, 1.0, 1.99], np.float32),
        rotation_angles=np.array([np.pi, 0, 0], np.float32),
        scaling_x=0.4, scaling_y=0.4,
        radiant_flux=np.array([40.0, 35.0, 30.0], np.float32))
    scene = load_scene(vks, d + "/cornell_box_textures", [light],
                       noise_type=NoiseType.WHITE, data_directory=d)
    camera = FirstPersonCamera(
        position_world_space=np.array([1.0, 0.15, 1.0], np.float32),
        rotation_x=0.6 * np.pi, rotation_z=np.pi)
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
        polygon_sampling_technique=(
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
        sample_count=1, trace_shadow_rays=True, output_linear_rgb=True)
    base = SceneStatic(light_count=1, light_texturing=(0,),
                       light_vertex_counts=(4,), traversal="pallas")
    constants = make_frame_constants(
        camera, 24, 24, settings, (np.arange(4) * 0x123456).astype(np.uint32))
    ref, stats0 = render_frame_jit(scene, base, settings, constants, 24, 24,
                                   with_stats=True)
    img, stats = render_frame_jit(
        scene, dataclasses.replace(base, primary_raster=True), settings,
        constants, 24, 24, with_stats=True)
    assert int(stats0.primary_uncertain) == 0
    assert int(stats.primary_uncertain) == 0
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))


@pytest.mark.slow
def test_pipeline_raster_tiled_bit_identical():
    """Tiled pixel order (width % 64 == 0: static per-tile chunk rects —
    the flagship layout) with primary_raster=True vs the slab cull."""
    import dataclasses
    import tempfile

    from vulkan_renderer_tpu.assets.noise import NoiseType
    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import (make_frame_constants,
                                                     render_frame_jit)
    from vulkan_renderer_tpu.render.shading import SceneStatic
    from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
    from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
    from vulkan_renderer_tpu.scene.scene import load_scene
    from vulkan_renderer_tpu.tools.export_scene import write_test_scene

    d = tempfile.mkdtemp(prefix="raster_tiled_")
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    light = PolygonalLightSpec(
        translation=np.array([1.0, 1.0, 1.99], np.float32),
        rotation_angles=np.array([np.pi, 0, 0], np.float32),
        scaling_x=0.4, scaling_y=0.4,
        radiant_flux=np.array([40.0, 35.0, 30.0], np.float32))
    scene = load_scene(vks, d + "/cornell_box_textures", [light],
                       noise_type=NoiseType.WHITE, data_directory=d)
    camera = FirstPersonCamera(
        position_world_space=np.array([1.0, 0.15, 1.0], np.float32),
        rotation_x=0.6 * np.pi, rotation_z=np.pi)
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
        polygon_sampling_technique=(
            PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE),
        sample_count=1, trace_shadow_rays=False, output_linear_rgb=True)
    base = SceneStatic(light_count=1, light_texturing=(0,),
                       light_vertex_counts=(4,), traversal="pallas",
                       trace_chunk_rows=2)
    constants = make_frame_constants(
        camera, 128, 16, settings,
        (np.arange(4) * 0x123456).astype(np.uint32))
    ref, stats0 = render_frame_jit(scene, base, settings, constants,
                                   128, 16, with_stats=True)
    img, stats = render_frame_jit(
        scene, dataclasses.replace(base, primary_raster=True), settings,
        constants, 128, 16, with_stats=True)
    assert int(stats0.primary_uncertain) == 0
    assert int(stats.primary_uncertain) == 0
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
